package graft.operators

import org.scalatest.Tag

import graft.SparkSpecBase

/** Long-running suites opt out with `sbt "testOnly -- -l graft.Slow"`. */
object Slow extends Tag("graft.Slow")

/** The scale soak's invariants (SURVEY.md §2 B50/B51 scale evidence), run
  * at the full ~10x-sf0.1 corpus the SCALE.md table documents. Every number
  * here is deterministic (the corpus is pure md5 arithmetic), so the
  * assertions are exact properties, not statistical hopes:
  *
  *  - derived LSH geometry keeps measured bucket occupancy inside the
  *    predicted envelope (candidate generation stays linear);
  *  - the maxBucket skew cap fires ONLY on the planted identical
  *    mega-families — excluding them, zero buckets are capped, so typical
  *    corpus loses no recall to skew protection;
  *  - connected components converge within the pointer-jump log bound
  *    despite the planted worst-diameter chain;
  *  - the planted structure is actually recovered: near-dup families
  *    cluster whole, the chain is one component, every planted embedding
  *    pair confirms.
  */
class ScaleSoakSpec extends SparkSpecBase {

  private lazy val report = ScaleSoak.run(spark,
    scratch("scale_soak_corpus"))

  test("bucket occupancy stays inside the derived envelope; cap hits only the planted mega-family",
      Slow) {
    val l = report.layout
    report.buckets.foreach { b =>
      info(f"${b.side}: ${b.buckets} buckets, mean ${b.meanOcc}%.1f " +
        f"(predicted ${b.predictedOcc}%.1f), max ${b.maxOcc}, " +
        f"capped ${b.capped} (excl. planted: ${b.cappedWithoutPlanted})")
      assert(b.cappedWithoutPlanted === 0,
        s"${b.side}: the skew cap must never fire on the un-planted corpus")
      assert(b.capped >= 1,
        s"${b.side}: the planted mega-family must actually trip the cap")
    }
    val emb = report.buckets.find(_.side == "embed LSH").get
    assert(emb.meanOcc <= 4 * emb.predictedOcc && emb.meanOcc >= 0.25 * emb.predictedOcc,
      f"embed occupancy ${emb.meanOcc}%.1f outside the derived envelope " +
        f"(predicted ${emb.predictedOcc}%.1f)")
    // mega families are exact dups: their buckets must be ABOVE the cap by
    // construction (size >= megaSize > maxBucket)
    assert(emb.maxOcc >= l.vecMegaSize)
  }

  test("connected components converge within the pointer-jump log bound", Slow) {
    info(s"${report.ccRounds} rounds over ${report.ccVertices} vertices " +
      s"(bound ${report.ccRoundBound}); ${report.ccClusters} clusters")
    assert(report.ccRounds <= report.ccRoundBound,
      s"CC took ${report.ccRounds} rounds, bound ${report.ccRoundBound}")
    // the 64-doc chain alone would need 64 rounds without pointer jumping
    assert(report.ccRounds < report.layout.chainLen / 2)
  }

  test("planted structure is recovered: families, chain, embedding pairs", Slow) {
    val l = report.layout
    info(s"families ${report.famRecovered}/${l.famCount}, " +
      s"chain ${report.chainClusterSize}/${l.chainLen}, " +
      s"embed pairs ${report.embedPairs}/${report.embedPlanted}")
    // deterministic corpus: recall at the planted 0.85-Jaccard families is
    // a fixed outcome of the derived geometry, measured >= 99%
    assert(report.famRecovered >= (l.famCount * 99) / 100,
      s"family recovery degraded: ${report.famRecovered}/${l.famCount}")
    assert(report.chainClusterSize === l.chainLen.toLong,
      "the near-dup chain must canonicalize into one cluster")
    assert(report.embedPairs === report.embedPlanted,
      "every planted embedding near-dup pair must confirm")
  }

  test("SemDeDup maxCell cap fires on exactly the planted mega-cell and nowhere else", Slow) {
    info(s"clean capped cells ${report.semCappedClean}, raw capped cells " +
      s"${report.semCappedRaw} (megaCellCapped=${report.semMegaCellCapped}), " +
      s"drops ${report.semDrops}/${report.embedPlanted}")
    // post-exact-dedup corpus: the trained quantizer leaves no cell over
    // the cap, so zero recall is traded for skew protection
    assert(report.semCappedClean === 0L,
      "the maxCell cap must never fire on the post-exact-dedup corpus")
    // raw corpus (precondition violated): the identical block lands in ONE
    // cell, that cell alone is refused, and the run completes
    assert(report.semCappedRaw === 1L,
      s"expected exactly the mega-block cell capped, got ${report.semCappedRaw}")
    assert(report.semMegaCellCapped,
      "the capped cell must be the planted identical block's cell")
    // cells are hard partitions, so a pair straddling a boundary is the
    // method's documented recall trade — still >= 95% of planted pairs drop
    assert(report.semDrops >= (report.embedPlanted * 95) / 100,
      s"SemDeDup recall degraded: ${report.semDrops}/${report.embedPlanted}")
  }

  test("text curation: boilerplate flags exactly the planted structure; LM ranks repetition as probable", Slow) {
    val l = report.layout
    info(s"mega fully-boiler ${report.boilerMegaFull}/${l.megaSize}, " +
      s"un-planted flagged ${report.boilerNonPlantedFlagged}, " +
      s"LM mega distinct ${report.lmMegaDistinct} @ ${report.lmMegaAvgMicro} " +
      s"vs base ${report.lmBaseAvgMicro} micro-nats")
    assert(report.boilerMegaFull === l.megaSize.toLong,
      "every identical mega doc must be 100% boilerplate windows")
    assert(report.boilerNonPlantedFlagged === 0L,
      "boilerplate must never flag organic (un-planted) text")
    // 2500 byte-identical docs: one NLL, and markedly more probable than
    // the organic average (their bigrams occur 2500x each)
    assert(report.lmMegaDistinct === 1L)
    assert(report.lmMegaAvgMicro < report.lmBaseAvgMicro,
      "repeated text must score as more probable than organic text")
  }

  test("containment confirms exactly the planted family pairs; the identical mega-family self-excludes", Slow) {
    val l = report.layout
    info(s"root pairs ${report.contRootPairs}/${2 * l.famCount}, " +
      s"member pairs ${report.contMemberPairs}/${l.famCount / 2}, " +
      s"other pairs ${report.contOther}")
    assert(report.contRootPairs === 2L * l.famCount,
      "every family root must contain both mutated members (>= 35/38 shingles)")
    // half the families mutate tokens 1 and 2: the affected window range
    // clips at the text edge (3 windows, 35/38 >= 0.9) where interior
    // positions touch 4 (34/38 < 0.9) — the exact edge case the first
    // soak run surfaced
    assert(report.contMemberPairs === l.famCount / 2L,
      "edge-position member pairs must confirm (35/38), interior must not (34/38)")
    assert(report.contOther === 0L,
      "chain (0.897) sits below the 0.9 threshold and the mega family has " +
        "no discriminative shingles - any other pair is a false positive")
  }

  test("bloom gate: all-new deltas bypass the history join; dups never bypass", Slow) {
    val l = report.layout
    info(s"history ${report.bloomHistRows} shas; all-new bypass " +
      s"${report.bloomAllNewBypass}/${l.deltaNew} (out ${report.bloomAllNewOut}); " +
      s"mixed out ${report.bloomMixedOut}/${l.deltaMixNew} new, bypass " +
      s"${report.bloomMixedBypass}, dup leaked ${report.bloomMixedDupLeaked}")
    // every delta doc is genuinely new → the output IS the delta (the
    // result-equivalence contract: gate ≡ plain anti-join)
    assert(report.bloomAllNewOut === l.deltaNew.toLong,
      "an all-new delta must survive the gate in full")
    // the production claim: ~99% of an all-new batch never touches the
    // history join (only the ~fpp=1% false positives pay the confirm).
    // Bound at 1−2·fpp = 98%: the EXPECTED bypass is exactly n·(1−fpp),
    // so a 99% bound would sit on the mean (σ≈√(n·fpp)≈7 here) and any
    // re-roll of the sha draw — a layout bump, a Spark BloomFilter
    // change — would be a coin-flip failure with no real regression
    // (r9 review); 98% is ~7σ of slack yet still fails a broken gate,
    // which bypasses ~0% (sketch never consulted) or 100% (dups leak,
    // caught below).
    assert(report.bloomAllNewBypass >= (l.deltaNew * 98L) / 100,
      s"join-bypass rate degraded: ${report.bloomAllNewBypass}/${l.deltaNew}")
    // high-dup delta: output = exactly the planted-new half; a verbatim
    // dup can NEVER bypass (blooms have no false negatives) or leak
    assert(report.bloomMixedOut === l.deltaMixNew.toLong,
      "the mixed delta's output must be exactly its new half")
    assert(report.bloomMixedDupLeaked === 0L,
      "a duplicate leaked through the gate — bloom false negative (impossible) or broken confirm join")
    assert(report.bloomMixedBypass <= l.deltaMixNew.toLong,
      "more rows bypassed than are new — a dup bypassed the gate")
    // 98% for the same mean-sits-on-99% reason as the all-new bound
    assert(report.bloomMixedBypass >= (l.deltaMixNew * 98L) / 100,
      "the new half of the mixed delta should mostly bypass")
  }

  test("boundary dedup: every planted seam found; the hot boundary is refused on both sides", Slow) {
    val l = report.layout
    info(s"seams ${report.seamsFound}/${l.splitPairs}, other " +
      s"${report.boundaryOther}, mega×hot leaked ${report.megaHotLeaked}, " +
      s"capped heads ${report.cappedHeads} / tails ${report.cappedTails}")
    assert(report.seamsFound === l.splitPairs.toLong,
      "every planted split-document seam must be recovered")
    assert(report.boundaryOther === 0L,
      "md5-word corpora have no accidental 4-token seams — any other pair is a false positive")
    // the planted 2500-tail × 1500-head value would alone emit 3.75M
    // pairs; the cap must refuse it entirely
    assert(report.megaHotLeaked === 0L,
      "the hot boundary value leaked pairs past the cap")
    // exactly the planted hot values are capped: head side = the mega
    // family's shared head + the mega-tail value the hot docs reuse;
    // tail side = the mega family's shared tail. Organic text: never.
    assert(report.cappedHeads === 2L,
      s"expected exactly the 2 planted hot head values capped, got ${report.cappedHeads}")
    assert(report.cappedTails === 1L,
      s"expected exactly the 1 planted hot tail value capped, got ${report.cappedTails}")
  }

  test("minhash-est calibration stays inside the binomial error budget", Slow) {
    info(s"${report.estPairs} pairs, mean err ${report.estMeanErrPpm} ppm, " +
      s"max err ${report.estMaxErrPpm} ppm")
    // every confirmed pair gets an estimate (the signature joins drop
    // nothing)
    assert(report.estPairs > 0)
    // E[|est−J|] for J≈0.85, n=18 hashes is ≈ σ·√(2/π) ≈ 67k ppm; the
    // mean must sit in that regime — a broken estimator (wrong hash
    // family, wrong divisor) lands 5–10x off
    assert(report.estMeanErrPpm <= 120000L,
      s"mean estimate error ${report.estMeanErrPpm} ppm is outside the binomial budget")
    // max over ~3k pairs: a ≥5σ outlier would indicate signature
    // corruption, not sampling noise
    assert(report.estMaxErrPpm <= 500000L,
      s"max estimate error ${report.estMaxErrPpm} ppm — signature corruption?")
  }

  test("containment recall is invariant under a 10x tighter df cap", Slow) {
    val total = report.contRootPairs + report.contMemberPairs + report.contOther
    info(s"maxDf=100 pairs ${report.contPairs100} vs maxDf=1000 $total")
    // planted-family shingles have df ≈ 3 and the mega family
    // self-excludes at any cap: the cap is a pure cost lever here
    assert(report.contPairs100 === total,
      "tightening maxDf changed the confirmed pairs — recall lost to the cost cap")
  }

  test("AQE splits the planted skewed join partition at runtime", Slow) {
    val l = report.layout
    info(s"skewFired=${report.aqeSkewFired}, skewed partitions split " +
      s"${report.aqeSkewedSplits}, join rows ${report.aqeJoinRows}")
    // every left row matches exactly one right row (key 0 → doc 0; odd
    // ids 1:1), so the join row count equals the corpus size — an exact
    // oracle that the skew handling changed no results
    assert(report.aqeJoinRows === l.totalDocs,
      s"skew-join rows ${report.aqeJoinRows} != ${l.totalDocs}")
    assert(report.aqeSkewFired,
      "OptimizeSkewedJoin did not fire on the planted half-corpus key")
    // a genuine split breaks the hot partition into >= 2 pieces
    assert(report.aqeSkewedSplits >= 2L,
      s"hot partition not actually split (numSkewedSplits=${report.aqeSkewedSplits})")
  }

  test("streaming legs: state is watermark-bound and late events are dropped, never buffered", Slow) {
    val l = report.layout
    report.streamLegs.foreach { s =>
      info(f"${s.op}: ${s.batches} batches, in ${s.totalIn}, max state " +
        f"${s.maxStateRows} (final ${s.finalStateRows}), late ${s.droppedLate}, " +
        f"emitted ${s.emitted}, ${s.maxStateMB}%.1f MB, ${s.seconds}%.1f s")
      // the 100 TB property: state tracks the watermark WINDOW (~2 of the
      // 6 batch files), never the whole input
      assert(s.maxStateRows < s.totalIn / 2,
        s"${s.op}: state grew input-bound (${s.maxStateRows} rows) — eviction lost")
      assert(s.droppedLate > 0,
        s"${s.op}: planted late events were not dropped by the watermark")
      assert(s.emitted > 0)
    }
    // exact oracles from the deterministic generator: every planted late
    // event is watermark-dropped, and dedup emits one row per distinct
    // on-time key
    val ev = ScaleSoak.streamEvents(spark, l)
    val expectedLate = ev.filter(ScaleSoak.isLate(l)).count()
    val dedup = report.streamLegs.find(_.op.contains("dedup")).get
    assert(dedup.droppedLate === expectedLate,
      s"dedup late-drop ${dedup.droppedLate} != planted $expectedLate")
    val expectedKeys = ev.filter(!ScaleSoak.isLate(l))
      .select(org.apache.spark.sql.functions.col("event_id"))
      .distinct().count()
    assert(dedup.emitted === expectedKeys,
      s"dedup emitted ${dedup.emitted} != distinct on-time keys $expectedKeys")
  }

  test("every measured stage moved bounded shuffle volume", Slow) {
    report.stages.foreach { s =>
      info(f"${s.stage}: ${s.outRows} rows, ${s.seconds}%.1f s, " +
        f"shuffle r/w ${s.shuffleReadMB}%.1f/${s.shuffleWriteMB}%.1f MB")
    }
    // every stage's shuffle write is megabytes, not corpus-squared: the
    // all-pairs form of 102.5k docs' shingle sets alone would exceed 10 GB
    assert(report.stages.forall(_.shuffleWriteMB < 2048),
      "a stage shuffled gigabytes — quadratic blowup or lost partial agg")
  }

  test("CDC fold at soak scale: analytic live count, late-update rejection, O(batch+keys) merge", Slow) {
    // the requires inside runCdcSoak ARE the invariants (exact analytic
    // live-table count, zero late seq-0 overwrites); this test runs them
    // at a reduced key count so the suite stays fast — the committed
    // SCALE.md section carries the 2M-key measurement.
    val md = ScaleSoak.runCdcSoak(spark,
      scratch("cdc_soak_spec"), nKeys = 200000L)
    assert(md.contains("0 leaks"), "late-update leak count not zero")
  }
}
