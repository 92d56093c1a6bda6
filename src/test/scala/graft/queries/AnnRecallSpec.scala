package graft.queries

import graft.SparkSpecBase

/** Recall of the two ANN index shapes (B51) against the exact brute-force
  * top-k — the accuracy/speed trade-off documented as a measured number, not
  * a claim. Ground truth = q_embed_cosine_topk (exact top-5; its top-3
  * prefix is the target set for the ANN queries' k=3).
  *
  * Measured on this corpus (sf0.01): IVF nprobe=2 ≈ 0.97 (the r2→r3
  * multi-probe upgrade — nprobe=1 missed near-boundary cells), banded LSH
  * (24 bands × 6 bits, prime 149) ≈ 0.90. The LSH history is instructive:
  * r2's plane formula was 7-periodic (7 real planes — recall 0.03), r3's
  * intermediate prime 101 < 144 planes collapsed plane(j) onto plane(j+101)
  * (101 real planes — recall 0.53); with 149 all 144 planes are pairwise
  * distinct (VectorExprsSpec asserts it) and the measured recall matches
  * the amplification curve: neighbors at cosine 0.26–0.49 ⇒ p(plane agrees)
  * = 1−θ/π ≈ 0.58–0.66 ⇒ 1−(1−p⁶)²⁴ ≈ 0.68–0.87. At real near-dup
  * similarity (cosine ≥ 0.8, p ≈ 0.8) the identical configuration yields
  * 1−(1−0.8⁶)²⁴ ≈ 0.999. The floors below are set so a refactor that guts
  * candidate generation (either historical defect) fails loudly without
  * making the spec flaky.
  */
class AnnRecallSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.01"

  /** (qid, cid) pairs ranked ≤ 3. */
  private def top3(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sf).collect()
      .filter(_.getAs[Int]("rank") <= 3)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet

  test("banded LSH >= 75% and IVF nprobe=2 >= 80% top-3 recall vs exact") {
    val exact = top3("q_embed_cosine_topk")
    assert(exact.size == 30, s"exact baseline should yield 10 queries x 3: ${exact.size}")
    val lsh = top3("q_embed_ann_lsh")
    val ivf = top3("q_embed_ann_ivf")
    val trained = top3("q_embed_ann_ivf_trained")
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    val trainedRecall = (exact & trained).size.toDouble / exact.size
    info(f"LSH top-3 recall: $lshRecall%.2f  (${(exact & lsh).size}/${exact.size})")
    info(f"IVF nprobe=2 top-3 recall: $ivfRecall%.2f  (${(exact & ivf).size}/${exact.size})")
    info(f"trained-IVF top-3 recall: $trainedRecall%.2f  (${(exact & trained).size}/${exact.size})")
    assert(lshRecall >= 0.75, f"banded LSH recall degraded: $lshRecall%.2f")
    assert(ivfRecall >= 0.8, f"IVF nprobe=2 recall degraded: $ivfRecall%.2f")
    assert(trainedRecall >= 0.8, f"trained-IVF recall degraded: $trainedRecall%.2f")
  }

  test("SQ8 search: top-5 overlap vs exact and bounded score deviation") {
    // B105: the quantized ranking must track the exact one (overlap floor
    // measured before pinning) and the dequantized score must sit within
    // the analytic error envelope — per-component quantization error is
    // <= scale/254, so the cosine perturbation at 64 dims stays well
    // under 0.02 on this corpus; a floor breach means the codec (not the
    // fixture) changed.
    val exact = graft.SparkEntry.queries("q_embed_cosine_topk")(spark, sf)
      .collect()
      .map(r => ((r.getAs[Long]("qid"), r.getAs[Long]("cid")),
        r.getAs[Double]("cos_sim"))).toMap
    val sq = graft.SparkEntry.queries("q_embed_sq8_topk")(spark, sf)
      .collect()
      .map(r => ((r.getAs[Long]("qid"), r.getAs[Long]("cid")),
        r.getAs[Double]("sq_sim"))).toMap
    val common = exact.keySet & sq.keySet
    val overlap = common.size.toDouble / exact.size
    val dev = common.map(k => math.abs(exact(k) - sq(k))).max
    info(f"SQ8 top-5 overlap: $overlap%.2f (${common.size}/${exact.size}), " +
      f"max |sq_sim - cos_sim| on common pairs: $dev%.4f")
    assert(overlap >= 0.85, f"SQ8 overlap degraded: $overlap%.2f")
    assert(dev <= 0.02, f"SQ8 score deviation above envelope: $dev%.4f")
  }

  test("prefix-dim re-rank: measured recall dial, and re-rank ∩ gold ≡ shortlist ∩ gold") {
    // B110: the truncation is the only recall loss — stage 2 is exact, so
    // any gold vector that SURVIVES the shortlist must appear in the final
    // top-5 (the PQ re-rank theorem on the prefix-dim path). The dial
    // measures what each prefix width buys on this non-MRL fixture.
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val gold = graft.SparkEntry.queries("q_embed_cosine_topk")(spark, sf)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    var lastRecall = -1.0
    for (p <- Seq(8, 16, 32)) {
      val got = Ann.prefixDimTopK(emb, col("vec_id") < 10, k = 5,
        prefixDims = p, shortlistS = 50)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      val recall = (gold & got).size.toDouble / gold.size
      info(f"prefixDims=$p%2d top-5 recall: $recall%.2f (${(gold & got).size}/${gold.size})")
      if (p == 16) {
        // the catalog geometry: theorem + a floor measured before pinning
        val sl = Ann.prefixDimTopK(emb, col("vec_id") < 10, k = 50,
          prefixDims = 16, shortlistS = 50)
          .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
        assert((gold & got) === (gold & sl),
          "exact re-rank must keep every gold vector the shortlist admitted")
        assert(recall >= 0.5, f"prefix-16 recall degraded: $recall%.2f")
      }
      assert(recall >= lastRecall - 0.2,
        f"recall should not collapse as the prefix widens (p=$p)")
      lastRecall = recall
    }
  }

  test("hard-pair mining equals a driver-side exact recompute") {
    // B104: every output field re-derived independently on the driver —
    // same left-fold dot, same HALF_UP 6-dp rounding, same (rounded cos,
    // id) order — so the window/tie discipline is proven, not assumed.
    val rows = graft.SparkEntry.queries("q_embed_hard_negatives")(spark, sf)
      .collect()
    val embs = graft.Tables.embeddings(spark, sf).collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getAs[Int]("label"))
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      java.math.BigDecimal.valueOf(
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val byId = embs.map(e => e._1 -> e).toMap
    assert(rows.length === 10)
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val (_, qe, ql) = byId(qid)
      val cands = embs.filter(_._1 != qid)
        .map { case (cid, ce, cl) => (cid, cl, cos6(qe, ce)) }
      val neg = cands.filter(_._2 != ql).minBy(c => (-c._3, c._1))
      val pos = cands.filter(_._2 == ql).minBy(c => (c._3, c._1))
      assert(r.getAs[Int]("q_label") === ql, s"q_label for qid=$qid")
      assert(r.getAs[Long]("hard_neg_id") === neg._1, s"hard_neg_id qid=$qid")
      assert(r.getAs[Double]("hard_neg_sim") === neg._3, s"hard_neg_sim qid=$qid")
      assert(r.getAs[Long]("hard_pos_id") === pos._1, s"hard_pos_id qid=$qid")
      assert(r.getAs[Double]("hard_pos_sim") === pos._3, s"hard_pos_sim qid=$qid")
      // the miner's point: the hard negative must sit closer than the
      // hard positive on a corpus whose classes overlap — non-vacuous
      // only if at least one query has neg_sim > pos_sim (checked below)
    }
    val inverted = rows.count(r =>
      r.getAs[Double]("hard_neg_sim") > r.getAs[Double]("hard_pos_sim"))
    info(s"$inverted/10 queries have a negative closer than the stretched positive")
    assert(inverted > 0,
      "no query has hard_neg_sim > hard_pos_sim — the mining signal is vacuous here")
  }

  test("k-NN graph (NN-descent): per-round recall vs exact top-5 is monotone and converges") {
    // B95 (r12 verdict #2): the weak 8-band seed must be visibly below the
    // converged graph (else the rounds prove nothing), recall must be
    // MONOTONE per round (a theorem, not luck: round r+1's candidates
    // include round r's edges, and anything that displaces a gold member
    // under the shared (round-6 cos DESC, id ASC) order ranks above it
    // exactly — so it is itself gold), and round 2 must clear 0.9.
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")).cache()
    val exact = Ann.exactTopK(emb, lit(true), LlmOps.KnnK).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recalls = (0 to 2).map { r =>
      val g = Ann.knnGraph(emb, k = LlmOps.KnnK, LlmOps.KnnLshCfg, rounds = r,
          buildK = LlmOps.KnnBuildK)
        .collect().map(x => (x.getAs[Long]("src"), x.getAs[Long]("dst"))).toSet
      (exact & g).size.toDouble / exact.size
    }
    info(f"k-NN graph recall: seed ${recalls(0)}%.3f -> round1 " +
      f"${recalls(1)}%.3f -> round2 ${recalls(2)}%.3f " +
      s"(gold ${exact.size} edges)")
    assert(recalls(0) < recalls(2),
      "the seed already matches the converged graph — the refinement is untested")
    assert(recalls(1) >= recalls(0) && recalls(2) >= recalls(1),
      s"per-round recall not monotone: $recalls")
    assert(recalls(2) >= 0.9, f"round-2 recall ${recalls(2)}%.3f below 0.9")
    emb.unpersist()
  }

  test("incremental insert: delta recall measured vs rebuild; reverse update improves old lists") {
    // B119: the insert must (a) give delta vectors lists close to what a
    // full rebuild would (the deferral/1-hop price, MEASURED), and (b)
    // genuinely update old lists (some delta vector displaces a frozen
    // neighbor — the reverse re-rank is not a no-op), while (c) never
    // making any old list worse under the shared order (candidates only
    // ever ADD to a bounded top-k).
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")).cache()
    val isDelta = col("vec_id") % 10 === 7
    val inserted = Ann.knnInsert(emb, isDelta, k = LlmOps.KnnK,
        LlmOps.KnnLshCfg, rounds = 2, buildK = LlmOps.KnnBuildK)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Int]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cos_sim")))
    val frozen = Ann.knnGraph(emb.filter(!isDelta), LlmOps.KnnK,
        LlmOps.KnnLshCfg, rounds = 2, buildK = LlmOps.KnnBuildK)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Int]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cos_sim")))
    val exact = Ann.exactTopK(emb, isDelta, LlmOps.KnnK).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val deltaEdges = inserted.filter(r => r._1 % 10 == 7)
      .map(r => (r._1, r._3)).toSet
    val recall = (exact & deltaEdges).size.toDouble / exact.size
    info(f"insert: delta top-5 recall vs exact = $recall%.2f " +
      f"(${(exact & deltaEdges).size}/${exact.size})")
    assert(recall >= 0.75, f"delta insert recall degraded: $recall%.2f " +
      "(2-hop expansion measured 0.83 before pinning)")
    // (b) non-vacuous reverse update: some old list admitted a delta vector
    val oldWithDelta = inserted.count(r => r._1 % 10 != 7 && r._3 % 10 == 7)
    info(s"insert: $oldWithDelta old-list slots now hold a delta vector")
    assert(oldWithDelta > 0, "reverse update never fired")
    // (c) per-rank monotonicity: the updated old list's cos at each rank
    // is >= the frozen list's at that rank
    val fz = frozen.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._4)).toMap
    inserted.filter(r => r._1 % 10 != 7).groupBy(_._1).foreach {
      case (src, rows) =>
        val cos = rows.sortBy(_._2).map(_._4)
        fz.get(src).foreach { f =>
          f.zip(cos).zipWithIndex.foreach { case ((fc, ic), i) =>
            assert(ic >= fc, s"old $src rank ${i + 1}: $ic < frozen $fc")
          }
        }
    }
  }

  test("graph-ANN search: recall vs corpus-exact measured at 1/2/3 hops; monotone in hops") {
    // B120: the hop dial is a MEASURED trade-off (mirroring the insert
    // dial's 0.61 -> 0.83). Gold = exact top-5 per query AMONG THE CORPUS
    // (vec_id >= 10) — knnSearch never returns another query, so the
    // all-candidates exactTopK gold would be unfair. Monotone-in-hops is
    // a theorem (hop h+1's candidate set contains hop h's; a displacer
    // under the shared (round-6 cos DESC, id ASC) order is itself gold).
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")).cache()
    val all = emb.collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("e").toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      java.math.BigDecimal.valueOf(
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val corpus = all.filter(_._1 >= 10)
    val gold = all.filter(_._1 < 10).flatMap { case (qid, qe) =>
      corpus.map { case (cid, ce) => (cid, cos6(qe, ce)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(LlmOps.KnnK)
        .map { case (cid, _) => (qid, cid) }
    }.toSet
    val recalls = (1 to 3).map { h =>
      val got = Ann.knnSearch(emb, col("vec_id") < 10, k = LlmOps.KnnK,
          LlmOps.KnnLshCfg, rounds = 2, buildK = LlmOps.KnnBuildK, hops = h)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (gold & got).size.toDouble / gold.size
    }
    info(f"graph-ANN search top-5 recall: 1 hop ${recalls(0)}%.2f -> " +
      f"2 hops ${recalls(1)}%.2f -> 3 hops ${recalls(2)}%.2f " +
      s"(gold ${gold.size} pairs)")
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2),
      s"recall not monotone in hops: $recalls")
    assert(recalls(1) >= 0.75,
      f"2-hop search recall degraded: ${recalls(1)}%.2f")
    emb.unpersist()
  }

  test("filtered search: recall vs post-filter exact gold at two selectivities; only allowed ids returned") {
    // B133: the known failure mode — a selective filter starving the
    // filter-blind walk's shortlist — MEASURED, not assumed. Gold = exact
    // top-5 per query among corpus vectors PASSING the filter. Two dials:
    // label % 2 = 0 (~49% of the corpus) and label % 5 = 0 (~18%). The
    // floor for the selective filter is set lower: fewer allowed
    // candidates per bucket/list is the honest price of post-filtering,
    // and the hops dial is the documented recovery lever.
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"),
        col("label")).cache()
    val all = emb.collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("e").toArray,
        r.getAs[Int]("label")))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      java.math.BigDecimal.valueOf(
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val queries = all.filter(_._1 < 10)
    def measure(mod: Int, floor: Double): Double = {
      val allowed = all.filter(t => t._1 >= 10 && t._3 % mod == 0)
      val gold = queries.flatMap { case (qid, qe, _) =>
        allowed.map { case (cid, ce, _) => (cid, cos6(qe, ce)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(LlmOps.KnnK)
          .map { case (cid, _) => (qid, cid) }
      }.toSet
      val gotRows = Ann.knnSearchFiltered(emb, col("vec_id") < 10,
          col("label") % mod === 0, k = LlmOps.KnnK, LlmOps.KnnLshCfg,
          rounds = 2, buildK = LlmOps.KnnBuildK, hops = 2)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
      val allowedIds = allowed.map(_._1).toSet
      assert(gotRows.forall(r => allowedIds(r._2)),
        s"filter leak at mod=$mod: a disallowed id was returned")
      val got = gotRows.toSet
      val recall = (gold & got).size.toDouble / gold.size
      info(f"filtered search (label %% $mod = 0, " +
        f"${allowed.length * 100 / all.count(_._1 >= 10)}%d%% allowed): " +
        f"top-5 recall $recall%.2f (${(gold & got).size}/${gold.size})")
      assert(recall >= floor,
        f"filtered recall at mod=$mod degraded: $recall%.2f < $floor")
      recall
    }
    measure(2, 0.70)
    measure(5, 0.50)
    emb.unpersist()
  }

  test("beam-width dial: recall-vs-scored-pairs curve at two beams vs the unlimited walk") {
    // r16 verdict #8 (stretch): the serving-cost dial. Cost = exact
    // distance evaluations (each candidate scored once); beam = ∞
    // reproduces the unlimited walk's pool, smaller beams buy fewer
    // evaluations with measured recall loss.
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")).cache()
    val all = emb.collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("e").toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      java.math.BigDecimal.valueOf(
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val corpus = all.filter(_._1 >= 10)
    val gold = all.filter(_._1 < 10).flatMap { case (qid, qe) =>
      corpus.map { case (cid, ce) => (cid, cos6(qe, ce)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(LlmOps.KnnK)
        .map { case (cid, _) => (qid, cid) }
    }.toSet
    val gOld = Ann.knnGraph(emb.filter(col("vec_id") >= 10), LlmOps.KnnK,
      LlmOps.KnnLshCfg, rounds = 2, buildK = LlmOps.KnnBuildK).persist()
    val curve = Seq(8, 32, Int.MaxValue).map { b =>
      val (df, cost) = Ann.knnSearchBeamCounted(emb, col("vec_id") < 10,
        gOld, k = LlmOps.KnnK, LlmOps.KnnLshCfg, hops = 2, beam = b)
      val got = df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (b, (gold & got).size.toDouble / gold.size, cost)
    }
    gOld.unpersist(blocking = false)
    info(curve.map { case (b, r, c) =>
      val bl = if (b == Int.MaxValue) "∞" else b.toString
      f"beam=$bl: recall $r%.2f @ $c evals"
    }.mkString("beam dial (hops=2): ", ", ", f" (gold ${gold.size} pairs)"))
    val Seq((_, r8, c8), (_, r32, c32), (_, rInf, cInf)) = curve
    assert(c8 <= c32 && c32 <= cInf,
      s"cost not monotone in beam: $c8 / $c32 / $cInf")
    assert(c8 < cInf,
      "vacuous: the narrowest beam paid as much as the unlimited walk")
    // the unlimited-beam pool ≡ the unlimited walk's closure — its recall
    // must match the hop-dial test's 2-hop floor. Measured (deterministic
    // build): 0.50 @ 1200 evals / 0.74 @ 2452 / 0.90 @ 4450 — beam=32
    // keeps 82% of the recall for 55% of the evaluations.
    assert(rInf >= 0.75, f"beam=∞ recall broke the walk equivalence: $rInf%.2f")
    assert(r32 >= 0.65 && r8 >= 0.40,
      f"beam recall collapsed: beam32 $r32%.2f (measured 0.74), beam8 $r8%.2f (measured 0.50)")
    emb.unpersist()
  }

  test("filtered search at ~1% selectivity: hops dial measured to the recovery knee") {
    // r16 verdict #6: production tenant filters routinely run <= 1%
    // allowed — exactly where the filter-blind walk starves (the 18%
    // floor above says nothing about this regime). Measured on the
    // sf0.1 corpus (1990 corpus vectors; vec_id % 97 = 7 keeps 20 ≈ 1.0%)
    // over the hops dial with ONE frozen graph (the dial is a serve-time
    // knob — rebuilding per hop would conflate build variance into the
    // curve). Gold = exact top-5 among allowed.
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val sfBig = "/root/testdata/sf0.1"
    val emb = graft.Tables.embeddings(spark, sfBig)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")).cache()
    val all = emb.collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("e").toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      java.math.BigDecimal.valueOf(
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val allowed = all.filter(t => t._1 >= 10 && t._1 % 97 == 7)
    val nCorpus = all.count(_._1 >= 10)
    info(f"selectivity: ${allowed.length} of $nCorpus allowed " +
      f"(${allowed.length * 100.0 / nCorpus}%.1f%%)")
    assert(allowed.length >= 15 && allowed.length * 100 / nCorpus <= 1,
      s"fixture drifted: want ~1% allowed, got ${allowed.length}/$nCorpus")
    val gold = all.filter(_._1 < 10).flatMap { case (qid, qe) =>
      allowed.map { case (cid, ce) => (cid, cos6(qe, ce)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(LlmOps.KnnK)
        .map { case (cid, _) => (qid, cid) }
    }.toSet
    val gOld = Ann.knnGraph(emb.filter(col("vec_id") >= 10), LlmOps.KnnK,
      LlmOps.KnnLshCfg, rounds = 2, buildK = LlmOps.KnnBuildK)
      .persist()
    val allowedIds = allowed.map(_._1).toSet
    val recalls = (2 to 4).map { h =>
      val got = Ann.knnSearchFilteredInto(emb, col("vec_id") < 10,
          col("vec_id") % 97 === 7, gOld, k = LlmOps.KnnK,
          LlmOps.KnnLshCfg, hops = h)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
      assert(got.forall(p => allowedIds(p._2)),
        s"filter leak at hops=$h: a disallowed id was returned")
      h -> (gold & got.toSet).size.toDouble / gold.size
    }
    gOld.unpersist(blocking = false)
    info(recalls.map { case (h, r) => f"hops=$h: recall $r%.2f" }
      .mkString("~1%-filtered walk: ", ", ", f" (gold ${gold.size} pairs)"))
    // the knee: name the first dial setting that recovers >= 0.8, the
    // verdict's recovery bar — SCALE.md documents the curve
    val knee = recalls.find(_._2 >= 0.8).map(_._1)
    info(s"recovery knee (recall >= 0.8): ${knee.fold("NOT REACHED by hops<=4")(h => s"hops=$h")}")
    assert(knee.exists(_ <= 3),
      f"starvation not recovered by hops<=3 (measured 0.92 at 2, 1.00 at 3 " +
        f"when frozen): best ${recalls.map(_._2).max}%.2f — re-measure " +
        "before lowering the bar")
    // the curve must not collapse at the default dial either
    // (deterministic build: measured 0.92 at hops=2)
    assert(recalls.head._2 >= 0.75,
      f"hops=2 recall collapsed: ${recalls.head._2}%.2f")
  }

  test("graph delete: tombstones purged, untouched lists verbatim, repair = driver recompute") {
    // B122: (a) no deleted id survives as src or dst; (b) lists that never
    // referenced a deleted vector pass through VERBATIM (rank and cos);
    // (c) the repair is non-vacuous (some affected list admits a donated
    // neighbor it did not already hold); (d) every repaired list equals an
    // independent driver-side top-k over kept edges + donated candidates.
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")).cache()
    val isDel: Long => Boolean = _ % 10 == 3
    val full = Ann.knnGraph(emb, LlmOps.KnnK, LlmOps.KnnLshCfg, rounds = 2,
        buildK = LlmOps.KnnBuildK).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Int]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cos_sim")))
    val got = Ann.knnDelete(emb, col("vec_id") % 10 === 3, LlmOps.KnnK,
        LlmOps.KnnLshCfg, rounds = 2, buildK = LlmOps.KnnBuildK).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Int]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cos_sim")))
    assert(!got.exists(r => isDel(r._1) || isDel(r._3)),
      "a deleted id survived in the post-delete graph")
    val fullBySrc = full.groupBy(_._1)
    val gotBySrc = got.groupBy(_._1)
    val affected = fullBySrc.collect {
      case (src, rows) if !isDel(src) && rows.exists(r => isDel(r._3)) => src
    }.toSet
    assert(affected.nonEmpty, "fixture has no affected lists — delete untested")
    // (b) untouched verbatim
    fullBySrc.foreach { case (src, rows) =>
      if (!isDel(src) && !affected(src))
        assert(gotBySrc(src).sortBy(_._2) === rows.sortBy(_._2),
          s"untouched list $src changed")
    }
    // (d) repaired = independent recompute over kept + donated, using the
    // graph's own cos values for ordering ties on recomputation
    val byId = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Double]]("e").toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos6(a: Long, b: Long): Double =
      java.math.BigDecimal.valueOf(dot(byId(a), byId(b)) /
          (math.sqrt(dot(byId(a), byId(a))) * math.sqrt(dot(byId(b), byId(b)))))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    var donatedNew = 0
    affected.foreach { src =>
      val rows = fullBySrc(src)
      val kept = rows.filter(r => !isDel(r._3)).map(_._3).toSet
      val donated = rows.filter(r => isDel(r._3)).map(_._3).flatMap(d =>
        fullBySrc.getOrElse(d, Array.empty[(Long, Int, Long, Double)])
          .map(_._3).filter(w => !isDel(w) && w != src)).toSet
      val pool = kept ++ donated
      val expect = pool.toSeq.map(c => (c, cos6(src, c)))
        .sortBy { case (c, v) => (-v, c) }.take(LlmOps.KnnK)
      val gotList = gotBySrc(src).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(gotList === expect, s"repair diverged for $src")
      donatedNew += expect.map(_._1).count(c => !kept.contains(c))
    }
    info(s"delete: ${affected.size} affected lists repaired, " +
      s"$donatedNew repaired slots filled by donated candidates")
    assert(donatedNew > 0, "no donated candidate ever won a slot — repair vacuous")
    emb.unpersist()
  }

  test("mutual-kNN clustering: components equal a driver-side union-find; structure non-vacuous") {
    // B98: the graph's clustering use. Three claims: (1) the entry's
    // components equal an INDEPENDENT union-find over the mutual edge set
    // derived from the graph entry's own output (structurally different
    // second witness to the pointer-jumping operator + the DuckDB walk);
    // (2) the mutual set is symmetric by construction; (3) the pinned tau
    // is non-vacuous at this density — more than one cluster, at least
    // one of size >= 3, and NOT one giant component.
    val graph = graft.SparkEntry.queries("q_embed_knn_graph")(spark, sf)
      .collect()
      .map(r => ((r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")),
        r.getAs[Double]("cos_sim"))).toMap
    val mutual = graph.keys.filter { case (a, b) =>
      graph.contains((b, a)) && graph((a, b)) >= LlmOps.KnnClusterTau
    }.toSet
    assert(mutual.map(_.swap) === mutual, "mutual edge set not symmetric")
    // union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    mutual.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map(v => (find(v), v)).toSet
    val got = graft.SparkEntry.queries("q_embed_knn_clusters")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("cluster_rep"), r.getAs[Long]("member"))).toSet
    assert(got === expect,
      "components diverge from the independent union-find replay")
    val sizes = got.groupBy(_._1).view.mapValues(_.size).values.toSeq
    info(s"tau=${LlmOps.KnnClusterTau}: ${sizes.size} clusters, " +
      s"top sizes ${sizes.sorted.reverse.take(5)}, ${got.size} members")
    assert(sizes.size > 1, "one giant component — tau percolated (vacuous)")
    assert(sizes.max >= 3, "no cluster beyond a pair — tau too high (vacuous)")
    assert(sizes.max.toDouble / got.size < 0.5,
      "a single component holds most members — tau effectively percolated")
  }

  test("forCorpus-derived IVF config holds recall at a second corpus size (sf0.1)") {
    import graft.operators.{Ann, IvfConfig}
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    // same knobs as the catalog's pinned sf0.01 config (LlmOps.IvfCfg);
    // 2000 vectors derive k ~ sqrt(2000*2) ~ 63 uncapped, nprobe 2
    val cfg = IvfConfig.forCorpus(emb, recallTarget = 0.8,
      cellHitRate = 0.6, minCell = 30)
    info(s"derived at sf0.1: $cfg")
    assert(cfg.nprobe === 2 && cfg.numCentroids > 50,
      s"sf0.1 derivation regressed: $cfg")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val exact = pairs(Ann.exactTopK(emb, col("vec_id") < 10, 3))
    val ivf = pairs(Ann.ivfTopK(emb, col("vec_id") < 10, 3, cfg))
    val recall = (exact & ivf).size.toDouble / exact.size
    // measured 0.97 — the floor is the derivation's recallTarget itself
    info(f"derived-IVF top-3 recall at sf0.1: $recall%.2f (${(exact & ivf).size}/${exact.size})")
    assert(recall >= 0.8, f"derived-IVF sf0.1 recall degraded: $recall%.2f")
  }
}
