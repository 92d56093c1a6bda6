package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Semantic invariants of the TrainPrep catalog that the row-hash oracle
  * cannot express: chunk coverage/overlap arithmetic, pack-bin budget
  * bounds, quantization range, and the broadcast shape of the
  * contamination join. Runs on sf0.001 (the spec-speed tier). */
class TrainPrepSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("q_doc_chunks: stride-48 windows cover every token of every doc") {
    val chunks = TrainPrep.defs("q_doc_chunks")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    // Coverage: last chunk's start + its length reaches n_toks, every start
    // is a multiple of the stride, and every chunk but the last is full
    // width (64) or the doc's remainder.
    val byDoc = chunks.groupBy("doc_id")
      .agg(max(col("start") + col("n_chunk_toks")).as("covered"),
        max(col("start")).as("last_start"),
        count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
    assert(byDoc.filter(col("covered") < col("n_toks")).count() == 0)
    assert(chunks.filter(col("start") % 48 =!= 0).count() == 0)
    // Each doc produces 1 + floor((n_toks - 17)/48) windows (clamped at 1):
    // a start s > 0 is emitted only when n_toks > s + 16, i.e. the window
    // adds content beyond the previous one's coverage.
    assert(byDoc.filter(col("n_chunks") =!=
      greatest(floor((col("n_toks") - 17) / 48) + 1, lit(1))).count() == 0)
  }

  test("q_seq_pack: bins stay within budget except the straddling doc") {
    val bins = TrainPrep.defs("q_seq_pack")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(max(size(split(col("text"), " ")))).head.getInt(0)
    // A bin opens below the 512-token budget; it can only overshoot by less
    // than the largest single doc (the straddler).
    bins.foreach { r =>
      val sum = r.getAs[Long]("sum_toks")
      assert(sum < 512 + docs, s"bin overshoots: $r")
    }
    // Bins within a pack group are dense (0..max with no holes).
    bins.groupBy(_.getAs[Long]("pack_group")).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0 && ids.zipWithIndex.forall { case (b, i) => b == i })
    }
  }

  test("q_embed_quant: quantized values live in [-127, 127] and hit ±127") {
    val q = TrainPrep.defs("q_embed_quant")(spark, sf)
    // sum_abs_q per vector is bounded by dims * 127, and at least one dim
    // hits the scale endpoint (|q| = 127 for the max-abs element).
    assert(q.filter(col("sum_abs_q") > col("n_dims") * 127).count() == 0)
    assert(q.filter(col("sum_abs_q") < 127).count() == 0)
  }

  test("q_contamination: benchmark docs are excluded and ppm is consistent") {
    val c = TrainPrep.defs("q_contamination")(spark, sf)
    assert(c.count() > 0, "contamination must flag at least one train doc")
    assert(c.filter(col("doc_id") < 25).count() == 0)
    assert(c.filter(col("n_hit") > col("n_shingles")).count() == 0)
    assert(c.filter(
      col("hit_ppm") =!= floor(col("n_hit") * 1000000 / col("n_shingles").cast("double")).cast("long"))
      .count() == 0)
  }

  test("q_contamination plan broadcasts the benchmark side") {
    val plan = TrainPrep.defs("q_contamination")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "benchmark join must broadcast")
  }

  test("q_text_rarity: rare fraction is in [0, 1e6] and counts are exact") {
    val r = TrainPrep.defs("q_text_rarity")(spark, sf)
    assert(r.filter(col("n_rare") > col("n_toks")).count() == 0)
    assert(r.filter(col("rare_ppm") > 1000000 || col("rare_ppm") < 0).count() == 0)
  }

  test("q_train_shards: every shard exists, counts add up, split is balanced") {
    val shards = TrainPrep.defs("q_train_shards")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(shards.map(_.getAs[Long]("shard")).toSeq == (0L to 7L),
      "all 8 shards must be populated, in order")
    assert(shards.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "shard counts must partition the corpus")
    // the md5 draw is uniform, so shard sizes concentrate around n/8 —
    // a 2x max/min spread at ~250 docs/shard would mean a broken draw,
    // and a training job fed 2x-skewed shards wastes an epoch's stragglers
    val sizes = shards.map(_.getAs[Long]("n_docs"))
    assert(sizes.max <= 2 * sizes.min,
      s"shard skew: ${sizes.mkString(",")}")
  }

  test("q_corpus_diff: statuses match the planted snapshot rules") {
    val diff = TrainPrep.defs("q_corpus_diff")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      val expected =
        if (id % 7 == 0 && id % 5 != 0) Some("added")
        else if (id % 7 != 0 && id % 5 == 0) Some("removed")
        else if (id % 7 != 0 && id % 11 == 0) Some("changed")
        else None // unchanged rows are filtered, absent-in-both impossible
      assert(diff.get(id) == expected, s"doc $id")
    }
    assert(diff.keySet.subsetOf(ids.toSet), "no phantom doc_ids")
  }

  test("calibration keeps each key's top quarter, tightly (per-source and per-(source,lang))") {
    // generalized over both calibration keys (r12 verdict #7): n_kept must
    // reach the quarter budget (>= ceil(n/4) docs at or above the cutoff)
    // and the cutoff must be tight — strictly-above-cutoff docs alone must
    // NOT satisfy the budget (else a higher cutoff would do).
    val docs = graft.Tables.documents(spark, sf)
    val m = graft.operators.LinearScorer.model(docs, minCount = 3)
    val scoredAll = graft.operators.LinearScorer.score(docs, m, 0L)
      .join(docs.select(col("doc_id"), col("source"), col("lang")),
        Seq("doc_id")).cache()
    for ((entry, keyCols) <- Seq(
        "q_score_calibrate" -> Seq("source"),
        "q_score_calibrate_lang" -> Seq("source", "lang"))) {
      val rows = TrainPrep.defs(entry)(spark, sf).collect()
      assert(rows.nonEmpty, s"$entry returned no rows")
      // the lang variant must actually refine the key, or it is the same
      // operator twice
      if (keyCols.size > 1)
        assert(rows.length > rows.map(_.getAs[String]("source")).distinct.length,
          "no source splits into multiple langs — the two-column key is vacuous")
      rows.foreach { r =>
        val key = keyCols.map(r.getAs[String]).mkString("/")
        val n = r.getAs[Long]("n_docs")
        val kept = r.getAs[Long]("n_kept")
        val cut = r.getAs[Long]("p75_micro")
        val budget = (n + 3) / 4
        assert(kept >= budget, s"$entry $key: kept $kept < ceil(n/4) $budget")
        // exact minimality of the discrete quantile (fixture-independent —
        // the old strictly-above < budget form was accidentally true only
        // while no key had n ≡ 0 (mod 4) with distinct logits at the
        // boundary): cut is the SMALLEST logit whose cumulative count
        // reaches ceil-rank, i.e. cum(cut) >= ceilRank and the previous
        // distinct value's cum < ceilRank.
        val keyFilter = keyCols.map(c => col(c) === r.getAs[String](c))
          .reduce(_ && _)
        val above = scoredAll.filter(keyFilter &&
          col("logit_micro") > cut).count()
        val atCut = scoredAll.filter(keyFilter &&
          col("logit_micro") === cut).count()
        val ceilRank = (3 * n + 3) / 4
        assert(atCut >= 1, s"$entry $key: cutoff $cut is not an attained logit")
        assert(n - above >= ceilRank,
          s"$entry $key: cum(cut) ${n - above} below ceil-rank $ceilRank")
        assert(n - above - atCut < ceilRank,
          s"$entry $key: cutoff $cut not minimal — the previous distinct " +
            s"value already reaches ceil-rank $ceilRank")
        assert(kept === above + atCut,
          s"$entry $key: n_kept $kept != recounted ${above + atCut}")
      }
    }
    scoredAll.unpersist()
  }

  test("q_text_scrub_passages removes exactly the planted shared passage, sha-reconstructed") {
    // B82 semantics on a planted corpus: an 8-token passage shared by 3
    // docs must be scrubbed from all three occurrences (every covered
    // token), docs without it untouched, and the sha must equal the sha of
    // the independently reconstructed scrubbed string.
    val s = spark
    import s.implicits._
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8"
    val rows = Seq(
      (0L, s"alpha beta $passage gamma delta"),
      (1L, s"$passage zeta"),
      (2L, s"eta theta iota $passage"),
      (3L, "plain doc with no shared passage at all here ok"),
      // a doc holding the passage's tokens NON-adjacently must keep them
      (4L, "p1 x p2 x p3 x p4 x p5 x p6 x p7 x p8"))
    val dir = java.nio.file.Files.createTempDirectory("scrub_spec").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TrainPrep.defs("q_text_scrub_passages")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def sha(x: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0L) === ((12L, 8L, sha("alpha beta gamma delta"))))
    assert(out(1L) === ((9L, 8L, sha("zeta"))))
    assert(out(2L) === ((11L, 8L, sha("eta theta iota"))))
    assert(out(3L)._2 === 0L)
    assert(out(4L)._2 === 0L)
    graft.Fs.deleteRecursively(new java.io.File(dir))
  }

  test("q_token_budget_fill: the scalable cumsum prefix is exactly the budget prefix") {
    // the fill must equal the longest-first greedy prefix computed
    // independently driver-side
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val budget = docs.map(_._3).sum / 2
    var acc = 0L
    val taken = docs.sortBy(d => (-d._3, d._1)).takeWhile { d =>
      acc += d._3; acc <= budget
    }
    val expect = taken.groupBy(_._2)
      .map { case (src, xs) => src -> (xs.length.toLong, xs.map(_._3).sum) }
    val got = TrainPrep.defs("q_token_budget_fill")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
  }

  test("q_score_ks_drift: integer KS equals a driver-side reference; new sources excluded") {
    val rows = TrainPrep.defs("q_score_ks_drift")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    // independent reference: collect per-doc logits (the spec-scale corpus
    // is small), recompute every source's exact-integer KS in plain Scala
    val docs = graft.Tables.documents(spark, sf)
    val m = graft.operators.LinearScorer.model(docs, minCount = 3)
    val scored = graft.operators.LinearScorer.score(docs, m, 0L)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("doc_id"), col("logit_micro"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = scored.groupBy(_._1)
    bySrc.foreach { case (src, xs) =>
      val old = xs.filter(_._2 % 10 != 7).map(_._3)
      val nw = xs.map(_._3)
      if (old.isEmpty) {
        assert(!rows.contains(src), s"$src has no old sample but a KS row")
      } else {
        val vals = nw.distinct.sorted
        val d = vals.map { v =>
          math.abs(old.count(_ <= v).toLong * nw.length -
            nw.count(_ <= v).toLong * old.length)
        }.max
        val (nOld, nNew, ksNum, ksPpm) = rows(src)
        assert((nOld, nNew, ksNum) === ((old.length.toLong, nw.length.toLong, d)))
        assert(ksPpm === d * 1000000L / (nOld * nNew))
      }
    }
    // non-vacuous: the fixture must actually HAVE a new-only source
    assert(bySrc.exists(_._2.forall(_._2 % 10 == 7)),
      "no new-only source in the fixture — the exclusion rule is untested")
  }

  test("q_dedup_source_matrix: cells sum to the confirmed pair count, keys ordered") {
    val rows = graft.SparkEntry.queries("q_dedup_source_matrix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val pairs = graft.SparkEntry.queries("q_dedup_minhash_lsh")(spark, sf).count()
    assert(rows.map(_._3).sum === pairs,
      "matrix cells must partition the confirmed near-dup pairs")
    rows.foreach { case (x, y, n) =>
      assert(x <= y, s"unordered cell ($x, $y)"); assert(n > 0)
    }
  }

  test("q_corpus_drift: shares are consistent and drift is symmetric-exact") {
    val rows = TrainPrep.defs("q_corpus_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val tolPpm = rows.length // each floor() loses < 1 ppm
    val sumOld = rows.map(_.getAs[Long]("share_old_ppm")).sum
    val sumNew = rows.map(_.getAs[Long]("share_new_ppm")).sum
    assert(math.abs(sumOld - 1000000L) <= tolPpm, s"old shares sum $sumOld")
    assert(math.abs(sumNew - 1000000L) <= tolPpm, s"new shares sum $sumNew")
    rows.foreach { r =>
      assert(r.getAs[Long]("drift_ppm") ===
        math.abs(r.getAs[Long]("share_new_ppm") - r.getAs[Long]("share_old_ppm")))
      assert(r.getAs[Long]("n_old") > 0L || r.getAs[Long]("n_new") > 0L)
    }
  }

  test("q_text_bigram_coverage: ppm equals a driver-side bigram recount") {
    // B91: the integer-exact analog of LM-perplexity filtering — verify
    // every row against an independent in-memory recount of corpus bigram
    // frequencies and per-doc coverage, plus non-vacuousness on both
    // sides of the threshold.
    val rows = TrainPrep.defs("q_text_bigram_coverage")(spark, sf).collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bigrams(t: String): Seq[String] =
      t.split(" ", -1).toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
    val corpus = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    texts.foreach { case (_, t) => bigrams(t).foreach(b => corpus(b) += 1) }
    val expect = texts.collect { case (id, t) if bigrams(t).nonEmpty =>
      val bs = bigrams(t)
      val cov = bs.count(b => corpus(b) >= 3).toLong
      id -> ((bs.size.toLong, cov, cov * 1000000L / bs.size))
    }.toMap
    assert(rows.length === expect.size)
    rows.foreach { r =>
      val (n, cov, ppm) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") === n)
      assert(r.getAs[Long]("n_covered") === cov)
      assert(r.getAs[Long]("coverage_ppm") === ppm)
    }
    assert(rows.exists(_.getAs[Long]("coverage_ppm") > 0L),
      "no covered bigrams anywhere — threshold side untested")
    assert(rows.exists(r =>
      r.getAs[Long]("n_covered") < r.getAs[Long]("n_bigrams")),
      "every bigram covered — the uncovered side is untested")
  }

  test("q_train_dsir: scores equal a driver-side hashed-bucket recount; mass theorem holds") {
    // B103: full independent recompute — tokenize, hash (first 7 md5 hex
    // chars mod 1024), count per-bucket target/corpus occurrences, lean
    // by exact cross-multiplication, re-score every doc — plus the
    // aggregate THEOREM the construction guarantees: summing the strict
    // per-bucket inequalities, the target's total bigram mass inside the
    // leaning bucket set strictly exceeds the corpus's (the DSIR premise
    // as provable arithmetic, not fixture luck).
    val rows = TrainPrep.defs("q_train_dsir")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(t: String): Seq[String] =
      t.split(" ", -1).toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
    def h28mod(sx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1024
    }
    val cR = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cT = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    docs.foreach { case (_, src, t) => bigrams(t).foreach { b =>
      val bk = h28mod(b)
      cR(bk) += 1
      if (src == "src0") cT(bk) += 1
    } }
    val (nR, nT) = (cR.values.sum, cT.values.sum)
    val lean = cR.keySet.filter(bk =>
      BigInt(cT(bk)) * nR > BigInt(cR(bk)) * nT)
    assert(lean.nonEmpty, "no target-leaning buckets — the selection is vacuous")
    assert(lean.size < cR.size, "every bucket leans — the filter is vacuous")
    val tMass = lean.toSeq.map(cT).sum
    val rMass = lean.toSeq.map(cR).sum
    assert(BigInt(tMass) * nR > BigInt(rMass) * nT,
      "aggregate leaning-mass theorem violated — the lean set is wrong")
    val expect = docs.collect { case (id, _, t) if bigrams(t).nonEmpty =>
      val bks = bigrams(t).map(h28mod)
      val nl = bks.count(lean).toLong
      id -> ((bks.size.toLong, nl * 1000000L / bks.size))
    }.toMap
    assert(rows.length === expect.size)
    rows.foreach { r =>
      val (n, ppm) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") === n, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("dsir_ppm") === ppm, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // the OrderedCumsum rank is exactly the (ppm desc, doc_id) permutation,
    // and selected is exactly the top-ceil(n/4) prefix of it
    val sorted = rows.sortBy(r =>
      (-r.getAs[Long]("dsir_ppm"), r.getAs[Long]("doc_id")))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") === i + 1L,
        s"rank mismatch at position $i (doc ${r.getAs[Long]("doc_id")})")
    }
    val quota = (rows.length + 3) / 4
    assert(rows.count(_.getAs[Boolean]("selected")) === quota)
    assert(rows.filter(_.getAs[Boolean]("selected"))
      .forall(_.getAs[Long]("rank") <= quota))
  }
}
