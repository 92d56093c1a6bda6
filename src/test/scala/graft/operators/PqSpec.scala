package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** graft.operators.Pq (SURVEY.md §2 B79): structural invariants of the
  * codes, training-actually-helps (quantization error measured before and
  * after Lloyd rounds), partition invariance of the deterministic
  * assignment, and MEASURED ADC top-3 recall against the exact L2 ranking.
  * Runs on sf0.001 (the spec-speed tier). */
class PqSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val cfg = PqConfig()

  private def vecs: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))

  private lazy val cb = Pq.train(vecs, cfg).cache()

  /** Mean squared quantization error of `codes` under codebook `cents`. */
  private def mse(cents: DataFrame): Double = {
    val ex = Pq.exploded(vecs, cfg)
    val codes = Pq.assign(ex, cents)
    codes.join(ex, Seq("vec_id", "m"))
      .join(broadcast(cents.withColumnRenamed("cent_id", "code")),
        Seq("m", "si", "code"))
      .agg(avg((col("x") - col("c")) * (col("x") - col("c"))))
      .head().getDouble(0)
  }

  test("codes are complete and in range") {
    val codes = Pq.encode(vecs, cfg, cb)
    val n = vecs.count()
    assert(codes.count() === n * cfg.m)
    assert(codes.filter(col("code") < 0 || col("code") >= cfg.k).isEmpty)
    // every (vec, subspace) has exactly one code
    assert(codes.groupBy("vec_id", "m").count().filter(col("count") =!= 1).isEmpty)
  }

  test("training reduces quantization error (measured)") {
    val ex = Pq.exploded(vecs, cfg)
    val seed = ex.filter(col("vec_id") < cfg.k)
      .select(col("m"), col("vec_id").as("cent_id"), col("si"), col("x").as("c"))
    val e0 = mse(seed)
    val e2 = mse(cb)
    info(f"quantization MSE seed=$e0%.6f trained=$e2%.6f (${e0 / e2}%.2fx)")
    assert(e2 < e0, s"Lloyd rounds did not reduce MSE: $e0 -> $e2")
  }

  test("encoding is invariant under repartitioning") {
    val a = Pq.encode(vecs, cfg, cb)
    val b = Pq.encode(vecs.repartition(7), cfg, cb)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("ADC shortlist recall vs exact L2 is measured and bounded") {
    // PQ's production role is the SHORTLIST stage of shortlist→exact-rerank
    // (8 bytes per vector is deliberately lossy). The operative metric:
    // does the exact top-3 survive in an ADC top-50 shortlist (≈2% of this
    // corpus; at 100 TB the shortlist fraction is far smaller)? The raw
    // top-3∩top-3 recall is measured and reported too, unasserted — it is
    // the honest "don't skip the rerank" number on these tightly-clustered
    // embeddings.
    val adc3 = Pq.adcTopK(vecs, col("vec_id") < 10, 3, cfg, cb)
      .select(col("qid"), col("vec_id"))
    val adc50 = Pq.adcTopK(vecs, col("vec_id") < 10, 50, cfg, cb)
      .select(col("qid"), col("vec_id"))
    // exact L2 top-3 per query over the full corpus
    val ex = Pq.exploded(vecs, cfg)
    val qex = ex.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("m"), col("si"), col("x").as("qx"))
    val d = qex.join(ex.withColumnRenamed("vec_id", "cand"), Seq("m", "si"))
      .groupBy(col("qid"), col("cand"))
      .agg(sum((col("qx") - col("x")) * (col("qx") - col("x"))).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("cand"))
    val exact = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("cand").as("vec_id")).cache()
    val hits3 = adc3.join(exact, Seq("qid", "vec_id"), "left_semi").count()
    val hits50 = adc50.join(exact, Seq("qid", "vec_id"), "left_semi").count()
    val recall3 = hits3.toDouble / 30
    val recall50 = hits50.toDouble / 30
    // self-retrieval: a query's own vector should make its own shortlist
    val selfHits = adc3.filter(col("qid") === col("vec_id")).count()
    info(f"ADC top-3∩top-3 recall = $recall3%.2f ($hits3/30); " +
      f"exact-top-3-in-ADC-top-50 = $recall50%.2f ($hits50/30); " +
      f"self-in-top3 = $selfHits/10")
    assert(recall50 >= 0.8, f"shortlist recall $recall50%.2f below floor 0.8")
    assert(selfHits >= 8L, s"only $selfHits/10 queries retrieve themselves")
  }

  test("IVF-PQ: cell-bounded candidates, ADC values consistent with full scan") {
    val ivfpq = Pq.ivfAdcTopK(vecs, col("vec_id") < 10, k = 3, nprobe = 2,
      numCentroids = 16, cfg, cb).cache()
    assert(ivfpq.groupBy("qid").count().filter(col("count") =!= 3).isEmpty)
    // every (qid, vec_id, adc) must carry the SAME adc the full ADC scan
    // computes — IVF only prunes candidates, it never changes a distance
    val full = Pq.adcTopK(vecs, col("vec_id") < 10, k = Int.MaxValue, cfg, cb)
      .select(col("qid"), col("vec_id"), col("adc"))
    val mismatches = ivfpq.select(col("qid"), col("vec_id"), col("adc"))
      .join(full.withColumnRenamed("adc", "adc_full"), Seq("qid", "vec_id"))
      .filter(col("adc") =!= col("adc_full")).count()
    assert(mismatches === 0L, s"$mismatches ADC values diverge from the full scan")
    // measured: how often the cell-pruned top-3 equals the full-ADC top-3
    // (self-match excluded from the full side, as IVF-PQ excludes it)
    val full3 = full.filter(col("qid") =!= col("vec_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 3).select(col("qid"), col("vec_id"))
    val agree = ivfpq.select(col("qid"), col("vec_id"))
      .join(full3, Seq("qid", "vec_id"), "left_semi").count()
    info(s"IVF-PQ top-3 agreement with full ADC (nprobe=2/16): $agree/30")
    assert(agree >= 15L, s"cell pruning lost too much: $agree/30")
  }

  test("train refuses a corpus whose vec_ids do not cover 0..k-1 (seed guard)") {
    // r10 ADVICE: the deterministic seed rule assumes dense 0-based ids —
    // on a sparse/offset corpus it would silently train < k centroids per
    // subspace. The guard turns that into a loud contract error.
    val sparse = vecs.withColumn("vec_id", col("vec_id") * 2 + 1000)
    val e = intercept[IllegalArgumentException](Pq.train(sparse, cfg))
    assert(e.getMessage.contains("seed"))
  }
}
