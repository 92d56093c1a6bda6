package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Ann

/** B124 streaming k-NN-graph maintenance — the StreamCurateSpec
  * convention: the real streaming entry is checked against an
  * INDEPENDENT driver-side staged replay (build + insert + insert via
  * the explicit-state kernel), and the batch body is proven idempotent
  * under an at-least-once retry. The DuckDB oracle is the hash gate;
  * this spec is the second, structurally different witness. */
class StreamKnnSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val K = graft.queries.LlmOps.KnnK
  private val BK = graft.queries.LlmOps.KnnBuildK
  private val Cfg = graft.queries.LlmOps.KnnLshCfg

  private def emb(cond: org.apache.spark.sql.Column) =
    graft.Tables.embeddings(spark, sf).filter(cond)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getAs[Long](0), r.getAs[Int](1),
      r.getAs[Long](2), r.getAs[Double](3))).toSet

  /** The manual staged replay: build over %3=0, insert %3=1, insert %3=2. */
  private lazy val stagedReplay: Set[(Long, Int, Long, Double)] = {
    val g0 = Ann.knnGraph(emb(col("vec_id") % 3 === 0), K, Cfg,
      rounds = 2, buildK = BK)
    val v1 = emb(col("vec_id") % 3 === 0).withColumn("is_new", lit(false))
      .unionByName(emb(col("vec_id") % 3 === 1).withColumn("is_new", lit(true)))
    val g1 = Ann.knnInsertInto(v1, col("is_new"), g0, K, Cfg, hops = 2)
    val v2 = emb(col("vec_id") % 3 =!= 2).withColumn("is_new", lit(false))
      .unionByName(emb(col("vec_id") % 3 === 2).withColumn("is_new", lit(true)))
    val g2 = Ann.knnInsertInto(v2, col("is_new"), g1, K, Cfg, hops = 2)
    rows(g2.select(col("src"), col("rank"), col("dst"), col("cos_sim")))
  }

  test("real stream final graph equals the manual staged replay") {
    val got = rows(graft.SparkEntry.queries("q_stream_knn_insert")(spark, sf))
    assert(got === stagedReplay,
      "streaming graph diverges from the driver-side staged replay")
    // non-vacuous: the final graph holds lists for all three batches
    val bs = got.map(_._1 % 3)
    assert(bs === Set(0L, 1L, 2L), s"lists missing for batches: ${Set(0L,1L,2L) -- bs}")
  }

  test("streaming serving equals per-batch kernel replay; retry rewrites identical answers") {
    // B129: the real stream's answers must equal a manual per-batch
    // knnSearchInto replay against the same frozen index (per-batch LSH
    // occupancy = corpus + that batch only), and a retried serve batch
    // must rewrite byte-identical answers (static index, no state reads).
    val corpus = emb(col("vec_id") >= 10)
    val gFrozen = Ann.knnGraph(corpus, K, Cfg, rounds = 2, buildK = BK)
    val expected = (0 to 2).flatMap { b =>
      val qs = emb(col("vec_id") < 10 && col("vec_id") % 3 === b)
        .withColumn("is_q", lit(true))
      val visible = corpus.withColumn("is_q", lit(false)).unionByName(qs)
      rows(Ann.knnSearchInto(visible, col("is_q"), gFrozen, K, Cfg, hops = 2))
    }.toSet
    val got = rows(graft.SparkEntry.queries("q_stream_knn_search")(spark, sf))
    assert(got === expected,
      "streaming answers diverge from the per-batch kernel replay")
    assert(got.map(_._1) === (0L until 10L).toSet,
      "not every query was answered")
    // retry idempotence of the serve body
    val aRoot = new java.io.File(scratch("stream_knn_serve_retry")).getPath
    val b1 = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10 && col("vec_id") % 3 === 1)
      .select(col("vec_id"), col("embedding"))
    Ann.knnStreamServe(b1, 1, corpus, gFrozen, aRoot, K, Cfg, hops = 2)
    val first = rows(spark.read.parquet(s"$aRoot/b1")
      .select(col("qid"), col("rank"), col("cid"), col("cos_sim")))
    Ann.knnStreamServe(b1, 1, corpus, gFrozen, aRoot, K, Cfg, hops = 2)
    val second = rows(spark.read.parquet(s"$aRoot/b1")
      .select(col("qid"), col("rank"), col("cid"), col("cos_sim")))
    assert(first === second, "retried serve batch changed its answers")
  }

  test("knnStreamBatch is exactly-once: a retried batch rewrites identical state") {
    val root = new java.io.File(scratch("stream_knn_retry"))
    val gRoot = new java.io.File(root, "g").getPath
    val vRoot = new java.io.File(root, "v").getPath
    val raw = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    def b(i: Int) = raw.filter(col("vec_id") % 3 === i)
    def run(i: Int, bid: Long): Unit =
      Ann.knnStreamBatch(b(i), bid, gRoot, vRoot, K, Cfg,
        rounds = 2, buildK = BK, hops = 2)
    run(0, 0); run(1, 1)
    val afterB1 = rows(Ann.knnStreamState(spark, gRoot))
    // the retry: same batch, same id, AFTER the original committed — the
    // strictly-below state read must hide b1's own graph/vector dirs
    run(1, 1)
    assert(rows(Ann.knnStreamState(spark, gRoot)) === afterB1,
      "retry changed committed graph state")
    run(2, 2)
    assert(rows(Ann.knnStreamState(spark, gRoot)) === stagedReplay,
      "manual batch replay diverges from the staged-reference graph")
  }
}
