package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{Pq, PqConfig}

/** B130 streaming IVFADC serving — the StreamKnnSpec convention: the real
  * streaming entry is checked against an INDEPENDENT driver-side static
  * replay (ADC serving is stateless per query, so the replay is ONE serve
  * over all 10 queries — no staging), and the batch body is proven
  * idempotent under an at-least-once retry. The DuckDB oracle is the hash
  * gate; this spec is the second, structurally different witness. */
class StreamPqSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val cfg = PqConfig()
  private val nCoarse = graft.queries.LlmOps.IvfCfg.numCentroids
  private val nProbe = graft.queries.LlmOps.IvfCfg.nprobe

  private def emb(cond: org.apache.spark.sql.Column) =
    graft.Tables.embeddings(spark, sf).filter(cond)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
    df.select(col("qid"), col("rank"), col("vec_id"), col("adc")).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("adc"))).toSet

  test("streaming IVFADC answers equal the static replay; retry rewrites identical answers") {
    // frozen offline state, exactly as the entry builds it
    val corpus = emb(col("vec_id") >= 10)
    val cb = Pq.train(corpus, cfg, seedFrom = 10L)
    val coarse = corpus.filter(col("vec_id") < 10 + nCoarse)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))
    val index = Pq.encodeInto(corpus, cfg, cb, coarse)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      index.count()
      val expected = rows(Pq.ivfAdcServeTopK(emb(col("vec_id") < 10), index,
        k = 3, nProbe, cfg, cb, coarse))
      val got = rows(
        graft.SparkEntry.queries("q_stream_ivfpq_search")(spark, sf))
      assert(got === expected,
        "streaming answers diverge from the static serve replay — " +
          "serving picked up batch-dependent state it must not have")
      assert(got.map(_._1) === (0L until 10L).toSet,
        "not every query was answered")
      // retry idempotence: a re-run batch overwrites byte-identical answers
      val aRoot = new java.io.File(scratch("stream_ivfpq_retry")).getPath
      val b1 = graft.Tables.embeddings(spark, sf)
        .filter(col("vec_id") < 10 && col("vec_id") % 3 === 1)
        .select(col("vec_id"), col("embedding"))
      Pq.ivfStreamServe(b1, 1, index, cb, coarse, aRoot, k = 3, nProbe, cfg)
      val first = rows(spark.read.parquet(s"$aRoot/b1"))
      Pq.ivfStreamServe(b1, 1, index, cb, coarse, aRoot, k = 3, nProbe, cfg)
      val second = rows(spark.read.parquet(s"$aRoot/b1"))
      assert(first === second, "retried serve batch changed its answers")
      assert(first.nonEmpty && first.subsetOf(expected),
        "the retried batch's answers are not a subset of the full replay")
    } finally index.unpersist(blocking = false)
  }

  private def idxRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, List[Long])] =
    df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
      r.getAs[Seq[Long]]("codes").toList)).toSet

  test("streaming IVFADC encode accumulates to one static encode; retry rewrites identical codes") {
    // the WRITE side (q_stream_ivfpq_insert's kernel): frozen models from
    // the initial-corpus range, then per-range ivfStreamEncode batches —
    // statelessness means the batch-dir union must equal ONE encodeInto
    // of the whole corpus, and a retried batch must rewrite byte-identical
    // codes (no cross-batch state read exists to diverge on).
    val trainC = emb(col("vec_id") < 300)
    val cb = Pq.train(trainC, cfg)
    val coarse = trainC.filter(col("vec_id") < nCoarse)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val expected = idxRows(Pq.encodeInto(all, cfg, cb, coarse))
    val iRoot = new java.io.File(scratch("stream_ivfpq_encode")).getPath
    def raw(cond: org.apache.spark.sql.Column) =
      graft.Tables.embeddings(spark, sf).filter(cond)
        .select(col("vec_id"), col("embedding"))
    Pq.ivfStreamEncode(raw(col("vec_id") < 300), 0, cb, coarse, iRoot, cfg)
    Pq.ivfStreamEncode(raw(col("vec_id") >= 300 && col("vec_id") < 400),
      1, cb, coarse, iRoot, cfg)
    Pq.ivfStreamEncode(raw(col("vec_id") >= 400), 2, cb, coarse, iRoot, cfg)
    val got = idxRows(spark.read.parquet(s"$iRoot/b*"))
    assert(got === expected,
      "accumulated batch dirs diverge from the static encode")
    // retry idempotence
    val before = idxRows(spark.read.parquet(s"$iRoot/b1"))
    Pq.ivfStreamEncode(raw(col("vec_id") >= 300 && col("vec_id") < 400),
      1, cb, coarse, iRoot, cfg)
    val after = idxRows(spark.read.parquet(s"$iRoot/b1"))
    assert(before === after && before.nonEmpty,
      "retried encode batch changed its codes")
  }
}
