package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The incremental-ingest invariant: `minhashPairsIncremental(history,
  * delta)` is pair-for-pair equal to the full `minhashPairs(history ∪
  * delta)` restricted to delta-touching pairs — the property that makes
  * per-batch dedup cost proportional to the batch. */
class IncrementalDedupSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("incremental pairs == full pairs restricted to delta-touching") {
    val cfg = MinHashConfig()
    val full = NearDup.minhashPairs(docs, cfg)
      .filter(col("doc_a") % 10 === 7 || col("doc_b") % 10 === 7)
    val incr = NearDup.minhashPairsIncremental(
      docs.filter(col("doc_id") % 10 =!= 7),
      docs.filter(col("doc_id") % 10 === 7), cfg)
    assert(incr.count() > 0, "split must produce at least one delta pair")
    assert(incr.exceptAll(full).count() == 0 && full.exceptAll(incr).count() == 0)
  }

  test("embed incremental pairs == full pairs restricted to delta-touching") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("e"))
    val cfg = EmbedLshConfig()
    val full = NearDup.embedCosinePairs(emb, cfg)
      .filter(col("keep_id") % 10 === 7 || col("dup_id") % 10 === 7)
    val incr = NearDup.embedCosinePairsIncremental(
      emb.filter(col("vec_id") % 10 =!= 7),
      emb.filter(col("vec_id") % 10 === 7), cfg)
    assert(incr.exceptAll(full).count() == 0 && full.exceptAll(incr).count() == 0)
    assert(incr.filter(col("keep_id") % 10 =!= 7 && col("dup_id") % 10 =!= 7)
      .count() == 0)
  }

  test("no history-history pair is ever emitted") {
    val incr = NearDup.minhashPairsIncremental(
      docs.filter(col("doc_id") % 10 =!= 7),
      docs.filter(col("doc_id") % 10 === 7))
    assert(incr.filter(col("doc_a") % 10 =!= 7 && col("doc_b") % 10 =!= 7)
      .count() == 0)
  }
}
