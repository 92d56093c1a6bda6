package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** MEASURED MinHash-LSH quality against the exact all-pairs baseline (the
  * analytic S-curve bound lives in NearDupConfigSpec; this pins what the
  * default geometry actually delivers on the test corpus, the way
  * AnnRecallSpec does for the ANN shapes). Runs on sf0.001 where the
  * quadratic baseline is affordable. */
class NearDupRecallSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("MinHash pairs: precision 1.0 by construction, measured recall >= 0.9") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cfg = MinHashConfig()

    // exact quadratic baseline: all pairs with 3-shingle Jaccard >= confirm
    val sh = NearDup.shingles(docs, cfg.shingleWidth)
      .groupBy(col("doc_id")).agg(collect_set(col("sh")).as("s"))
    val a = sh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val exact = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("jac", round(inter / (size(col("sa")) + size(col("sb")) - inter), 3))
      .filter(col("jac") >= cfg.jaccardConfirm)
      .select(col("doc_a"), col("doc_b"))

    val lsh = NearDup.minhashPairs(docs, cfg).select(col("doc_a"), col("doc_b"))

    val nExact = exact.count()
    assert(nExact > 0, "test corpus must contain confirmed near-dup pairs")
    // every LSH pair is exact-Jaccard-confirmed, so none can fall outside
    // the baseline: precision is exactly 1.0
    assert(lsh.exceptAll(exact).count() == 0)
    val recall = lsh.intersect(exact).count().toDouble / nExact
    assert(recall >= 0.9,
      f"measured LSH recall $recall%.3f below 0.9 (exact pairs: $nExact)")
  }
}
