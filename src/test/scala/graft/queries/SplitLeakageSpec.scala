package graft.queries

import graft.SparkSpecBase
import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** B67 leakage-safe split: the split key must be the near-dup CLUSTER, not
  * the document. This spec plants near-duplicate pairs and proves both
  * directions: cluster-keyed assignment never separates a cluster, and the
  * naive doc-keyed assignment demonstrably does (the leak the operator
  * exists to prevent). Everything is md5-deterministic — no rand(), no
  * flakiness. */
class SplitLeakageSpec extends SparkSpecBase {

  // 25 planted near-dup pairs: doc 2i and 2i+1 share a long common body and
  // differ by one trailing token — Jaccard well above the 0.8 confirm.
  private def corpus = {
    val sp = spark; import sp.implicits._
    (0 until 50).map { i =>
      val body = (0 until 40).map(j => s"tok${i / 2}_$j").mkString(" ")
      (i.toLong, s"$body tail$i")
    }.toDF("doc_id", "text")
  }

  private def splitOf(keyCol: org.apache.spark.sql.Column) =
    when(NearDup.h28(concat(keyCol.cast("string"), lit("_split"))) % 100 < 50,
      "train").otherwise("eval")

  test("cluster-keyed split never separates a near-dup cluster; doc-keyed split does") {
    val pairs = NearDup.minhashPairs(corpus, LlmOps.MinHashCfg)
      .select(col("doc_a"), col("doc_b"))
    val labels = NearDup.clusters(pairs)
      .select(col("member").as("doc_id"), col("cluster_rep"))
    assert(labels.count() == 50, "expected all 25 planted pairs confirmed")

    def spanning(byCluster: Boolean): Long = {
      val key = if (byCluster) col("cluster_rep") else col("doc_id")
      labels.withColumn("split", splitOf(key))
        .groupBy(col("cluster_rep"))
        .agg(countDistinct(col("split")).as("n_splits"))
        .filter(col("n_splits") > 1)
        .count()
    }

    assert(spanning(byCluster = true) == 0,
      "cluster-keyed split separated a cluster — structural guarantee broken")
    // the counterfactual: with a 50/50 doc-keyed draw over 25 two-member
    // clusters, separated clusters are a certainty for this fixed md5 draw
    val leaked = spanning(byCluster = false)
    assert(leaked > 0,
      "doc-keyed counterfactual produced no spanning cluster — the planted " +
        "corpus no longer demonstrates the leak this operator prevents")
  }

  test("catalog query: splits partition the corpus and group counts add up") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_split_leakage_safe")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val nDocs = rows.map(_._2).sum
    val total = graft.Tables.documents(spark, sf).count()
    assert(nDocs == total, s"splits lost/duplicated docs: $nDocs vs $total")
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "eval")), rows.toSeq)
  }
}
