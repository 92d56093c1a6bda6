package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** B65 bounded top-k Aggregator: must reproduce the window-sort answer
  * exactly (including ties) while never holding more than k elements, and
  * the merge path must be exercised across many partitions. */
class TopKAggSpec extends SparkSpecBase {

  test("matches row_number window top-k exactly, merge path across 16 partitions") {
    val sp = spark; import sp.implicits._
    // 4 groups x 500 rows with deliberate score ties (score = v % 50) so
    // the id tie-break decides membership; 16 input partitions force the
    // partial-buffer merge path many times per group.
    val rows = (0L until 2000L).map(i => (s"g${i % 4}", (i % 50).toDouble, i))
    val df = spark.createDataset(rows).repartition(16)
      .toDF("grp", "score", "id")

    val topk = TopKAgg.topK(spark, 7)
    val got = df.groupBy(col("grp"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).as("rn"),
        col("col._1").as("score"), col("col._2").as("id"))

    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 7)
      .select(col("grp"), col("rn"), col("score"), col("id"))

    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"aggregator top-k diverges from window top-k:\n" +
        s"extra=${got.except(want).collect().mkString(",")}\n" +
        s"missing=${want.except(got).collect().mkString(",")}")
  }

  test("groups smaller than k return all members in rank order") {
    val sp = spark; import sp.implicits._
    val df = Seq(("a", 1.0, 10L), ("a", 3.0, 11L), ("b", 2.0, 12L))
      .toDF("grp", "score", "id")
    val topk = TopKAgg.topK(spark, 5)
    val got = df.groupBy(col("grp"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("grp"), col("top").cast("string").as("top"))
      .orderBy(col("grp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(
      ("a", "[{3.0, 11}, {1.0, 10}]"), ("b", "[{2.0, 12}]")), got.toSeq)
  }

  test("buffer is bounded: reduce/merge never exceed k elements") {
    val sp = spark; import sp.implicits._
    val agg = new TopKAgg.TopK(3)
    val full = (0 until 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (i.toDouble, i.toLong)))
    assert(full == Seq((99.0, 99L), (98.0, 98L), (97.0, 97L)), full)
    val merged = agg.merge(full, Seq((99.5, 1L), (0.5, 2L)))
    assert(merged == Seq((99.5, 1L), (99.0, 99L), (98.0, 98L)), merged)
    // equal scores rank by id ascending
    val tied = agg.merge(Seq((5.0, 7L)), Seq((5.0, 3L), (5.0, 9L)))
    assert(tied == Seq((5.0, 3L), (5.0, 7L), (5.0, 9L)), tied)
  }
}
