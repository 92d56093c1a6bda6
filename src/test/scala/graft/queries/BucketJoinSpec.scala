package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** B11 co-located join via bucketing: pre-bucketed tables on the join key
  * join WITHOUT any shuffle exchange — the 100 TB recipe for repeated
  * large×large joins on a stable key (pay the shuffle once at write time,
  * never again at read time). */
class BucketJoinSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("bucketed lineitem⋈orders plans with zero Exchange, same results") {
    val s = spark
    val wh = scratch("bucketed")
    s.sql("DROP TABLE IF EXISTS li_bucketed")
    s.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(s, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li").saveAsTable("li_bucketed")
    Tables.orders(s, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord").saveAsTable("ord_bucketed")

    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joinOnly = s.table("li_bucketed")
        .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      val plan = joinOnly.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), plan)      // co-located: no shuffle at all
      assert(plan.contains("Bucketed: true"), plan) // both sides read bucketed
      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      // and the co-located join returns exactly the shuffled join's rows
      val shuffled = Tables.lineitem(s, sf)
        .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ===
        shuffled.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("regenerating the source in place invalidates the bucketed cache") {
    val s = spark
    import s.implicits._
    val wh = scratch("bucketed_fp")
    def build(n: Int, v: Long): Unit = Sources.ensureBucketed(s, "fp_bucketed",
      s"$wh/t", "k", "k BIGINT, v BIGINT",
      (0 until n).map(i => (i.toLong, v)).toDF("k", "v"))
    def maxV: Long = s.table("fp_bucketed").agg(max(col("v"))).head().getLong(0)
    val marker = new java.io.File(s"$wh/t/_built")
    try {
      build(5, v = 1)
      assert(s.table("fp_bucketed").count() === 5)
      val built1 = marker.lastModified()
      // identical source: served from the existing files, marker untouched
      build(5, v = 1)
      assert(marker.lastModified() === built1)
      // VALUES-only regeneration (same count, same max key): the row-hash
      // fingerprint still catches it — a cardinality-only one would not
      build(5, v = 2)
      assert(maxV === 2L)
      // cardinality change: rebuilt — a bare existence sentinel would have
      // kept serving the stale 5-row build
      build(7, v = 3)
      assert(s.table("fp_bucketed").count() === 7)
      assert(maxV === 3L)
    } finally s.sql("DROP TABLE IF EXISTS fp_bucketed")
  }
}
