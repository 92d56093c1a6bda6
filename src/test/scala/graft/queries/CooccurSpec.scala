package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** B112 market-basket co-occurrence: support/lift on the live fixture
  * against an independent driver-side recompute (plain Scala maps, exact
  * BigInt lift), the support floor, and the rank discipline.
  */
class CooccurSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("catalog output equals a driver-side recompute of support, lift, and rank") {
    val got = SparkEntry.queries("q_item_cooccur")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // independent recompute: baskets as Scala sets
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .filter(_._2.size <= 20).toMap
    val nOrders = baskets.size.toLong
    val nItem = baskets.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val co = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { b =>
      for (a <- b; c <- b if a != c) co((a, c)) = co.getOrElse((a, c), 0L) + 1
    }
    val scored = co.toSeq.filter(_._2 >= 2).map { case ((a, c), n) =>
      val lift = (BigInt(n) * nOrders * 1000000 /
        (BigInt(nItem(a)) * nItem(c))).toLong
      (a, c, n, lift)
    }
    val want = scored.groupBy(_._1).toSeq.flatMap { case (item, rows) =>
      rows.sortBy { case (_, c, n, l) => (-n, -l, c) }.take(3).zipWithIndex
        .map { case ((_, c, n, l), i) => (item, i + 1, c, n, l) }
    }.sortBy(r => (r._1, r._2))

    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    assert(got.nonEmpty && got.exists(_._4 >= 3),
      "fixture should include support >= 3 pairs")
  }

  test("lift calibration: hand-derived values on planted baskets") {
    // 40 baskets; items 1,2 together in baskets 1..10 (n1 = n2 = co = 10
    // → lift = 10·40/(10·10) = 4.0 → 4e6 ppm); item 3 in EVERY basket
    // (pair (1,3): co = 10, lift = 10·40/(10·40) = 1.0 → exactly 1e6 ppm
    // — co-occurrence at the independence rate carries no signal).
    val rows = (1L to 40L).flatMap { o =>
      (if (o <= 10) Seq((o, 1L), (o, 2L)) else Seq.empty) :+ ((o, 3L))
    }
    val df = spark.createDataFrame(rows).toDF("o", "p")
    val n = df.distinct().groupBy(col("p")).agg(count(lit(1)).as("n_ord"))
    val lift = df.distinct().select(col("o"), col("p").as("a"))
      .join(df.distinct().select(col("o"), col("p").as("b")), Seq("o"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("co"))
      .join(n.select(col("p").as("a"), col("n_ord").as("na")), "a")
      .join(n.select(col("p").as("b"), col("n_ord").as("nb")), "b")
      .withColumn("lift_ppm", expr(
        "CAST(CAST(co AS DECIMAL(38,0)) * 40 * 1000000 " +
          "DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"))
      .select(col("a"), col("b"), col("lift_ppm"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(lift((1L, 2L)) === 4000000L, "planted pair: lift 4.0")
    assert(lift((1L, 3L)) === 1000000L, "ubiquitous partner: lift exactly 1.0")
    assert(lift((2L, 3L)) === 1000000L)
  }
}
