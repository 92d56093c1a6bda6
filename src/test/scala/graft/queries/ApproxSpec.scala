package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** B20: approx_count_distinct (HLL) tracks the exact distinct count within
  * the declared rsd. Since r11 the catalog entry is DIFFERENTIAL (it emits
  * the exact count plus a 5·rsd bound check the DuckDB oracle hash-verifies);
  * this spec keeps the tighter empirical error evidence. */
class ApproxSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5*rsd of countDistinct per group") {
    val rsd = 0.01
    val rows = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), rsd).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 5 * rsd,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("percentile_approx brackets the exact percentile within the accuracy rank bound") {
    // t-digest-style sketches are engine-private like HLL — the correctness
    // evidence is the rank-error bound vs the exact percentile, not an
    // oracle hash. accuracy=10000 ⇒ rank error ≤ n/10000 ⇒ at these group
    // sizes the approx p50 must land within the exact p40..p60 envelope.
    val rows = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.4)").as("lo"),
        expr("percentile(l_extendedprice, 0.6)").as("hi"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, ap) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(ap >= lo && ap <= hi, s"${r.getString(0)}: approx p50 $ap outside [$lo, $hi]")
    }
  }

  test("q_approx_distinct is differential: exact count + a true bound check per group") {
    // r10 verdict #2: the catalog entry now emits (exact count, 5·rsd bound
    // check) so the DuckDB oracle hash-checks it — within_bound must be
    // true on every group or the entry diverges from its oracle.
    val df = graft.SparkEntry.queries("q_approx_distinct")(spark, sf)
    assert(df.columns.toSeq === Seq("l_returnflag", "exact_orders", "within_bound"))
    val rows = df.collect()
    assert(rows.length === 3)
    rows.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} outside 5*rsd"))
  }
}
