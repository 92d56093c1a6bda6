package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** B116 per-group OLS: every output against an independent BigInt
  * recompute, the hand-checkable exact-fit case, the div-semantics sign
  * guard the entry's scaladoc promises, and calibration against the
  * float regression Spark ships.
  */
class OlsSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def stats() = graft.Tables.lineitem(spark, sf)
    .select(col("l_returnflag"), col("l_quantity").cast("long"),
      round(col("l_extendedprice") * 100).cast("long"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    .groupBy(_._1).view.mapValues { rs =>
      val n = BigInt(rs.length)
      val sx = BigInt(rs.map(_._2).sum)
      val sy = BigInt(rs.map(_._3).sum)
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      (n, sx, sy, sxy, sxx)
    }.toMap

  test("catalog output equals an independent BigInt recompute") {
    val got = SparkEntry.queries("q_stats_ols")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = stats().map { case (flag, (n, sx, sy, sxy, sxx)) =>
      val slope = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
      val icept = (sy * 1000000 - slope * sx) / n
      flag -> ((n.toLong, slope.toLong, icept.toLong))
    }
    assert(got === want)
  }

  test("div semantics: Spark DIV truncates toward zero (matching DuckDB //), " +
    "and the fixture exercises a negative numerator") {
    // the cross-engine contract the entry's scaladoc states — probed, not
    // assumed: both engines give -7 div 2 = -3 (truncation, not floor)
    val r = spark.sql("SELECT CAST(-7 AS DECIMAL(38,0)) DIV 2 AS q").head()
    assert(r.getLong(0) === -3L, "Spark DIV must truncate toward zero")
    // BigInt '/' also truncates toward zero, so the spec's reference is
    // semantics-aligned; and flag A's slope numerator is genuinely
    // negative on this corpus — the negative path is NOT vacuous
    val negs = stats().count { case (_, (n, sx, sy, sxy, _)) =>
      n * sxy - sx * sy < 0
    }
    assert(negs >= 1, "expected at least one negative-covariance flag at sf0.001")
  }

  test("exact-fit case: y = 3x + 7 recovers slope 3e6, intercept 7e6") {
    val n = BigInt(5); val xs = Seq(1L, 2L, 3L, 5L, 8L)
    val ys = xs.map(3 * _ + 7)
    val sx = BigInt(xs.sum); val sy = BigInt(ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = xs.map(a => BigInt(a) * a).sum
    val slope = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
    assert(slope === BigInt(3000000))
    assert((sy * 1000000 - slope * sx) / n === BigInt(7000000))
  }

  test("calibration: integer slope matches Spark's float regr_slope within 1 ppm-unit") {
    val ref = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("double").as("x"),
        (round(col("l_extendedprice") * 100)).cast("double").as("y"))
      .groupBy(col("flag"))
      .agg(expr("regr_slope(y, x)").as("s"), expr("regr_intercept(y, x)").as("i"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val got = SparkEntry.queries("q_stats_ols")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    got.foreach { case (flag, (slopePpm, iceptPpm)) =>
      val (s, i) = ref(flag)
      assert(math.abs(slopePpm / 1e6 - s) < 1e-5, s"$flag slope vs regr_slope")
      assert(math.abs(iceptPpm / 1e6 - i) < 1.0, s"$flag intercept vs regr_intercept")
    }
  }
}
