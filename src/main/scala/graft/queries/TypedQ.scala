package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` API surface (SURVEY.md §1.4: typed Datasets at the API
  * boundary; B48 Aggregator family): the same relational semantics the
  * DataFrame catalog exercises, expressed through case-class Encoders,
  * typed lambdas and typed `Aggregator` columns on `groupByKey`.
  *
  * Scale notes: the projection happens BEFORE `.as[T]` so column pruning
  * still reaches the parquet scan; `Aggregator` columns keep partial+final
  * aggregation (map-side combine via `merge`) — the typed API does NOT cost
  * the shuffle its lambda-based `mapGroups` sibling would. The lambda
  * filter deliberately demonstrates the trade-off: it evaluates post-scan
  * (no pushdown), which is why the catalog keeps lambdas at the API
  * boundary and leaves predicates to Columns everywhere else.
  */
object TypedQ {
  type Q = (SparkSession, String) => DataFrame

  /** Projected row for the typed query (pruned at the scan). */
  case class LiSlim(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

  private def sumLong: Aggregator[(String, Long), Long, Long] =
    new Aggregator[(String, Long), Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: (String, Long)): Long = b + a._2
      override def merge(b1: Long, b2: Long): Long = b1 + b2
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  private def countRows: Aggregator[(String, Long), Long, Long] =
    new Aggregator[(String, Long), Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: (String, Long)): Long = b + 1L
      override def merge(b1: Long, b2: Long): Long = b1 + b2
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  val defs: Map[String, Q] = Map(
    // Typed pipeline: case-class Dataset → lambda filter → typed map to
    // exact cents → groupByKey + two Aggregator columns (partial+final).
    "q_typed_ds" -> { (s, d) =>
      import s.implicits._
      val ds = graft.Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .as[LiSlim]
      ds.filter(_.l_quantity > 25.0)
        .map(r => (r.l_returnflag, math.round(r.l_extendedprice * 100)))
        .groupByKey(_._1)
        .agg(countRows.toColumn.name("n_rows"), sumLong.toColumn.name("cents"))
        .toDF("l_returnflag", "n_rows", "cents")
        .select(col("l_returnflag"), col("n_rows"),
          round(col("cents") / 100, 2).as("total_price"))
        .orderBy(col("l_returnflag"))
    })

  val oracle: Map[String, String] = Map(
    "q_typed_ds" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100, 2) AS total_price
        |FROM lineitem WHERE l_quantity > 25.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
