package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §2).
  *
  * Each loader is a plain parquet scan — Catalyst pushes filters and prunes
  * columns into the scan, so callers should NOT cache or materialize here.
  * At 100 TB these paths would be partitioned directories; the API stays the
  * same (`spark.read.parquet` over a directory root).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark loads (under
    * `nanosAsLong`) as an epoch-nano long. Normalize to a microsecond
    * TimestampNTZ-equivalent column so downstream operators see a real
    * timestamp; keep the raw nanos as `ts_nanos` for exact arithmetic.
    * DuckDB equivalent: `CAST(ts AS TIMESTAMP)` (also truncates to micros).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    val tsType = raw.schema("ts").dataType.typeName
    if (tsType == "long") {
      // integer `div`, not `/`: epoch nanos (~1.7e18) overflow double precision
      raw.withColumnRenamed("ts", "ts_nanos")
        .withColumn("ts", timestamp_micros(expr("ts_nanos div 1000")))
    } else raw.withColumn("ts_nanos", expr("unix_micros(ts) * 1000"))
  }

  /** Register every table as a temp view (SQL surface parity). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { n =>
      load(s, d, n).createOrReplaceTempView(n)
    }
    events(s, d).createOrReplaceTempView("events")
  }
}
