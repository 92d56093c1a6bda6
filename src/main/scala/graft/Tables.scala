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

  /** `events.ts` arrives in whichever encoding the fixture generator last
    * used — epoch-nano long (TIMESTAMP(NANOS) under `nanosAsLong`),
    * TIMESTAMP, or TIMESTAMP_NTZ (tz-less `timestamp[us]`, the pyarrow
    * default). TsNorm maps all three to a session-zoned `ts` TIMESTAMP plus
    * an epoch-nano `ts_nanos` LONG; TsEncodingSpec pins the equivalence.
    * DuckDB equivalent for every encoding: `CAST(ts AS TIMESTAMP)`.
    */
  def events(s: SparkSession, d: String): DataFrame =
    TsNorm.normalize(load(s, d, "events"))

  /** Register every table as a temp view (SQL surface parity). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { n =>
      load(s, d, n).createOrReplaceTempView(n)
    }
    events(s, d).createOrReplaceTempView("events")
  }
}
