package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import QUtil._

/** Streaming forms of the window/dedup operators (SURVEY.md §2 B6/B39/B40/
  * B43), oracle-checked: each query runs a REAL StreamingQuery (file-stream
  * source over the events table, Trigger.AvailableNow, memory sink) and
  * returns the sink contents; the DuckDB oracle is the same SQL the batch
  * analog passes against — proving streaming-mode output ≡ batch output.
  *
  * Complete output mode is used for the windowed aggregations (all windows
  * materialize regardless of watermark — the batch-parity form); dedup runs
  * in append mode, where emission is immediate. Watermark/late-data
  * semantics are exercised deterministically in StreamingSpec (MemoryStream
  * scripts batches) — a static re-read can't observe lateness.
  */
object StreamingQ {
  type Q = (SparkSession, String) => DataFrame

  /** events as a file-stream source, ts normalized exactly like
    * [[graft.Tables.events]] (TIMESTAMP(NANOS) arrives as long). */
  private def streamEvents(s: SparkSession, d: String): DataFrame = {
    val fileSchema = s.read.parquet(s"$d/events.parquet").schema
    val raw = s.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    if (fileSchema("ts").dataType.typeName == "long")
      raw.withColumnRenamed("ts", "ts_nanos")
        .withColumn("ts", timestamp_micros(expr("ts_nanos div 1000")))
    else raw.withColumn("ts_nanos", expr("unix_micros(ts) * 1000"))
  }

  /** Run `df` to completion into a memory sink and return its contents. */
  private def runToTable(s: SparkSession, df: DataFrame, name: String,
                         mode: String): DataFrame = {
    s.catalog.dropTempView(name)
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    s.table(name)
  }

  val defs: Map[String, Q] = Map(
    // B39 streaming tumbling window — same shape as q_events_tumbling.
    "q_stream_tumbling" -> { (s, d) =>
      val agg = streamEvents(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value"), 2).as("total_value"))
        .select(to_date(col("w.start")).as("day"), col("event_type"),
          col("n"), col("total_value"))
      runToTable(s, agg, "graft_stream_tumbling", "complete")
        .orderBy(col("day"), col("event_type"))
    },

    // B40 streaming sliding window — same shape as q_events_sliding.
    "q_stream_sliding" -> { (s, d) =>
      val agg = streamEvents(s, d)
        .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
        .agg(count(lit(1)).as("n"), moneySum(col("value"), 2).as("total_value"))
        .select(to_date(col("w.start")).as("win_start"), col("n"), col("total_value"))
      runToTable(s, agg, "graft_stream_sliding", "complete")
        .orderBy(col("win_start"))
    },

    // B43 streaming dropDuplicates (state = seen keys), append mode.
    "q_stream_dedup" -> { (s, d) =>
      val dedup = streamEvents(s, d)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      runToTable(s, dedup, "graft_stream_dedup", "append")
        .orderBy(col("user_id"), col("event_type"))
    })

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      s"""SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         |  event_type, count(*) AS n, ${moneySumSql("value", 2)} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q_stream_sliding" ->
      s"""WITH exploded AS (
         |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS win_start, value FROM events
         |  UNION ALL
         |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) - 1 AS win_start, value FROM events)
         |SELECT win_start, count(*) AS n, ${moneySumSql("value", 2)} AS total_value
         |FROM exploded GROUP BY win_start ORDER BY win_start""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin)
}
