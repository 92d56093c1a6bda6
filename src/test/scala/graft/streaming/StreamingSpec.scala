package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.SparkSpecBase

/** B39–B44 streaming semantics, driven deterministically by MemoryStream
  * (SURVEY.md §5.2-5): each addData+processAllAvailable is one micro-batch,
  * so watermark advancement is scripted, not timing-dependent. */
class StreamingSpec extends SparkSpecBase {

  private def ts(min: Int) = new Timestamp(1767225600000L + min * 60000L)

  test("B39/B42 tumbling window + watermark drops late data, append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val q = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("w.start").as("start"), col("n"), col("v"))
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      input.addData((ts(0), 1.0), (ts(5), 2.0)); q.processAllAvailable()
      input.addData((ts(25), 3.0)); q.processAllAvailable()
      // late for the already-closable [0,10) window → must be dropped
      input.addData((ts(1), 100.0)); q.processAllAvailable()
      input.addData((ts(45), 4.0)); q.processAllAvailable()
      input.addData((ts(61), 5.0)); q.processAllAvailable()
      input.addData((ts(80), 6.0)); q.processAllAvailable()
      val rows = spark.table("tumb")
        .select(col("start"), col("n"), col("v")).collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).sortBy(_._1.getTime)
      assert(rows === Seq(
        (ts(0), 2L, 3.0),    // late +100.0 NOT included
        (ts(20), 1L, 3.0),
        (ts(40), 1L, 4.0),
        (ts(60), 1L, 5.0)))
    } finally q.stop()
  }

  test("B43 streaming dropDuplicates keeps first occurrence per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = input.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("key")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b")); q.processAllAvailable()
      input.addData((ts(3), "a"), (ts(4), "c")); q.processAllAvailable()
      val keys = spark.table("dedup").select("key").collect().map(_.getString(0)).sorted
      assert(keys === Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("B41 session window closes after the inactivity gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, Int)]
    val q = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("start"), col("w.end").as("end"), col("user"), col("n"))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData((ts(0), 1), (ts(2), 1), (ts(4), 1)); q.processAllAvailable()
      input.addData((ts(30), 1)); q.processAllAvailable() // gap > 5 min → new session
      input.addData((ts(60), 1)); q.processAllAvailable() // advance watermark
      val rows = spark.table("sess").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2), r.getLong(3)))
        .sortBy(_._1.getTime)
      assert(rows.nonEmpty)
      assert(rows(0) === ((ts(0), ts(9), 1, 3L))) // session = [first, last+gap)
    } finally q.stop()
  }

  test("B44 flatMapGroupsWithState keeps running per-key state across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Int)]
    val q = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Int)], state: GroupState[Int]) =>
          val total = state.getOption.getOrElse(0) + it.map(_._2).sum
          state.update(total)
          Iterator((key, total))
      }
      .toDF("key", "total")
      .writeStream.format("memory").queryName("fmgws").outputMode("update").start()
    try {
      input.addData(("a", 1), ("a", 2), ("b", 5)); q.processAllAvailable()
      input.addData(("a", 4)); q.processAllAvailable()
      val rows = spark.table("fmgws").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(rows === Set(("a", 3), ("b", 5), ("a", 7)))
    } finally q.stop()
  }

  test("B39 streaming tumbling aggregation equals the batch analog on events") {
    val sf = "/root/testdata/sf0.001"
    val batchRows = graft.SparkEntry.queries("q_events_tumbling")(spark, sf)
      .collect().map(_.toString).sorted
    val fileSchema = spark.read.parquet(s"$sf/events.parquet").schema
    // file-stream sources need a directory base path; glob to the one table
    val ev = graft.TsNorm.normalize(
      spark.readStream.schema(fileSchema)
        .option("pathGlobFilter", "events.parquet").parquet(sf))
    val q = ev.groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.QUtil.moneySum(col("value"), 2).as("total_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("n"), col("total_value"))
      .writeStream.format("memory").queryName("evtumb").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamRows = spark.table("evtumb").collect().map(_.toString).sorted
      assert(streamRows === batchRows)
    } finally q.stop()
  }
}
