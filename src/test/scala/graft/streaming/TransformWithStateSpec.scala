package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.SparkSpecBase

/** B44 on the Spark 4 `transformWithState` API (the successor to
  * flatMapGroupsWithState): typed per-key ValueState on the RocksDB state
  * store, exactly the shape the reference's per-ISBN workflow flags
  * (MetadataIngestionServiceImpl.java:239–244) would take as streaming
  * state. */
/** Top-level (a spec inner class would capture the non-serializable suite). */
class RunningTotal extends StatefulProcessor[String, (String, Int), (String, Long)] {
  @transient private var total: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Int)],
                               timerValues: TimerValues): Iterator[(String, Long)] = {
    val cur = if (total.exists()) total.get() else 0L
    val next = cur + rows.map(_._2).sum
    total.update(next)
    Iterator((key, next))
  }
}

class TransformWithStateSpec extends SparkSpecBase {

  test("transformWithState keeps per-key running state across batches") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "2")
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    implicit val outEnc: Encoder[(String, Long)] = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val input = MemoryStream[(String, Int)]
    val q = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new RunningTotal, TimeMode.None(), OutputMode.Update())
      .toDF("key", "total")
      .writeStream.format("memory").queryName("tws").outputMode("update").start()
    try {
      input.addData(("a", 1), ("a", 2), ("b", 5)); q.processAllAvailable()
      input.addData(("a", 4), ("c", 7)); q.processAllAvailable()
      val rows = s.table("tws").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows === Set(("a", 3L), ("b", 5L), ("a", 7L), ("c", 7L)))
    } finally q.stop()
  }
}
