package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The streaming state operators must run on the production-grade RocksDB
  * state store provider, not just the default in-memory HDFS-backed one —
  * at 100 TB of keyed state the JVM-heap provider is not an option. */
class RocksDBStateSpec extends SparkSpecBase {

  private def ts(min: Int) = new Timestamp(1767225600000L + min * 60000L)

  test("streaming dedup + windowed agg run on RocksDBStateStoreProvider") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = input.toDF().toDF("ts", "key", "v")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("key")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("window.start").as("start"), col("n"), col("total"))
      .writeStream.format("memory").queryName("rocks")
      .outputMode("complete").start()
    try {
      input.addData((ts(0), "a", 1.0), (ts(1), "a", 99.0), (ts(2), "b", 2.0))
      q.processAllAvailable()
      input.addData((ts(3), "c", 4.0), (ts(4), "b", 99.0))
      q.processAllAvailable()
      val rows = s.table("rocks").collect()
        .map(r => (r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq === Seq((3L, 7.0))) // a,b,c kept once; dups dropped
      // prove the provider actually engaged (it would have thrown on a
      // missing rocksdbjni; assert the conf stuck for the session)
      assert(s.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
    } finally q.stop()
  }
}
