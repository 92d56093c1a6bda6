package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-encoding guard (round-9 postmortem): the driver regenerated
  * `events.parquet` with tz-less `timestamp[us]` (Spark: TIMESTAMP_NTZ) and
  * the loader's two-branch normalization threw at plan time, silently
  * zeroing 35 catalog entries. This spec writes the SAME instants in every
  * encoding a fixture regeneration can plausibly produce and pins that
  * [[Tables.events]] yields bit-identical `ts`/`ts_nanos` for all of them —
  * so the next driver-side schema drift breaks here, loudly, not at the
  * correctness gate.
  */
class TsEncodingSpec extends SparkSpecBase {

  // micros chosen to exercise sub-second precision, epoch, and pre-epoch
  private val instantsUs =
    Seq(1700000000000000L, 1700000000123456L, 0L, -3600000000L)
  private val rows = instantsUs.zipWithIndex.map { case (us, i) => (i.toLong, us) }

  private def writeFixture(dir: String, encode: org.apache.spark.sql.Column): String = {
    spark.createDataFrame(rows).toDF("event_id", "us")
      .select(col("event_id"), encode.as("ts"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.events normalizes nanos-long, TIMESTAMP, and TIMESTAMP_NTZ identically") {
    val base = scratch("ts-encodings")
    val dLong = writeFixture(s"$base/enc_long", (col("us") * lit(1000L)))
    val dTz   = writeFixture(s"$base/enc_tz", timestamp_micros(col("us")))
    val dNtz  = writeFixture(s"$base/enc_ntz",
      timestamp_micros(col("us")).cast(TimestampNTZType))

    // the three fixtures must genuinely differ on disk, or the guard is vacuous
    assert(spark.read.parquet(s"$dLong/events.parquet").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$dTz/events.parquet").schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(s"$dNtz/events.parquet").schema("ts").dataType == TimestampNTZType)

    def normalized(dir: String): Seq[(Long, Long, Long)] = {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir: normalized ts must be session-zoned TIMESTAMP")
      assert(ev.schema("ts_nanos").dataType == LongType)
      ev.select(col("event_id"), col("ts_nanos"), unix_micros(col("ts")).as("ts_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }

    val expected = rows.map { case (id, us) => (id, us * 1000L, us) }
    assert(normalized(dLong) == expected)
    assert(normalized(dTz) == expected)
    assert(normalized(dNtz) == expected)
  }

  test("the driver's CURRENT events fixture is an encoding TsNorm accepts") {
    // pins the live fixture itself, not just synthetic re-encodings: if a
    // future regeneration invents a fourth encoding, this fails before the gate
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(count(lit(1))).head().getLong(0) > 0)
  }

  test("an unsupported ts encoding fails loudly at plan time") {
    val base = scratch("ts-encodings-bad")
    val dBad = writeFixture(s"$base/enc_str",
      date_format(timestamp_micros(col("us")), "yyyy-MM-dd HH:mm:ss"))
    val e = intercept[IllegalArgumentException](Tables.events(spark, dBad))
    assert(e.getMessage.contains("unsupported encoding"))
  }
}
