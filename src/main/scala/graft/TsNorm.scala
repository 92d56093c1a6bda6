package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed-boundary normalizer for the timestamp encodings tz-less event data
  * actually arrives in. Parquet writers in the wild emit the same instant
  * three ways, and a 100 TB lake accumulates all of them over its lifetime:
  *
  *  - `int64` epoch nanoseconds — either a plain long column, or parquet
  *    TIMESTAMP(NANOS) loaded under `spark.sql.legacy.parquet.nanosAsLong`
  *    (Spark has no nanosecond timestamp type);
  *  - parquet `timestamp[us]` adjusted-to-UTC → Spark `TIMESTAMP`;
  *  - parquet `timestamp[us]` with no timezone → Spark `TIMESTAMP_NTZ`
  *    (what pyarrow/pandas emit by DEFAULT, so the most common of the three
  *    for freshly generated data).
  *
  * `normalize` maps any of them to the same two columns:
  *
  *  - `tsCol`:    session-zoned `TIMESTAMP`, microsecond precision — the
  *    type every downstream time operator (windows, as-of joins, watermarks,
  *    `unix_micros`) expects;
  *  - `nanosCol`: epoch nanoseconds as `LONG`, for exact integer arithmetic
  *    (zero-loss only when the input was nanos; micro-sourced inputs carry
  *    trailing zeros).
  *
  * The NTZ→TIMESTAMP cast reinterprets the wall-clock fields in the session
  * timezone; Sessions.builder pins the session to UTC, so for UTC-written
  * data (all driver fixtures) the instant is preserved exactly. Unknown
  * encodings fail loudly at plan time rather than silently mis-reading —
  * a schema drift on a driver-owned fixture should break ONE spec
  * (TsEncodingSpec), not silently zero a fifth of the catalog.
  */
object TsNorm {
  def normalize(df: DataFrame, tsCol: String = "ts",
                nanosCol: String = "ts_nanos"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        // integer `div`, not `/`: epoch nanos (~1.7e18) overflow double precision
        df.withColumnRenamed(tsCol, nanosCol)
          .withColumn(tsCol, timestamp_micros(expr(s"$nanosCol div 1000")))
      case TimestampType =>
        df.withColumn(nanosCol, unix_micros(col(tsCol)) * lit(1000L))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
          .withColumn(nanosCol, unix_micros(col(tsCol)) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"TsNorm: unsupported encoding ${other.simpleString} for column `$tsCol` " +
            "(expected LONG epoch-nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
}
