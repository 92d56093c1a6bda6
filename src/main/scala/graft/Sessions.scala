package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * Every entry point (Verify, Bench, tests, CLI) builds its session here so
  * the oracle-critical settings are pinned in exactly one place:
  *
  *  - UTC session timezone (timestamp determinism vs the DuckDB oracle);
  *  - AQE on (runtime coalescing / skew-join splitting — the 100 TB posture);
  *  - shuffle partitions sized for the local[32] harness, NOT the 200
  *    default (on a real cluster this is set per-job to ~2-3x total cores);
  *  - `nanosAsLong` so parquet TIMESTAMP(NANOS) columns (events.ts) load as
  *    epoch-nano longs instead of throwing (Spark has no nanos timestamp).
  */
object Sessions {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(graft.functions.VectorExprs.register)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply the oracle-critical settings to an externally built session
    * (e.g. the driver's own Verify session). Safe to call repeatedly. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
