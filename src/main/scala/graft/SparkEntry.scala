package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => cat}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2): one entry per
  * operator, each paired with equivalent DuckDB SQL in `oracleSql` for the
  * driver's hash-compare correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  private def catalog: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (cat.Relational.defs, cat.Relational.oracle),
      (cat.Scalars.defs, cat.Scalars.oracle),
      (cat.Events.defs, cat.Events.oracle),
      (cat.LlmOps.defs, cat.LlmOps.oracle),
      (cat.PipelineQ.defs, cat.PipelineQ.oracle),
      (cat.Sources.defs, cat.Sources.oracle),
      (cat.StreamingQ.defs, cat.StreamingQ.oracle),
      (cat.Sql.defs, cat.Sql.oracle),
      (cat.TypedQ.defs, cat.TypedQ.oracle),
      (cat.Curation.defs, cat.Curation.oracle),
      (cat.Graph.defs, cat.Graph.oracle),
      (cat.TrainPrep.defs, cat.TrainPrep.oracle),
      (cat.Media.defs, cat.Media.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used only for ops DuckDB cannot express). */
  def oracleSql: Map[String, String] =
    catalog.map(_._2).reduce(_ ++ _)
}
