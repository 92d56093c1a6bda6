package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{UserDefinedFunction, Window}
import org.apache.spark.sql.functions._

/** The per-micro-batch curation body shared by q_stream_curate and
  * q_stream_curate_scored (SURVEY.md §2 B81/B89), factored out so the two
  * entries cannot drift AND so the batch body is replayable in a spec.
  *
  * Exactly-once discipline (r12): Structured Streaming's `foreachBatch`
  * contract is AT-LEAST-ONCE delivery of (batch, batchId) — after a
  * mid-batch crash the same batchId is retried, and the r11 form's
  * unconditional parquet APPENDS would double-count the retried batch in
  * both the curated corpus and the dedup index. The standard recipe (the
  * one the foreachBatch docs prescribe) is batchId-KEYED idempotent
  * writes, implemented here as:
  *
  *  - every write lands in `<root>/b<batchId>` with mode OVERWRITE — a
  *    retry rewrites the same directory with the same rows;
  *  - every STATE READ takes only subdirs with batchId STRICTLY BELOW the
  *    current one ([[readStateBefore]]) — a retry must not see its own
  *    failed attempt's partial output, or the bloom gate would classify
  *    the whole batch as historical dups and overwrite the directory with
  *    an empty delta.
  *
  * Together: replaying (batch, batchId) any number of times, at any point
  * before batchId+1 commits, reproduces byte-identical state —
  * StreamCurateSpec drives the body manually and pins it. Normal
  * (no-retry) execution reads exactly what the r11 append form read, so
  * the full-feed DuckDB oracles are unchanged.
  */
object StreamCurate {

  private def batchDirs(root: File, ltBatch: Long): Seq[String] =
    Option(root.listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .filter(_.getName.drop(1).toLongOption.exists(_ < ltBatch))
      .sortBy(_.getName)
      .map(_.getPath)

  /** Accumulated state from batches strictly below `batchId`. */
  def readStateBefore(ss: SparkSession, root: File,
                      batchId: Long): Option[DataFrame] = {
    val parts = batchDirs(root, batchId)
    if (parts.isEmpty) None else Some(ss.read.parquet(parts: _*))
  }

  /** All committed batch state (the entry's final read-back). */
  def readAll(ss: SparkSession, root: File): DataFrame =
    ss.read.parquet(batchDirs(root, Long.MaxValue): _*)

  /** One curation micro-batch: within-batch exact dedup → bloom-gated
    * exact dedup vs the index → incremental near-dup vs the signature
    * corpus → (optionally) the frozen-model quality gate on the curated
    * sink only. `score` = None for B81; Some((scoreUdf, cutoffs with
    * (source, p75_micro))) for B89 — score-rejected docs still enter the
    * history index, keeping dedup pairwise. */
  def curateBatch(batch: DataFrame, batchId: Long, histRoot: File,
                  curRoot: File,
                  score: Option[(UserDefinedFunction, DataFrame)]): Unit = {
    val ss = batch.sparkSession
    val withSha = batch.withColumn("sha", sha2(col("text"), 256))
    val w = Window.partitionBy(col("sha")).orderBy(col("doc_id"))
    val batchUniq = withSha.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val hist = readStateBefore(ss, histRoot, batchId)
    val exactNew = hist match {
      case None => batchUniq
      case Some(h) => ExactDedup
        .bloomGatedNew(h.select(col("sha")), batchUniq)
        .drop("probe_hit")
    }
    val delta = exactNew.persist()
    try {
      val histDocs = hist match {
        case None => delta.select(col("doc_id"), col("text")).filter(lit(false))
        case Some(h) => h.select(col("doc_id"), col("text"))
      }
      val pairs = NearDup.minhashPairsIncremental(
        histDocs, delta.select(col("doc_id"), col("text")))
      // the later arrival of each confirmed pair is dropped: a delta
      // doc_b always (same batch, larger id, or newer batch than a
      // history doc_a); a delta doc_a only when doc_b is history
      val ids = delta.select(col("doc_id").as("doc_b"), lit(true).as("bn"))
      val dropped = pairs.join(ids, Seq("doc_b"), "left")
        .select(when(coalesce(col("bn"), lit(false)), col("doc_b"))
          .otherwise(col("doc_a")).as("doc_id"))
        .distinct()
      val accepted = delta.join(dropped, Seq("doc_id"), "left_anti")
      val out = score match {
        case None => accepted.select(col("doc_id"), col("source"), col("sha"))
        case Some((su, cut)) => accepted
          .withColumn("logit_micro", su(col("text")))
          .join(broadcast(cut), Seq("source"))
          .filter(col("logit_micro") >= col("p75_micro"))
          .select(col("doc_id"), col("source"), col("sha"),
            col("logit_micro"))
      }
      out.write.mode("overwrite")
        .parquet(new File(curRoot, s"b$batchId").getPath)
      // EVERY exact-new doc enters the history index, scored or not
      delta.select(col("doc_id"), col("text"), col("sha"))
        .write.mode("overwrite")
        .parquet(new File(histRoot, s"b$batchId").getPath)
    } finally { delta.unpersist(); () }
  }
}
