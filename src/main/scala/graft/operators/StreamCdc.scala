package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING CDC apply (SURVEY.md §2 B134; r15 verdict #4) — the B55
  * q_cdc_apply latest-wins fold composed with the exactly-once
  * foreachBatch state discipline: I/U/D changelog micro-batches fold into
  * a VERSIONED SNAPSHOT, the MERGE-INTO dataflow a Delta/Iceberg CDC sink
  * runs, without a table format.
  *
  * Snapshot contract (one parquet dir per applied batch, `v<batchId>`):
  *  - one row per key ever seen: (k, seq, op, price_cents) — the
  *    LATEST-BY-SEQ change for that key, INCLUDING deletes ('D' rows are
  *    tombstones, kept in the snapshot so a later higher-seq 'U' can
  *    resurrect the key and a lower-seq late event can never — the CDC
  *    ordering rule the batch entry pins);
  *  - [[applyBatch]] folds a batch in as: within-batch latest-wins
  *    (max_by over seq — ONE aggregate, partial+final, the q_cdc_apply
  *    shape) full-outer-merged against the PREVIOUS version by seq
  *    comparison (delta wins ties: a retry of the same logical change is
  *    not older than itself);
  *  - exactly-once under at-least-once foreachBatch retries, the
  *    [[StreamCurate]] theorem: the merge reads only versions with id
  *    STRICTLY BELOW the current batchId (a retry must not see its own
  *    failed attempt) and the write is mode-OVERWRITE to `v<batchId>` —
  *    replaying any (batch, batchId) rewrites byte-identical state.
  *    StreamCdcSpec pins it.
  *
  * Versioned commits give batch-granular time travel for free:
  * [[readVersion]] is the VERSION-AS-OF read (the B132 convention);
  * production would age out old versions the way [[StreamCurate.compact]]
  * folds batch dirs — versions are self-contained snapshots here, so
  * aging is a plain delete, no fold needed.
  *
  * Scale posture (100 TB): per batch, one key-shuffle aggregate over the
  * BATCH + one full-outer join against the snapshot — O(batch + keys),
  * the q_stream_upsert economics; nothing rescans the changelog history.
  * All listing goes through the Hadoop FileSystem API (works on
  * HDFS/object stores, not only the local FS — the r12 StreamCurate
  * lesson). */
object StreamCdc {

  private def fsOf(ss: SparkSession, p: Path): FileSystem =
    p.getFileSystem(ss.sessionState.newHadoopConf())

  /** Version dirs (id, path) under `root`, ascending. */
  private def versions(ss: SparkSession, root: Path): Seq[(Long, Path)] = {
    val fs = fsOf(ss, root)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("v"))
      .flatMap(p => p.getName.drop(1).toLongOption.map(_ -> p))
      .sortBy(_._1)
  }

  /** Fold one changelog micro-batch (k, seq, op, price_cents) into the
    * snapshot at `root` as version `batchId`. Retry-safe: see object doc. */
  def applyBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val ss = batch.sparkSession
    val delta = batch.groupBy(col("k"))
      .agg(max(col("seq")).as("seq"),
        max_by(struct(col("op"), col("price_cents")), col("seq")).as("last"))
      .select(col("k"), col("seq"), col("last.op").as("op"),
        col("last.price_cents").as("price_cents"))
    // strictly-below read: a retried batch merges against the same
    // predecessor its first attempt saw, never its own partial output
    val prev = versions(ss, new Path(root)).filter(_._1 < batchId)
      .lastOption.map { case (_, p) => ss.read.parquet(p.toString) }
    val merged = prev match {
      case None => delta
      case Some(p0) =>
        val p = p0.select(col("k"), col("seq").as("pseq"),
          col("op").as("pop"), col("price_cents").as("ppc"))
        p.join(delta, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("seq").isNotNull &&
                (col("pseq").isNull || col("seq") >= col("pseq")),
              struct(col("seq"), col("op"), col("price_cents")))
              .otherwise(struct(col("pseq").as("seq"), col("pop").as("op"),
                col("ppc").as("price_cents"))).as("w"))
          .select(col("k"), col("w.seq").as("seq"), col("w.op").as("op"),
            col("w.price_cents").as("price_cents"))
    }
    merged.write.mode("overwrite").parquet(s"$root/v$batchId")
  }

  /** The live table at version `id` — tombstones dropped (the VERSION-AS-OF
    * read). */
  def readVersion(ss: SparkSession, root: String, id: Long): DataFrame =
    ss.read.parquet(s"$root/v$id")
      .filter(col("op") =!= "D")
      .select(col("k"), col("op"), col("price_cents"))

  /** The newest live table. Fails loudly on an empty root — a CDC sink
    * with no committed version is an error, not an empty table. */
  def readLatest(ss: SparkSession, root: String): DataFrame = {
    val vs = versions(ss, new Path(root))
    require(vs.nonEmpty, s"no committed CDC snapshot versions under $root")
    readVersion(ss, root, vs.last._1)
  }
}
