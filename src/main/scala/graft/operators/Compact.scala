package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction (SURVEY.md §2 B114) — the table-maintenance
  * rewrite every long-lived ingest pipeline needs: streaming sinks,
  * per-batch appends, and over-parallel writes leave a table as thousands
  * of KB-sized parquet files, and at 100 TB the scan's task-scheduling and
  * footer-read overhead (one open + footer parse per file) dominates the
  * I/O. `compact` bin-packs the table back to ~`targetBytes` files:
  *
  *  - PLAN from the actual layout: N = ceil(total data bytes / target),
  *    measured through the Hadoop FileSystem API (object-store-safe, the
  *    StreamCurate convention — never java.io.File), hidden/_SUCCESS
  *    entries excluded;
  *  - REWRITE distributed: one read → repartition(N) → write. A
  *    round-robin repartition spreads rows evenly so output files land
  *    near the target regardless of input skew (coalesce would merely
  *    glue neighbors and inherit their imbalance — and can silently
  *    under-parallelize the scan);
  *  - CONTENT-TRANSPARENT: the rewrite must change bytes-on-disk layout
  *    and NOTHING else — the catalog oracle states exactly that (the
  *    bloom-gate result-transparency convention), and CompactSpec pins
  *    the file-count/row-preservation/idempotence contract.
  *
  * Production placement: run against a snapshot/partition not receiving
  * appends (or under the table format's commit protocol); this operator is
  * the rewrite kernel, not the transaction wrapper.
  */
object Compact {

  final case class Stats(filesBefore: Int, bytes: Long, filesAfter: Int)

  /** (data-file count, total data bytes) of a parquet dir — RECURSIVE
    * FS-API listing (a partitioned/nested table's data files live under
    * `key=value/` subdirectories; a top-level-only listing would report
    * (0, 0) and mis-plan N=1), hidden files and commit markers excluded —
    * a file is hidden if ANY path component below the root starts with
    * `_` or `.` (e.g. `_delta_log/x`, `.tmp/part-...`). */
  def layout(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(p).toUri.getPath
    val it = fs.listFiles(p, true)
    var n = 0
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
      val hidden = rel.split('/')
        .exists(c => c.startsWith("_") || c.startsWith("."))
      if (st.isFile && !hidden) { n += 1; bytes += st.getLen }
    }
    (n, bytes)
  }

  /** ceil(bytes/targetBytes), floored at 1 — the planned output file count. */
  def planFiles(bytes: Long, targetBytes: Long): Int = {
    require(targetBytes >= 1, s"targetBytes ($targetBytes) must be >= 1")
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite `srcDir` (parquet) into `dstDir` as ~targetBytes files. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              targetBytes: Long): Stats = {
    val (before, bytes) = layout(spark, srcDir)
    val n = planFiles(bytes, targetBytes)
    spark.read.parquet(srcDir).repartition(n)
      .write.mode("overwrite").parquet(dstDir)
    val (after, _) = layout(spark, dstDir)
    Stats(before, bytes, after)
  }

  /** PARTITION-PRESERVING compaction (SURVEY.md §2 B126) — [[compact]]
    * flattens a hive layout (one global rewrite loses the `key=value/`
    * directories and with them partition pruning); a partitioned table is
    * compacted PER PARTITION: each leaf directory is measured and
    * rewritten independently to its own ~targetBytes plan, and the
    * output carries the identical `key=value/` tree. This matches how
    * table-maintenance services actually run (per-partition jobs —
    * partitions not receiving appends compact while hot ones are left
    * alone) and keeps the unit of work bounded by one partition, never
    * the table. One Spark job per partition; at scale the partitions are
    * submitted concurrently by the maintenance scheduler — the rewrite
    * kernel here is the same either way.
    *
    * @return per-partition stats keyed by the relative partition path */
  def compactPartitioned(spark: SparkSession, srcDir: String,
                         dstDir: String, targetBytes: Long)
      : Map[String, Stats] = {
    val src = new Path(srcDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(src).toUri.getPath
    // leaf partition dirs = parents of data files, discovered recursively
    val it = fs.listFiles(src, true)
    val leaves = scala.collection.mutable.SortedSet.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
      val comps = rel.split('/')
      if (st.isFile && !comps.exists(c => c.startsWith("_") || c.startsWith(".")))
        leaves += comps.dropRight(1).mkString("/")
    }
    require(leaves.forall(_.nonEmpty),
      s"$srcDir holds top-level data files — not a partitioned layout; " +
        "use compact() for flat tables")
    // Per-partition rewrites are independent jobs over disjoint dirs —
    // submit them from a small thread pool so the next partition's tasks
    // back-fill executors freed by the current one's tail (the guide-§2.6
    // overlap pattern; 4 in flight is enough to fill the tail without
    // starving any one job). Spark's scheduler is thread-safe; the result
    // map is rebuilt deterministically from the sorted leaf list.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, math.max(1, leaves.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futs = leaves.toSeq.map { part =>
        part -> scala.concurrent.Future(
          compact(spark, s"$srcDir/$part", s"$dstDir/$part", targetBytes))
      }
      // await EVERY future before surfacing a failure (r17 ADVICE): a
      // fail-fast Await.result would rethrow while sibling rewrites are
      // still writing into dstDir — the caller would observe an exception
      // from a destination that keeps mutating. Ready-all first, then
      // rethrow the first failure (if any) with all writes stopped.
      val done = futs.map { case (part, f) =>
        part -> scala.concurrent.Await.ready(f,
          scala.concurrent.duration.Duration.Inf).value.get
      }
      done.collectFirst { case (_, scala.util.Failure(e)) => throw e }
      done.map { case (part, t) => part -> t.get }.toMap
    } finally pool.shutdown()
  }
}
