package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL zone-map data skipping (SURVEY.md §2 B136) — the explicit
  * min/max statistics index a table format keeps in its metadata layer
  * (Iceberg manifest `lower_bounds`/`upper_bounds`, Delta `stats.minValues`),
  * built here over a plain parquet directory. It is the layer ABOVE the
  * parquet-native pruning the catalog already exercises: q_sorted_scan /
  * q_zorder_prune prune ROW GROUPS from footers the scan still has to OPEN
  * (one open + footer parse per file — at 100 TB that is millions of
  * round-trips before a byte of data moves); a zone map answers "which
  * files can match" from an O(files) stats table WITHOUT touching the data
  * files, so a selective range scan schedules tasks for only the matching
  * files.
  *
  *  - [[build]] is one distributed pass: group by `_metadata.file_path`,
  *    min/max/count of the key — the same scan ANALYZE/OPTIMIZE pays —
  *    written under `<dir>/_zonemap` (leading `_` = invisible to every
  *    data scan, the `_dv`/`_SUCCESS` convention);
  *  - [[read]] plans from the stats table: files whose [min,max] intersects
  *    [lo,hi] are read, everything else is never opened; the residual
  *    range filter is STILL applied (pruning is an optimization, never the
  *    correctness argument — the catalog oracle is the plain filtered
  *    table);
  *  - STALENESS is loud, not silent: the stats row set must exactly match
  *    the current FS listing of data files — a rewrite/append after
  *    `build` fails the read with "stale zone map, rebuild" instead of
  *    silently dropping the new files' rows (the manifest-commit
  *    discipline a real metadata layer gets transactionally);
  *  - the key must be integral (LongType semantics) — exact-integer
  *    min/max compare cross-engine, no float-boundary ambiguity.
  *
  * Scale posture: the stats table is O(files) rows (100 TB at 256 MB files
  * = ~400k rows — a driver/broadcast-sized plan input, the same order a
  * table format's manifest scan handles); `read`'s data cost is
  * O(matching files). Effectiveness tracks layout: range-clustered files
  * (repartitionByRange writes, B126 partitions, Z-order) prune sharply,
  * unclustered layouts degrade to a full scan with the SAME answer —
  * ZoneMapSpec measures both. */
object ZoneMap {

  val StatsDir = "_zonemap"

  /** Plan-time pruning outcome: how many files the stats table lists, how
    * many intersect the requested range (= get opened at all). */
  final case class Pruning(filesTotal: Int, filesRead: Int)

  private def statsPath(dir: String) = s"$dir/$StatsDir"

  /** One pass over the table: per-file (path, n_rows, min/max per key)
    * written to `<dir>/_zonemap`. Multi-key stats are what make the index
    * compose with Z-ORDER (B58): a z-clustered layout keeps every file
    * tight in BOTH dimensions, so a two-range predicate prunes on the
    * conjunction — the multi-dimensional file skipping a single sort key
    * can't give. Rebuild after any layout change — [[read]] enforces
    * freshness loudly. */
  def build(spark: SparkSession, dir: String, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "zone map needs at least one key column")
    val df = spark.read.parquet(dir)
    keyCols.foreach { k =>
      val kt = df.schema(k).dataType.typeName
      require(Set("long", "integer", "short", "byte").contains(kt),
        s"zone-map key $k must be integral, got $kt")
    }
    val aggs = keyCols.flatMap(k => Seq(
      min(col(k)).cast("long").as(s"min_$k"),
      max(col(k)).cast("long").as(s"max_$k"))) :+
      count(lit(1)).as("n_rows")
    df.groupBy(col("_metadata.file_path").as("file_path"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // O(files) rows — one stats file, not one per reducer
      .write.mode("overwrite").parquet(statsPath(dir))
  }

  /** Single-key [[build]]. */
  def build(spark: SparkSession, dir: String, keyCol: String): Unit =
    build(spark, dir, Seq(keyCol))

  /** What [[update]] did: files newly scanned, stats rows dropped for
    * vanished files, rows carried over verbatim. */
  final case class UpdateStats(filesScanned: Int, filesDropped: Int,
                               filesKept: Int)

  /** INCREMENTAL stats maintenance — the append-heavy production path: a
    * daily-ingest table gains a handful of files per commit, and
    * rebuilding the index with a full table rescan per commit is O(table)
    * work for O(delta) change. `update` scans ONLY files absent from the
    * stats table, drops rows for files that vanished (compaction,
    * vacuum), and carries every other row over verbatim — O(changed
    * files) I/O, and the result is exactly what [[build]] would produce
    * on the current layout (ZoneMapSpec pins the equivalence). This is
    * the discipline a table format gets transactionally (per-commit stats
    * in the manifest); here the single-writer maintenance placement rule
    * applies, like [[DeleteVectors.mark]]. */
  def update(spark: SparkSession, dir: String,
             keyCols: Seq[String]): UpdateStats = {
    val sp = statsPath(dir)
    val fs = new Path(sp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(sp)),
      s"no zone map under $dir — run ZoneMap.build first")
    val old = spark.read.parquet(sp)
    val expectCols = keyCols.flatMap(k => Seq(s"min_$k", s"max_$k"))
    require(expectCols.forall(old.columns.contains),
      s"existing zone map covers ${old.columns.mkString(",")} — " +
        s"update asked for keys $keyCols; rebuild to change the key set")
    val live = dataFiles(spark, dir)
    val oldPaths = old.select(col("file_path")).collect()
      .map(_.getString(0)).toSet
    val newPaths = (live -- oldPaths).toSeq.sorted
    // semi-join, not a giant isin literal list — the live set is O(files)
    // rows and at production file counts an expression with 400k string
    // literals is itself the bottleneck
    import spark.implicits._
    val liveDf = live.toSeq.toDF("file_path")
    val kept = old.join(broadcast(liveDf), Seq("file_path"), "left_semi")
    val aggs = keyCols.flatMap(k => Seq(
      min(col(k)).cast("long").as(s"min_$k"),
      max(col(k)).cast("long").as(s"max_$k"))) :+
      count(lit(1)).as("n_rows")
    val merged =
      if (newPaths.isEmpty) kept
      else kept.unionByName(
        spark.read.parquet(newPaths: _*)
          .groupBy(col("_metadata.file_path").as("file_path"))
          .agg(aggs.head, aggs.tail: _*)
          .select(old.columns.map(col).toSeq: _*))
    // stage-then-swap: the old stats stay readable until the new set is
    // fully written (the DeleteVectors.mark commit shape)
    val tmp = sp + "_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(sp), true)
    require(fs.rename(new Path(tmp), new Path(sp)),
      s"could not commit updated zone map under $dir")
    UpdateStats(newPaths.size, (oldPaths -- live).size,
      (oldPaths intersect live).size)
  }

  /** The current data files of `dir` (recursive, hidden pruned) as the
    * same fully-qualified URIs `_metadata.file_path` reports. */
  private def dataFiles(spark: SparkSession, dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(p).toUri.getPath
    val it = fs.listFiles(p, true)
    val out = Set.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
      val hidden = rel.split('/')
        .exists(c => c.startsWith("_") || c.startsWith("."))
      // Path.toString matches `_metadata.file_path`'s rendering exactly
      // (probed: both print `scheme:/path`, never `scheme:///path`)
      if (st.isFile && !hidden) out += st.getPath.toString
    }
    out.result()
  }

  /** The stats table, freshness-checked against the live layout. */
  private def freshStats(spark: SparkSession, dir: String): DataFrame = {
    val sp = statsPath(dir)
    val fs = new Path(sp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(sp)),
      s"no zone map under $dir — run ZoneMap.build first")
    val stats = spark.read.parquet(sp)
    val indexed = stats.select(col("file_path")).collect()
      .map(_.getString(0)).toSet
    val live = dataFiles(spark, dir)
    require(indexed == live,
      s"stale zone map under $dir: stats cover ${indexed.size} files, " +
        s"layout has ${live.size} — rebuild after any rewrite/append " +
        "(a silent mismatch would drop or double-count rows)")
    stats
  }

  /** The file paths a conjunctive multi-range scan must open, plus the
    * total: a file survives only if its [min,max] intersects EVERY
    * requested range. */
  def prune(spark: SparkSession, dir: String,
            ranges: Seq[(String, Long, Long)]): (Seq[String], Pruning) = {
    require(ranges.nonEmpty, "prune needs at least one range")
    val stats = freshStats(spark, dir)
    val total = stats.count().toInt
    val pred = ranges.map { case (k, lo, hi) =>
      col(s"max_$k") >= lo && col(s"min_$k") <= hi
    }.reduce(_ && _)
    val hit = stats.filter(pred)
      .select(col("file_path")).collect().map(_.getString(0)).toSeq.sorted
    (hit, Pruning(total, hit.size))
  }

  /** Range scan through the zone map: only files intersecting every range
    * are opened, the residual filter still runs. Returns (rows, pruning
    * stats). */
  def read(spark: SparkSession, dir: String,
           ranges: Seq[(String, Long, Long)]): (DataFrame, Pruning) = {
    ranges.foreach { case (k, lo, hi) =>
      require(lo <= hi, s"empty range [$lo, $hi] on $k")
    }
    val (paths, stats) = prune(spark, dir, ranges)
    val residual = ranges.map { case (k, lo, hi) =>
      col(k) >= lo && col(k) <= hi
    }.reduce(_ && _)
    val df =
      if (paths.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(paths: _*).filter(residual)
    (df, stats)
  }

  /** Single-key [[read]]. */
  def read(spark: SparkSession, dir: String, keyCol: String,
           lo: Long, hi: Long): (DataFrame, Pruning) =
    read(spark, dir, Seq((keyCol, lo, hi)))
}
