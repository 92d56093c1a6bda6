package graft.operators

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DELETION VECTORS (SURVEY.md §2 B137) — row-level deletes without file
  * rewrites, the Delta/Iceberg "merge-on-read position delete" economics
  * over a plain parquet directory. A GDPR/right-to-be-forgotten pass at
  * 100 TB deletes a few million rows scattered across millions of files;
  * rewriting every touched file (copy-on-write) turns a KB-sized logical
  * delete into a corpus-scale write. The merge-on-read form:
  *
  *  - [[mark]] writes the delete as DATA, not a rewrite: one scan joined
  *    against the key set produces (file_path, key) rows — which rows of
  *    which files are dead — persisted under `<dir>/_dv` (leading `_` =
  *    invisible to every data scan). Data files stay byte-identical;
  *    repeated marks union in (idempotent, distinct);
  *  - [[read]] is the merge-on-read scan: data files LEFT-ANTI joined
  *    against the DV on (file_path, key). The DV is deleted-rows-sized ≪
  *    corpus → broadcast anti-join, map-side, no shuffle of the corpus;
  *  - [[materialize]] is the deferred copy-on-write (the table format's
  *    REWRITE/OPTIMIZE step): files CARRYING deletes are rewritten
  *    through the engine minus their dead rows; untouched files move as
  *    FS-level byte copies (an object store serves these as server-side
  *    copies — no read, no decode, no re-encode), and the output carries
  *    no `_dv` — the debt is paid. Write cost ∝ touched files, the same
  *    bound the CDC sink's bucket pruning gives.
  *
  * Keys must be row-unique per table (the fixture's doc_id contract);
  * marking a key deletes it in EVERY file that holds it — the (file_path,
  * key) pairs come from the actual scan, never from an assumption about
  * placement. Production placement: like [[Compact]], this is the rewrite
  * kernel — run it against a snapshot not receiving appends, or under the
  * table format's commit protocol. DeleteVectorsSpec pins the contract:
  * data files byte-identical after mark, merge-on-read ≡ the anti-join
  * oracle, materialize touches only delete-carrying files and reads back
  * identically. */
object DeleteVectors {

  val DvDir = "_dv"

  final case class MarkStats(filesTotal: Int, filesWithDeletes: Int,
                             rowsMarked: Long)
  final case class MaterializeStats(filesRewritten: Int, filesCopied: Int)

  private def dvPath(dir: String) = s"$dir/$DvDir"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hasDv(spark: SparkSession, dir: String): Boolean =
    fsOf(spark, new Path(dvPath(dir))).exists(new Path(dvPath(dir)))

  /** Record `keys` (a one-column frame of `keyCol` values) as deleted.
    * Pure metadata write: no data file changes. */
  def mark(spark: SparkSession, dir: String, keys: DataFrame,
           keyCol: String): MarkStats = {
    val k = keys.select(col(keys.columns.head).cast("long").as("k")).distinct()
    val fresh = spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file_path"),
        col(keyCol).cast("long").as("k"))
      .join(broadcast(k), Seq("k"))
      .select(col("file_path"), col("k"))
    val merged =
      if (!hasDv(spark, dir)) fresh
      else fresh.unionByName(spark.read.parquet(dvPath(dir))).distinct()
    // the DV must be readable while being replaced — stage then swap
    // (single-writer maintenance op, the Compact placement rule)
    val tmp = dvPath(dir) + "_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = fsOf(spark, new Path(dir))
    fs.delete(new Path(dvPath(dir)), true)
    require(fs.rename(new Path(tmp), new Path(dvPath(dir))),
      s"could not commit deletion vector under $dir")
    val dv = spark.read.parquet(dvPath(dir))
    val nFiles = dv.select(col("file_path")).distinct().count().toInt
    val total = spark.read.parquet(dir)
      .select(col("_metadata.file_path")).distinct().count().toInt
    MarkStats(total, nFiles, dv.count())
  }

  /** Merge-on-read scan: the table minus every marked row. Without a DV
    * this is the plain scan. Internal join columns ride `_dv_`-prefixed
    * names so a table whose own columns are named `k`/`file_path` never
    * collides. */
  def read(spark: SparkSession, dir: String, keyCol: String): DataFrame = {
    val data = spark.read.parquet(dir)
    if (!hasDv(spark, dir)) data
    else {
      val dv = spark.read.parquet(dvPath(dir))
        .select(col("file_path").as("_dv_fp"), col("k").as("_dv_k"))
      data.withColumn("_dv_fp", col("_metadata.file_path"))
        .withColumn("_dv_k", col(keyCol).cast("long"))
        .join(broadcast(dv), Seq("_dv_fp", "_dv_k"), "left_anti")
        .drop("_dv_fp", "_dv_k")
    }
  }

  /** Pay the debt: rewrite delete-carrying files minus their dead rows,
    * byte-copy the rest, emit a DV-free table at `dstDir`. */
  def materialize(spark: SparkSession, srcDir: String,
                  dstDir: String, keyCol: String): MaterializeStats = {
    require(hasDv(spark, srcDir),
      s"no deletion vector under $srcDir — nothing to materialize")
    val fs = fsOf(spark, new Path(srcDir))
    val dv = spark.read.parquet(dvPath(srcDir))
    val touched = dv.select(col("file_path")).distinct()
      .collect().map(_.getString(0)).toSet // ≤ files, driver-sized
    val dst = new Path(dstDir)
    fs.delete(dst, true)
    fs.mkdirs(dst)
    // untouched files: FS byte copies under their own names
    val root = fs.makeQualified(new Path(srcDir)).toUri.getPath
    val it = fs.listFiles(new Path(srcDir), true)
    var copied = 0
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
      val hidden = rel.split('/')
        .exists(c => c.startsWith("_") || c.startsWith("."))
      if (st.isFile && !hidden && !touched.contains(st.getPath.toString)) {
        FileUtil.copy(fs, st.getPath, fs, new Path(dst, st.getPath.getName),
          false, spark.sparkContext.hadoopConfiguration)
        copied += 1
      }
    }
    // touched files: one engine pass over ONLY those files, dead rows
    // anti-joined out, one output file per input file's worth of data
    if (touched.nonEmpty) {
      val dvk = dv.select(col("file_path").as("_dv_fp"), col("k").as("_dv_k"))
      spark.read.parquet(touched.toSeq.sorted: _*)
        .withColumn("_dv_fp", col("_metadata.file_path"))
        .withColumn("_dv_k", col(keyCol).cast("long"))
        .join(broadcast(dvk), Seq("_dv_fp", "_dv_k"), "left_anti")
        .drop("_dv_fp", "_dv_k")
        .repartition(touched.size)
        .write.mode("append").parquet(dstDir)
    }
    MaterializeStats(touched.size, copied)
  }
}
