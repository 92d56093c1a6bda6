package graft.operators

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** B137 deletion vectors: the file-level claims the content-transparent
  * catalog oracle can't see — data files byte-identical after a mark
  * (delete-as-metadata), merge-on-read equals the anti-join, marks merge
  * idempotently, and materialize rewrites ONLY delete-carrying files
  * while byte-copying the rest. */
class DeleteVectorsSpec extends SparkSpecBase {

  private def write(dir: String, n: Long, files: Int): Unit =
    spark.range(n)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("s"))
      .repartition(files)
      .write.mode("overwrite").parquet(dir)

  private def keys(ks: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ks.toDF("k")
  }

  /** name → md5 of every visible data file. */
  private def fileHashes(dir: String): Map[String, String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map { f =>
        val md = MessageDigest.getInstance("MD5")
        f.getName -> md.digest(Files.readAllBytes(Paths.get(f.getPath)))
          .map("%02x".format(_)).mkString
      }.toMap

  test("mark is metadata-only: every data file byte-identical, merge-on-read equals the anti-join") {
    val dir = scratch("dv_mark")
    write(dir, 8000L, files = 8)
    val before = fileHashes(dir)
    val st = DeleteVectors.mark(spark, dir, keys((0L until 8000L by 13).toSeq), "k")
    assert(fileHashes(dir) === before, "mark rewrote a data file")
    assert(st.filesTotal === 8 && st.rowsMarked === (0L until 8000L by 13).size.toLong)
    assert(st.filesWithDeletes >= 1 && st.filesWithDeletes <= 8)
    val got = DeleteVectors.read(spark, dir, "k")
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 8000L).filterNot(_ % 13 == 0))
  }

  test("marks merge and are idempotent: re-marking adds nothing, a second set unions in") {
    val dir = scratch("dv_merge")
    write(dir, 1000L, files = 4)
    val st1 = DeleteVectors.mark(spark, dir, keys(Seq(1L, 2L, 3L)), "k")
    val st2 = DeleteVectors.mark(spark, dir, keys(Seq(2L, 3L)), "k") // subset: no-op
    assert(st1.rowsMarked === 3L && st2.rowsMarked === 3L)
    val st3 = DeleteVectors.mark(spark, dir, keys(Seq(10L, 11L)), "k")
    assert(st3.rowsMarked === 5L)
    assert(DeleteVectors.read(spark, dir, "k").count() === 995L)
    // keys absent from the table mark nothing
    val st4 = DeleteVectors.mark(spark, dir, keys(Seq(999999L)), "k")
    assert(st4.rowsMarked === 5L)
  }

  test("materialize rewrites only delete-carrying files, byte-copies the rest, drops the DV") {
    val dir = scratch("dv_src")
    val mat = scratch("dv_mat")
    write(dir, 8000L, files = 8)
    // delete a contiguous id block: round-robin files each hold some of it,
    // so probe which files actually carry deletes via the DV itself
    DeleteVectors.mark(spark, dir, keys((100L until 120L).toSeq), "k")
    val dv = spark.read.parquet(s"$dir/_dv")
    val touched = dv.select(col("file_path")).distinct().count().toInt
    val st = DeleteVectors.materialize(spark, dir, mat, "k")
    assert(st.filesRewritten === touched, s"$st vs dv-touched $touched")
    assert(st.filesRewritten + st.filesCopied === 8)
    // untouched source files appear in the output byte-identical
    val srcHashes = fileHashes(dir)
    val matHashes = fileHashes(mat)
    val copiedNames = srcHashes.keySet.intersect(matHashes.keySet)
    assert(copiedNames.size === st.filesCopied)
    copiedNames.foreach(n => assert(srcHashes(n) === matHashes(n),
      s"byte-copied file $n changed"))
    // the debt is paid: no _dv in the output, plain scan reads the survivors
    assert(!new java.io.File(s"$mat/_dv").exists())
    val got = spark.read.parquet(mat)
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 8000L).filterNot(k => k >= 100L && k < 120L))
    // and equals the merge-on-read view of the source
    val mor = DeleteVectors.read(spark, dir, "k")
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got === mor)
  }

  test("no DV: read degrades to the plain scan; materialize refuses loudly") {
    val dir = scratch("dv_none")
    write(dir, 100L, files = 2)
    assert(DeleteVectors.read(spark, dir, "k").count() === 100L)
    val e = intercept[IllegalArgumentException] {
      DeleteVectors.materialize(spark, dir, scratch("dv_none_mat"), "k")
    }
    assert(e.getMessage.contains("nothing to materialize"), e.getMessage)
  }
}
