package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** B114 compaction: the layout contract the content-transparent oracle
  * can't see — planned file counts, actual post-compaction layout,
  * row/payload preservation, idempotence, and the plan arithmetic.
  */
class CompactSpec extends SparkSpecBase {

  private def write(dir: String, parts: Int, rows: Int): Unit =
    spark.range(rows.toLong)
      .select(col("id"), concat(lit("payload-"), col("id")).as(("s")))
      .repartition(parts)
      .write.mode("overwrite").parquet(dir)

  test("plan arithmetic: ceil(bytes/target), floored at 1") {
    assert(Compact.planFiles(0L, 100L) === 1)
    assert(Compact.planFiles(1L, 100L) === 1)
    assert(Compact.planFiles(100L, 100L) === 1)
    assert(Compact.planFiles(101L, 100L) === 2)
    assert(Compact.planFiles(1000L, 100L) === 10)
  }

  test("fragmented table compacts to the planned count; content preserved byte-for-byte") {
    val frag = scratch("compact_frag")
    val out = scratch("compact_out")
    write(frag, parts = 40, rows = 20000)
    val (before, bytes) = Compact.layout(spark, frag)
    assert(before === 40, s"fixture should be 40 files, got $before")
    val target = bytes / 4 // plan ~4 output files from the real byte total
    val st = Compact.compact(spark, frag, out, target)
    assert(st.filesBefore === 40 && st.bytes === bytes)
    assert(st.filesAfter === Compact.planFiles(bytes, target),
      s"layout ${st.filesAfter} vs plan")
    assert(st.filesAfter < before, "compaction must reduce the file count")
    // content: identical row multiset, payload included
    val a = spark.read.parquet(frag).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val b = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.length === 20000 && java.util.Arrays.deepEquals(
      a.map(x => x: AnyRef), b.map(x => x: AnyRef)))
  }

  test("partitioned compaction preserves the hive tree, plans per leaf, refuses flat tables") {
    // B126: per-partition plans from per-partition bytes, the key=value
    // tree survives, content is identical through the partitioned read,
    // re-compaction is a layout no-op, and a flat table is refused loudly.
    val frag = scratch("compactp_frag")
    val out = scratch("compactp_out")
    spark.range(30000L)
      .select(col("id"), (col("id") % 3).as("k"),
        concat(lit("payload-"), col("id")).as("s"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("k").parquet(frag)
    val stats = Compact.compactPartitioned(spark, frag, out, targetBytes = 64 * 1024)
    assert(stats.keySet === Set("k=0", "k=1", "k=2"), s"leaves: ${stats.keySet}")
    stats.foreach { case (part, st) =>
      assert(st.filesBefore === 8, s"$part expected 8 fragments")
      assert(st.filesAfter === Compact.planFiles(st.bytes, 64 * 1024),
        s"$part landed off-plan: $st")
    }
    // layout: key=value dirs exist in the output
    val outDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(outDirs === Set("k=0", "k=1", "k=2"), s"hive tree lost: $outDirs")
    // content identical through the partitioned read (k comes back as a
    // partition-inferred column — cast pins the comparison type)
    def rows(dir: String) = spark.read.parquet(dir)
      .select(col("id"), col("k").cast("long").as("k"), col("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val a = rows(frag)
    val b = rows(out)
    assert(a === b, "partitioned compaction changed content")
    // idempotence
    val again = Compact.compactPartitioned(spark, out,
      scratch("compactp_out2"), targetBytes = 64 * 1024)
    assert(again.map { case (p, st) => p -> st.filesAfter } ===
      stats.map { case (p, st) => p -> st.filesAfter },
      "re-compaction changed the per-partition layout")
    // a flat table is refused (use compact() instead)
    val flat = scratch("compactp_flat")
    write(flat, parts = 4, rows = 100)
    val e = intercept[IllegalArgumentException] {
      Compact.compactPartitioned(spark, flat, scratch("compactp_flatout"), 1024)
    }
    assert(e.getMessage.contains("partitioned"))
  }

  test("idempotence: compacting the compacted table is a layout no-op") {
    val frag = scratch("compact_idem_in")
    val out1 = scratch("compact_idem_1")
    val out2 = scratch("compact_idem_2")
    write(frag, parts = 16, rows = 5000)
    val (_, bytes) = Compact.layout(spark, frag)
    val st1 = Compact.compact(spark, frag, out1, bytes / 2)
    val st2 = Compact.compact(spark, out1, out2, bytes / 2)
    assert(st1.filesAfter === st2.filesAfter,
      "re-compacting at the same target must not change the file count")
  }

  test("output files land near the target size (round-robin balance)") {
    val frag = scratch("compact_sz_in")
    val out = scratch("compact_sz_out")
    write(frag, parts = 32, rows = 40000)
    val (_, bytes) = Compact.layout(spark, frag)
    val target = bytes / 5
    Compact.compact(spark, frag, out, target)
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_")).map(_.getLen)
    // parquet recompression moves totals; assert balance, not exact size:
    // every file within 3x of the mean
    val mean = sizes.sum / sizes.length
    sizes.foreach(sz => assert(sz < 3 * mean && sz > mean / 3,
      s"file size $sz far from mean $mean — packing is skewed"))
  }
}
