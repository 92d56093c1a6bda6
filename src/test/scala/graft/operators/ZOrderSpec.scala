package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Z-order clustering: interleave correctness and the property the layout
  * exists for — a two-dimension filter touches FEWER files than under a
  * single-key sort, because z-locality keeps every file tight in BOTH
  * dimensions. Measured on a deterministic 64×64 grid, not asserted from
  * folklore.
  */
class ZOrderSpec extends SparkSpecBase {
  import org.apache.spark.sql.DataFrame

  test("interleave2 computes the Morton code (bit-exact on samples)") {
    def morton(x: Int, y: Int): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((x.toLong >> i & 1L) << (2 * i)) | ((y.toLong >> i & 1L) << (2 * i + 1))
      }
    val samples = Seq((0, 0), (1, 0), (0, 1), (3, 5), (255, 17), (65535, 65535))
    val df = spark.createDataFrame(samples).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave2(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === morton(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)},${r.getInt(1)})")
    }
  }

  /** Files whose [min,max] footer range of BOTH keys overlaps the query box
    * — the files a stats-pruning scan must open. */
  private def filesTouched(dir: String): Long = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))
    stats.filter(col("xmax") >= 8 && col("xmin") <= 15 &&
      col("ymax") >= 40 && col("ymin") <= 47).count()
  }

  test("two-dim box scan touches fewer files than a single-key sort layout") {
    // 64×64 full grid (4096 rows), query box 8×8 = 1/64 of the space.
    val grid = spark.range(4096).select(
      (col("id") % 64).cast("int").as("x"), (col("id") / 64).cast("int").as("y"))
    val zDir = scratch("zorder-z")
    ZOrder.cluster(grid, col("x"), col("y"), numFiles = 16)
      .write.mode("overwrite").parquet(zDir)
    val sortDir = scratch("zorder-sort")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(sortDir)

    val zTouched = filesTouched(zDir)
    val sortTouched = filesTouched(sortDir)
    // x-sort puts every y into every file: the y-filter prunes nothing, and
    // an 8-wide x-slice of 64 lands in ~2/16 files. Z-order bounds both
    // dims, so the 8×8 box sits in a handful of z-runs.
    assert(zTouched < 16, s"z-order layout must prune ($zTouched/16 touched)")
    assert(zTouched <= sortTouched,
      s"z-order ($zTouched) must touch no more files than x-sort ($sortTouched)")
    // And the layout never changes results:
    def boxSum(dir: String): Long = spark.read.parquet(dir)
      .filter(col("x").between(8, 15) && col("y").between(40, 47))
      .agg(sum(col("x") * lit(64) + col("y"))).head().getLong(0)
    val expected = grid
      .filter(col("x").between(8, 15) && col("y").between(40, 47))
      .agg(sum(col("x") * lit(64) + col("y"))).head().getLong(0)
    assert(boxSum(zDir) === expected && boxSum(sortDir) === expected)
  }

  test("cluster drops the helper column and preserves row count") {
    val grid: DataFrame = spark.range(100).select(
      (col("id") % 10).cast("int").as("x"), (col("id") / 10).cast("int").as("y"))
    val out = ZOrder.cluster(grid, col("x"), col("y"), numFiles = 4)
    assert(out.columns.toSeq === Seq("x", "y"))
    assert(out.count() === 100)
  }
}
