package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering.
  *
  * Interleaves the bits of two integer keys so that sorting by the combined
  * z-value places rows close in BOTH dimensions into the same files and
  * parquet row groups — after which a scan filtered on either (or both)
  * keys discharges most row groups from footer min/max stats alone. This is
  * the layout recipe for the case q_partition_prune (directory pruning, one
  * low-cardinality key) and q_sorted_scan (sort, one range key) can't
  * cover: selective filters on TWO high-cardinality columns.
  *
  * The interleave is pure bit arithmetic on codegen'd built-ins (shiftleft /
  * bitwise and/or) — no UDF, stays inside whole-stage codegen.
  */
object ZOrder {
  /** Spread the low 16 bits of `c` to the even bit positions (0,2,4,…,30)
    * via the standard mask-shift cascade. */
  private def spread(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two non-negative keys, 16 bits each (callers with wider
    * keys pre-bucket, e.g. `pmod(k, 65536)` — z-order needs locality, not
    * injectivity, so bucketing wide keys is safe). */
  def interleave2(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Rewrite `df` into `numFiles` files clustered by the z-value of the two
    * keys: range-partition on z (equi-depth file boundaries even under key
    * skew), sort inside each file (tight row-group stats), drop the helper
    * column. One shuffle — the same cost as any layout rewrite. */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val withZ = df.withColumn("__z", interleave2(x, y))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
