package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running total over a total order WITHOUT the single-partition
  * window (SURVEY.md §2 B83) — the missing piece for corpus-wide
  * prefix-sum decisions (token-budget fills, curriculum cutoffs, global
  * ranks) at 100 TB.
  *
  * `sum(x) OVER (ORDER BY k)` with no PARTITION BY collapses the whole
  * dataset into ONE task (Spark even logs the WindowExec warning): the
  * textbook plan that works in a demo and dies at scale. The scalable
  * form is the classic two-pass:
  *
  *  1. `repartitionByRange` on the sort key — the range exchange gives
  *     partition p every row ordered BEFORE partition p+1's rows (sampled
  *     bounds, the same machinery a global sort uses);
  *  2. per-partition running totals with a window keyed by
  *     `spark_partition_id()` — full parallelism, each partition's window
  *     is independent;
  *  3. per-partition TOTALS (numPartitions rows — O(partitions), the only
  *     driver-side state) cumulated into per-partition OFFSETS, joined
  *     back broadcast and added map-side.
  *
  * Result ≡ the single-partition window row-for-row (OrderedCumsumSpec
  * proves equality and that the plan carries no SinglePartition exchange
  * into a window). Deterministic: callers must pass a TOTAL order (include
  * a tiebreaker column); ROWS semantics (each row adds once, ties don't
  * collapse — with a total order RANGE and ROWS coincide anyway).
  */
object OrderedCumsum {

  /** Append `out` = running total of `value` over the total order
    * `sortKeys` (may include `.desc` keys). `partitions` sizes the range
    * exchange — at scale, pick data-size/target-partition-bytes. */
  def withRunningTotal(df: DataFrame, sortKeys: Seq[Column], value: Column,
                       out: String, partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions ($partitions) must be >= 1")
    // loud type contract (ADVICE r11): per-partition totals are collected
    // as long offsets below; a fractional value column would have its
    // offsets silently truncated while local prefixes stay exact,
    // corrupting every partition after the first. Refuse instead.
    val vt = df.select(value.as("__cumsum_v")).schema.head.dataType
    require(
      Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(vt),
      s"OrderedCumsum.withRunningTotal requires an integral value column, " +
        s"got $vt — cross-partition offsets are exchanged as int64; scale " +
        s"fractional values to integers (e.g. micro-units) first")
    // persisted because the totals action and the downstream join are
    // separate jobs over the same range exchange: the cache guarantees both
    // see ONE pid assignment. (Even on cache eviction the result stays
    // correct — RangePartitioner's bound sampling is seeded per partition
    // index, so re-execution over deterministic input re-derives identical
    // bounds — but the cache makes that a fallback, not the mechanism. At
    // 100 TB the equivalent is checkpointing the ranged pass.)
    val ranged = df.repartitionByRange(partitions, sortKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("__pid")).orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(value).over(w))
    // O(partitions) driver state: per-partition totals -> exclusive prefix
    // offsets. A missing pid (empty range partition) simply never joins.
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(value).cast("long").as("__tot")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.toSeq.map { case (pid, tot) =>
      val off = acc; acc += tot; (pid, off)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__pid", "__off")
    local.join(broadcast(offDf), Seq("__pid"), "left")
      .withColumn(out, col("__local") + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__local", "__off")
  }
}
