package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Mergeable bounded-memory quantile sketch as a typed `Aggregator`
  * (SURVEY.md §2 B72) — single-pass distributed order statistics, the
  * 100 TB alternative to exact `percentile` (which buffers every value per
  * group) and the engine-owned counterpart of `approx_percentile`.
  *
  * KLL-shaped level structure with DETERMINISTIC compaction (no RNG — the
  * catalog's reproducibility rule): when a level overflows `capacity`, its
  * sorted even-length prefix collapses to the elements at ranks 2, 4, … and
  * promotes them one level up with doubled weight (an odd leftover stays).
  * Estimated rank error after compaction is O(levels / capacity)·n —
  * MEASURED, not asserted, in QuantileSketchSpec.
  *
  * Exact-regime convention (the q_heavy_hitters / CMS lineage): while a
  * group's count stays ≤ capacity no compaction can fire anywhere — not in
  * reduce, not in merge — so the sketch holds every value at weight 1 and
  * `finish` returns the exact discrete quantile at rank ceil(p·n), which is
  * DuckDB's `quantile_disc` rule (probed empirically; only binary-exact p
  * values are used in the catalog so ceil(p·n) is float-unambiguous in both
  * engines). The oracle is therefore the plain exact query at test scale,
  * while the SAME aggregate runs at bounded memory on 100 TB with capacity
  * dialed down (≈2k for ~1% rank error) — the sketch is invisible in the
  * answer until the memory bound actually binds.
  */
object QuantileSketch {

  /** Buffer = weight levels: level l holds values of weight 2^l. */
  type Levels = Seq[Seq[Double]]

  private def compactAt(levels: Vector[Vector[Double]], l: Int): Vector[Vector[Double]] = {
    val sorted = levels(l).sorted
    val m = sorted.length - (sorted.length % 2)
    val promote = (1 until m by 2).map(sorted)
    val remain: Vector[Double] =
      if (m < sorted.length) Vector(sorted.last) else Vector.empty
    val grown = if (levels.length > l + 1) levels else levels :+ Vector.empty[Double]
    grown.updated(l, remain).updated(l + 1, grown(l + 1) ++ promote)
  }

  private def cascade(levels0: Vector[Vector[Double]], capacity: Int): Vector[Vector[Double]] = {
    var levels = levels0
    var l = 0
    while (l < levels.length) {
      if (levels(l).length > capacity) levels = compactAt(levels, l)
      else l += 1
    }
    levels
  }

  /** @param requireExact fail loudly in `finish` if compaction ever fired
    *   (i.e. any value sits above level 0, so the answer is an estimate).
    *   The exact-regime catalog entry (q_quantile_sketch) sets this: its
    *   DuckDB oracle is the exact `quantile_disc`, and the match silently
    *   depended on every group staying ≤ capacity — at a larger sf the
    *   entry would drift from its oracle with no guard (r10 ADVICE). With
    *   the flag the invariant is CHECKED per group, not assumed: a group
    *   outgrowing the capacity turns a baffling hash mismatch into an
    *   explicit error naming the fix (raise capacity or accept estimates). */
  class QSketch(capacity: Int, ps: Seq[Double], requireExact: Boolean = false)(
      implicit bEnc: Encoder[Levels], oEnc: Encoder[Seq[Double]])
    extends Aggregator[Double, Levels, Seq[Double]] {
    require(capacity >= 8, s"capacity ($capacity) must be >= 8")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"bad quantiles $ps")

    def zero: Levels = Vector(Vector.empty[Double])

    def reduce(b: Levels, v: Double): Levels = {
      val levels = b.toVector.map(_.toVector)
      val appended = levels.updated(0, levels(0) :+ v)
      if (appended(0).length > capacity) cascade(appended, capacity) else appended
    }

    def merge(x: Levels, y: Levels): Levels = {
      val n = math.max(x.length, y.length)
      val joined = Vector.tabulate(n) { l =>
        (if (l < x.length) x(l).toVector else Vector.empty[Double]) ++
          (if (l < y.length) y(l).toVector else Vector.empty[Double])
      }
      cascade(joined, capacity)
    }

    /** Discrete quantile at weighted rank ceil(p·n) — exact when no
      * compaction fired (all weights 1). */
    def finish(b: Levels): Seq[Double] = {
      if (requireExact && b.drop(1).exists(_.nonEmpty))
        throw new IllegalStateException(
          s"QuantileSketch(requireExact): compaction fired — a group exceeded " +
            s"capacity $capacity, so the result would be an estimate, not the " +
            "exact quantile_disc the caller declared. Raise capacity or drop " +
            "requireExact (and the exact oracle) for this use.")
      val items = (for {
        (lvl, l) <- b.zipWithIndex
        v <- lvl
      } yield (v, 1L << l)).sortBy(_._1)
      val n = items.iterator.map(_._2).sum
      if (n == 0L) return ps.map(_ => Double.NaN)
      ps.map { p =>
        val target = math.max(1L, math.ceil(p * n).toLong)
        var cum = 0L
        var i = 0
        while (cum < target && i < items.length) { cum += items(i)._2; i += 1 }
        items(math.min(i, items.length) - 1)._1
      }
    }

    def bufferEncoder: Encoder[Levels] = bEnc
    def outputEncoder: Encoder[Seq[Double]] = oEnc
  }

  /** One-column aggregate `quantiles(x)` → `array<double>` in `ps` order. */
  def quantiles(spark: SparkSession, capacity: Int, ps: Seq[Double],
                requireExact: Boolean = false): UserDefinedFunction = {
    import spark.implicits._
    udaf(new QSketch(capacity, ps, requireExact))
  }
}
