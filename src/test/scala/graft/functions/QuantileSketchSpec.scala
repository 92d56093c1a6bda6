package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** graft.functions.QuantileSketch (SURVEY.md §2 B72): exact-regime answers
  * must equal the rank-ceil(p·n) order statistic (DuckDB's quantile_disc
  * rule) under any partitioning/merge order; the compacted regime's rank
  * error is MEASURED against a bound, not asserted. */
class QuantileSketchSpec extends SparkSpecBase {

  private val Ps = Seq(0.1, 0.25, 0.5, 0.75, 0.875, 0.99, 1.0)

  private def mkSketch(capacity: Int) = {
    val s = spark
    import s.implicits._
    new QuantileSketch.QSketch(capacity, Ps)
  }

  /** Drive the Aggregator contract by hand: chunked reduces + merges. */
  private def sketchOf(vals: Seq[Double], capacity: Int, chunks: Int): Seq[Double] = {
    val agg = mkSketch(capacity)
    val partials = vals.grouped(math.max(1, (vals.length + chunks - 1) / chunks))
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    agg.finish(partials.reduce(agg.merge))
  }

  private def exactRef(vals: Seq[Double]): Seq[Double] = {
    val sorted = vals.sorted
    Ps.map(p => sorted(math.ceil(p * sorted.length).toLong.toInt.max(1) - 1))
  }

  // deterministic pseudo-random data (no RNG in main code; tests may seed)
  private val data: Seq[Double] =
    new scala.util.Random(42).shuffle((1 to 5000).map(i => (i * i % 997).toDouble))

  test("exact regime: equals the rank-ceil(p*n) order statistic") {
    assert(sketchOf(data, capacity = 8192, chunks = 13) === exactRef(data))
  }

  test("exact regime: invariant under partitioning and merge order") {
    val a = sketchOf(data, capacity = 8192, chunks = 1)
    val b = sketchOf(data, capacity = 8192, chunks = 7)
    val c = sketchOf(data, capacity = 8192, chunks = 64)
    assert(a === b)
    assert(b === c)
    // a different merge tree over the same partials
    val agg = mkSketch(8192)
    val partials = data.grouped(500).map(_.foldLeft(agg.zero)(agg.reduce)).toVector
    val leftFold = partials.reduce(agg.merge)
    val pairwise = partials.grouped(2).map(_.reduce(agg.merge)).toVector.reduce(agg.merge)
    assert(agg.finish(leftFold) === agg.finish(pairwise))
  }

  test("compacted regime: measured rank error stays within the level bound") {
    val capacity = 64
    val got = sketchOf(data, capacity, chunks = 16)
    val sorted = data.sorted
    val n = sorted.length
    // rank error of the returned value vs the target rank, in rows
    val errs = Ps.zip(got).map { case (p, v) =>
      val target = math.ceil(p * n).toLong.max(1L)
      val lo = sorted.indexWhere(_ >= v) + 1 // first rank holding v
      val hi = sorted.lastIndexWhere(_ <= v) + 1 // last rank holding v
      if (target < lo) lo - target else if (target > hi) target - hi else 0L
    }
    // levels ≈ log2(n/capacity); deterministic compaction error ≲ levels·n/capacity.
    // Measured on this fixture the max error is far below the bound; the
    // assert is the bound, the printout is the measurement.
    val bound = (math.ceil(math.log(n.toDouble / capacity) / math.log(2)) * n / capacity).toLong
    info(s"n=$n capacity=$capacity rank errors=${errs.mkString(",")} bound=$bound")
    assert(errs.max <= bound, s"rank errors $errs exceed $bound")
    assert(errs.max > 0L || n <= capacity, "compaction never fired — capacity too big for the fixture")
  }

  test("spark udaf path: exact regime across repartitionings") {
    val s = spark
    import s.implicits._
    val qs = QuantileSketch.quantiles(s, capacity = 8192, ps = Seq(0.25, 0.5, 0.75))
    def run(parts: Int): Seq[Double] = {
      val df = data.toDF("x").repartition(parts)
      df.agg(qs(col("x")).as("q")).head().getSeq[Double](0)
    }
    val sorted = data.sorted
    val exp = Seq(0.25, 0.5, 0.75).map(p => sorted(math.ceil(p * data.length).toInt - 1))
    assert(run(1) === exp)
    assert(run(32) === exp)
  }

  test("requireExact: exact regime still answers, compaction fails loudly") {
    // r10 ADVICE guard: the exact-oracle catalog entry silently depended on
    // every group staying <= capacity; with requireExact the invariant is
    // checked at finish — outgrowing the capacity is an error naming the
    // fix, not a baffling oracle hash mismatch at a larger sf.
    val s = spark
    import s.implicits._
    val agg = new QuantileSketch.QSketch(capacity = 8, ps = Seq(0.5),
      requireExact = true)
    val small = (1 to 8).map(_.toDouble).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(small) === Seq(4.0))
    val big = (1 to 100).map(_.toDouble).foldLeft(agg.zero)(agg.reduce)
    val e = intercept[IllegalStateException](agg.finish(big))
    assert(e.getMessage.contains("compaction fired"))
  }
}
