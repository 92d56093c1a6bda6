package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Exact heavy hitters (frequent values above a support threshold) with a
  * count-min-sketch PRE-SHUFFLE candidate filter — the two-pass sketch
  * pattern for mining frequent n-grams / boilerplate-candidate passages /
  * hot keys out of a corpus whose value cardinality is far too large to
  * shuffle in full.
  *
  * Why this is exact: a count-min sketch only ever OVER-estimates a
  * value's count (each of its `depth` counters is the true count plus
  * non-negative hash-collision mass), so `estimate >= minSupport` can
  * never be false for a genuinely frequent value — the probe has false
  * POSITIVES (collision-inflated rare values) but zero false negatives,
  * and pass 2's exact count discards the false positives. The final
  * result is therefore identical to the naive
  * `groupBy(value).count().filter(cnt >= minSupport)` — the sketch only
  * prunes the shuffle, never the answer — which is what lets the catalog
  * entry keep a plain exact-SQL DuckDB oracle (the q_dedup_minhash_lsh
  * convention: scale machinery must not change the semantics it serves).
  *
  * Sketch sizing is DERIVED, not hand-picked (the bloom-gate precedent):
  * pass 0 counts the value stream (shuffle-free, same generator pass the
  * sketch pays) and the width is `count / loadFactor`, so the expected
  * collision mass per counter stays `loadFactor`. The probe's false-admit
  * probability for a singleton at minSupport 3 is roughly
  * `P(cell collision mass >= 2)^depth ≈ (1 − e^−λ(1+λ))^depth` — at the
  * defaults (λ=0.25, depth=4) ~5·10⁻⁷, i.e. candidates ≈ true heavies.
  *
  * Scale shape at 100 TB:
  *  - passes 0+1 are SHUFFLE-FREE: counting and per-partition sketch
  *    folding both pipeline inside the scan/generate stage; sketches
  *    merge on the driver (CMS merge is exact);
  *  - the probe is a map-side filter before the exchange: only candidate
  *    rows reach the pass-2 shuffle, which then carries ~|heavy| rows per
  *    partition after map-side combine, not ~|distinct values|;
  *  - the width cap (`maxWidthCells`, default 2²¹ cells ⇒ 64 MB at
  *    depth 4) bounds the broadcast. Beyond the cap the sketch SATURATES
  *    GRACEFULLY: collision mass grows, the probe admits a larger tail
  *    fraction, pruning degrades — the answer never changes. A corpus
  *    whose distinct-value count dwarfs any broadcastable sketch (1e12
  *    8-grams) partitions the VALUE SPACE instead — hash values into k
  *    ranges, one capped sketch per range, probe against the range's
  *    sketch (the map-side filter then needs k sketches resident, still
  *    `k · cap` memory but collision mass `distinct/(k·width)`) — the
  *    same shard-the-model move as the IVF cell split;
  *  - three generator passes instead of one shuffled pass is the
  *    deliberate trade: re-generating n-grams is cheap codegen'd CPU,
  *    while shuffling every distinct n-gram of a 100 TB corpus is the
  *    bottleneck that kills the naive plan. A production deployment
  *    would persist the (count, sketch) pair next to the corpus snapshot
  *    and pay passes 0+1 once per ingest batch.
  */
object HeavyHitters {

  /** Default expected collision mass per sketch counter. */
  val DefaultLoadFactor = 0.25

  /** Default sketch depth (independent hash rows; false-admit probability
    * is exponential in it). */
  val DefaultDepth = 4

  /** Default width cap: 2²¹ counters/row ⇒ 16 MB/row, 64 MB at depth 4 —
    * comfortably broadcastable; see the saturation note above. */
  val DefaultMaxWidthCells = 1 << 21

  /** Pass 0+1: count the non-null value stream and fold it into a sketch
    * whose width targets `loadFactor` collision mass per counter, capped
    * at `maxWidthCells`. Exposed so a spec can inspect pruning and an
    * incremental deployment can persist/merge sketches. Returns the
    * sketch; `sketch.totalCount` is the pass-0 count. */
  def sketch(values: DataFrame, valueCol: String,
             loadFactor: Double = DefaultLoadFactor,
             depth: Int = DefaultDepth,
             maxWidthCells: Int = DefaultMaxWidthCells,
             seed: Int = 42): CountMinSketch = {
    require(loadFactor > 0, s"loadFactor ($loadFactor) must be > 0")
    require(depth >= 1, s"depth ($depth) must be >= 1")
    val nonNull = values.filter(col(valueCol).isNotNull)
    val n = nonNull.count()
    val width = math.min(maxWidthCells.toLong,
      math.max(1024L, math.ceil(n / loadFactor).toLong)).toInt
    nonNull.stat.countMinSketch(valueCol, depth, width, seed)
  }

  /** Exact `(value, cnt)` for every value occurring at least `minSupport`
    * times, computed through the sketch prefilter. Output columns:
    * `valueCol` (unchanged name) and `cnt` LONG. */
  def frequentValues(values: DataFrame, valueCol: String, minSupport: Long,
                     loadFactor: Double = DefaultLoadFactor,
                     depth: Int = DefaultDepth,
                     maxWidthCells: Int = DefaultMaxWidthCells,
                     seed: Int = 42): DataFrame = {
    require(minSupport >= 1, s"minSupport ($minSupport) must be >= 1")
    val cms = sketch(values, valueCol, loadFactor, depth, maxWidthCells, seed)
    frequentValuesPresketched(values, valueCol, minSupport, cms)
  }

  /** Pass 2 against an already-built (possibly persisted-and-merged)
    * sketch: probe → exact count → exact threshold. */
  def frequentValuesPresketched(values: DataFrame, valueCol: String,
                                minSupport: Long,
                                cms: CountMinSketch): DataFrame = {
    val bc = values.sparkSession.sparkContext.broadcast(cms)
    // String-typed probe: every current call site feeds a string value
    // column (n-grams, tokens, keys rendered to text); a binary/long
    // overload is a one-liner when a caller needs it.
    val mightBeHeavy = udf { (v: String) =>
      v != null && bc.value.estimateCount(v) >= minSupport
    }
    values.filter(mightBeHeavy(col(valueCol)))
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSupport)
  }
}
