package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct sketch as a typed `Aggregator`
  * (SURVEY.md §2 B107) — the mergeable distinct-count summary that, unlike
  * HLL registers, supports SET ALGEBRA: because the sketch IS a uniform
  * hash sample of the underlying set (its k smallest distinct hash
  * values), two sketches can be intersected/unioned hash-by-hash and the
  * overlap re-scaled into an intersection-cardinality estimate (Beyer et
  * al., "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD 2007). HLL answers |A| and |A∪B|; KMV also answers
  * |A∩B| — the "how much does source X's vocabulary/id space overlap
  * source Y's" question cross-source dedup planning starts from.
  *
  * Determinism (the catalog's reproducibility rule): the k smallest
  * DISTINCT hashes of a set are a pure function of the set — no RNG, no
  * partition-order dependence — so the whole estimator is replayable in
  * ANSI SQL (ORDER BY hash LIMIT k) and sits under the DuckDB oracle
  * exactly, unlike engine-private HLL registers (q_approx_distinct ships a
  * bound check for that reason; this entry ships the VALUES).
  *
  * Estimator contract (both engines, exact integer arithmetic):
  *  - hashes are 60-bit non-negative (`conv(substr(md5(v),1,15),16,10)` ≡
  *    DuckDB `CAST('0x' || substr(md5(v),1,15) AS BIGINT)`), M = 2^60;
  *  - |retained| < k (exact regime): estimate = |retained| — the sketch
  *    holds EVERY distinct hash, the answer is exact (the CMS/KLL
  *    exact-regime convention of this catalog);
  *  - else: estimate = (k−1)·M div h_(k) — the Beyer et al. unbiased
  *    estimator, floor division in 128-bit (DECIMAL(38,0) here, HUGEINT in
  *    the oracle; (k−1)·M ≈ 2^68 overflows int64);
  *  - union: merge sketches, keep k smallest → same estimator;
  *  - intersection: with K = union sketch (size ku ≤ k) and
  *    ρ = |{h ∈ K : h ∈ sk(A) ∧ h ∈ sk(B)}|, estimate =
  *    ρ·est(A∪B) div ku — in the exact regime ku = |A∪B| and ρ = |A∩B|,
  *    so it degrades to the exact intersection count.
  *
  * Scale posture: the buffer is ≤ k longs per group regardless of group
  * size (k is an accuracy dial, σ/n ≈ 1/√(k−2) ≈ 6% at k = 256), reduce
  * is O(1) for the ~(1 − k/n) of rows whose hash exceeds the current kth
  * (one comparison against `b.last`), and merge is a linear two-pointer
  * pass — partial aggregation does map-side combine, so the shuffle
  * carries one ≤ k-long array per (partition, group). Hash collisions
  * (~n²/2M, ≈ 2·10⁻¹⁰ at n = 20k) bias the estimate like any KMV build
  * and are identical cross-engine by construction.
  */
object KmvSketch {

  /** Buffer/result = the current ≤ k smallest distinct hashes, ascending. */
  class Kmv(k: Int)(implicit enc: Encoder[Seq[Long]])
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2, s"kmv sketch size ($k) must be >= 2")

    def zero: Seq[Long] = Seq.empty

    def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.length == k && h >= b.last) b
      else {
        val (pre, post) = b.span(_ < h)
        if (post.headOption.contains(h)) b
        else (pre :+ h) ++ post.take(k - pre.length - 1)
      }

    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
      val out = Seq.newBuilder[Long]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < x.length || j < y.length)) {
        if (j >= y.length) { out += x(i); i += 1 }
        else if (i >= x.length) { out += y(j); j += 1 }
        else if (x(i) < y(j)) { out += x(i); i += 1 }
        else if (y(j) < x(i)) { out += y(j); j += 1 }
        else { out += x(i); i += 1; j += 1 } // shared hash: emit once
        n += 1
      }
      out.result()
    }

    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] = enc
    def outputEncoder: Encoder[Seq[Long]] = enc
  }

  /** One-column aggregate `kmv(hash)` → ascending `array<long>` of the ≤ k
    * smallest distinct hashes. */
  def kmv(spark: SparkSession, k: Int): UserDefinedFunction = {
    import spark.implicits._
    udaf(new Kmv(k))
  }

  /** SQL fragment: cardinality estimate from a sketch column `c` under the
    * contract above (Spark dialect; 1152921504606846976 = 2^60). */
  def estimateSql(c: String, k: Int): String =
    s"""CASE WHEN size($c) < $k THEN CAST(size($c) AS BIGINT)
       |ELSE CAST(CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976
       |  DIV element_at($c, $k) AS BIGINT) END""".stripMargin
}
