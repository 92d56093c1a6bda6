package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` (SURVEY.md §2 B65): keep the k
  * best (score DESC, id ASC) rows per group WITHOUT sorting the group.
  *
  * The window form (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`,
  * q_topk_group) is the correctness baseline. On Spark ≥ 3.5,
  * `InferWindowGroupLimit` already bounds ITS exchange too (a map-side
  * WindowGroupLimit keeps ≤ k rows per group per partition — measured in
  * SCALE.md), so shuffle volume is NOT where this aggregate wins. The
  * remaining, real differences at 100 TB:
  *
  *  - the window plan's map-side WindowGroupLimit sits on top of a
  *    per-partition Sort of the FULL input rows — payload columns
  *    included — an O(n log n) full-width sort per partition; the
  *    aggregate does one streaming pass with an O(k) buffer over
  *    (score, id) alone, never touching the payload until the winners
  *    join back;
  *  - the aggregate COMPOSES: `agg(count(..), sum(..), topk(..))` answers
  *    "group stats + its top examples" in ONE shuffle, where the window
  *    form needs a separate window pass joined back to the aggregate.
  *
  * PlanSpec pins the plan shape (partial ObjectHashAggregate below the
  * exchange, no Window, no Sort over the input); TopKAggSpec proves
  * answer-equality with the window form and exercises the merge path
  * across many partitions; SCALE.md carries the measured two-plan
  * comparison on the 105k-doc soak corpus.
  *
  * The (score DESC, id ASC) comparator is a TOTAL order, which is what
  * makes the result deterministic and oracle-comparable — a top-k under a
  * partial order would be partition-order-dependent.
  */
object TopKAgg {

  private[functions] def ranksBefore(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Aggregator over (score, id) pairs; buffer = the current top-k in rank
    * order. k is small (a UI/page-size constant), so the buffer is an
    * immutable Seq and insertion is O(k) — the per-row cost is a scan of at
    * most k elements, and most rows fail the `b.last` gate in O(1). */
  class TopK(k: Int)(implicit bEnc: Encoder[Seq[(Double, Long)]])
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, s"top-k size ($k) must be >= 1")

    def zero: Seq[(Double, Long)] = Seq.empty

    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (b.length == k && !ranksBefore(a, b.last)) b
      else {
        val (pre, post) = b.span(ranksBefore(_, a))
        (pre :+ a) ++ post.take(k - pre.length - 1)
      }

    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val out = Seq.newBuilder[(Double, Long)]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && ranksBefore(x(i), y(j)))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
        n += 1
      }
      out.result()
    }

    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = bEnc
    def outputEncoder: Encoder[Seq[(Double, Long)]] = bEnc
  }

  /** Two-column aggregate `topk(score, id)` → `array<struct<_1,_2>>` in
    * rank order (score DESC, id ASC). */
  def topK(spark: SparkSession, k: Int): UserDefinedFunction = {
    import spark.implicits._
    udaf(new TopK(k))
  }
}
