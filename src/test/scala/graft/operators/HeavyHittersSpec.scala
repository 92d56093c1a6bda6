package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import HeavyHitters.DefaultLoadFactor

/** [[HeavyHitters]] (SURVEY §2 B62): the sketch prefilter must be
  * answer-INVISIBLE (result ≡ the naive exact groupBy at any eps) while
  * actually PRUNING the shuffle (candidate rows ≪ input rows on a
  * long-tailed corpus). Both halves are asserted — an operator that was
  * exact but pruned nothing would be a slower spelling of groupBy, and
  * one that pruned but dropped a heavy value would be wrong at any speed.
  */
class HeavyHittersSpec extends SparkSpecBase {

  /** 6-hex word from (seed, j). */
  private def w(seed: Long, j: org.apache.spark.sql.Column) =
    substring(md5(concat_ws("_", lit(seed), j)), 1, 6)

  /** Long-tailed value stream: 40000 singleton values (the tail no sane
    * plan should shuffle) + 8 planted heavy values at supports 3..10,
    * interleaved so heavies and tail share partitions. */
  private def stream = {
    val tail = spark.range(40000).select(w(11, col("id")).as("v"))
    val heavy = spark.range(8).select(col("id").as("h"),
        (col("id") + 3).cast("int").as("times"))
      .select(explode(sequence(lit(1), col("times"))).as("rep"),
        w(99, col("h")).as("v"))
      .select(col("v"))
    tail.union(heavy).repartition(4)
  }

  private def naive(minSupport: Long) =
    stream.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSupport)
      .orderBy(col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("exact at any sketch resolution: result == naive groupBy") {
    val expected = naive(3)
    assert(expected.size == 8, "planted corpus sanity")
    // a SATURATED sketch (loadFactor 16 → ~16 collision mass per counter,
    // the beyond-the-width-cap regime) admits many false candidates, but
    // must never lose a heavy — the answer is sketch-size-invariant
    for (lf <- Seq(DefaultLoadFactor, 16.0)) {
      val got = HeavyHitters.frequentValues(stream, "v", minSupport = 3,
          loadFactor = lf)
        .orderBy(col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected, s"loadFactor=$lf")
    }
  }

  test("support threshold is exact: minSupport 10 keeps only the top value") {
    val got = HeavyHitters.frequentValues(stream, "v", minSupport = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == naive(10))
    assert(got.size == 1 && got.head._2 == 10L)
  }

  test("the probe prunes the shuffle: candidates are a tiny fraction of rows") {
    val cms = HeavyHitters.sketch(stream, "v")
    val total = 40000L + (3 to 10).sum
    assert(cms.totalCount() == total, "sketch saw every row exactly once")
    // replicate the probe to count what pass 2 would shuffle: at the
    // derived width (count/0.25 ⇒ λ=0.25 collision mass per counter) a
    // singleton's false-admit odds are ~(1−e^−λ(1+λ))^4 ≈ 5e-7, so the
    // candidates should be exactly the 52 heavy rows; the assert leaves
    // room for a handful of hash accidents rather than pinning 52
    val bc = spark.sparkContext.broadcast(cms)
    val candidates = stream.filter(
      udf((v: String) => bc.value.estimateCount(v) >= 3L).apply(col("v")))
      .count()
    assert(candidates >= 52, "no heavy row may be filtered out")
    assert(candidates * 100 <= total,
      s"probe admitted $candidates of $total rows — pruning lost")
  }

  test("null values are excluded, not crashed on") {
    val withNulls = stream.union(
      spark.range(5).select(lit(null).cast("string").as("v")))
    val got = HeavyHitters.frequentValues(withNulls, "v", minSupport = 3)
      .orderBy(col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == naive(3), "nulls must not appear even above support")
  }
}
