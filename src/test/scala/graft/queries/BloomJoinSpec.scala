package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpecBase, Tables}

/** Bloom-filter join reduction (q_bloom_join's machinery): the sketch must
  * never drop a joining row (no false negatives — that would be wrong
  * results) and must actually discard most non-joining rows pre-shuffle
  * (false-positive rate near the configured 1% — otherwise the operator is
  * cost without benefit).
  */
class BloomJoinSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("prefilter keeps every joining row and discards most others") {
    val cust = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bf = cust.stat.bloomFilter("c_custkey", 100000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))

    val orders = Tables.orders(spark, sf)
    val pre = orders.filter(mightContain(col("o_custkey")))

    // No false negatives: the true joining key set survives intact.
    val joinKeys = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    val joinKeysAfter = pre.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    assert(joinKeysAfter.count() === joinKeys.count())
    assert(joinKeys.exceptAll(joinKeysAfter).count() === 0)

    // Real reduction: passed-but-not-joining rows ≈ fpp, far below the
    // non-joining population (BUILDING is ~1/5 of customers).
    val total = orders.count()
    val joining = joinKeys.count()
    val passed = pre.count()
    val falsePos = passed - joining
    val nonJoining = total - joining
    assert(falsePos.toDouble / nonJoining < 0.05,
      s"false-positive pass-through too high: $falsePos of $nonJoining")
  }
}
