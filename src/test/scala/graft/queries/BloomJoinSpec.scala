package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpecBase, Tables}

/** Bloom-filter join reduction (q_bloom_join's machinery): the sketch must
  * never drop a joining row (no false negatives — that would be wrong
  * results) and must actually discard most non-joining rows pre-shuffle
  * (false-positive rate near the configured 1% — otherwise the operator is
  * cost without benefit). The probe is the codegen `bloom_might_contain`
  * kernel; the plan-shape test pins that no ScalaUDF sneaks back into the
  * fact-scan hot path.
  */
class BloomJoinSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def sketchBytes(df: org.apache.spark.sql.DataFrame): Array[Byte] = {
    val bf = df.stat.bloomFilter("c_custkey", 100000L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("prefilter keeps every joining row and discards most others") {
    val cust = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val mightContain = call_function("bloom_might_contain",
      col("o_custkey"), lit(sketchBytes(cust)))

    val orders = Tables.orders(spark, sf)
    val pre = orders.filter(mightContain)

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

  test("kernel matches the boxed-UDF probe bit-for-bit on every key") {
    val cust = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bytes = sketchBytes(cust)
    val bf = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val bfB = spark.sparkContext.broadcast(bf)
    val viaUdf = udf((k: Long) => bfB.value.mightContainLong(k))
    val disagree = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        call_function("bloom_might_contain", col("o_custkey"), lit(bytes))
          .as("kernel"),
        viaUdf(col("o_custkey")).as("boxed"))
      .filter(col("kernel") =!= col("boxed"))
    assert(disagree.count() === 0)
  }

  test("q_bloom_join plan probes in codegen: no ScalaUDF, no BatchEvalPython") {
    val plan = Relational.defs("q_bloom_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), "kernel must appear in plan")
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("batchevalpython"),
      "the probe must not fall back to a boxed UDF")
  }
}
