package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** KMV sketch (B107): the exact-regime theorem, merge-order invariance,
  * dedup semantics, and MEASURED estimator calibration on planted-overlap
  * sets — including the partial-intersection case the catalog entry's
  * fixture exercises (ρ strictly between 0 and k).
  */
class KmvSketchSpec extends SparkSpecBase {

  private val K = 64
  private val M = BigInt(1) << 60

  /** 60-bit md5 hash of a long id, matching the catalog convention. */
  private def hv(id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)

  private def sketchOf(ids: Seq[Long], parts: Int = 7): Seq[Long] = {
    val agg = KmvSketch.kmv(spark, K)
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
      .repartition(parts)
      .select(conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .agg(agg(col("h")).as("sk"))
      .collect()(0).getSeq[Long](0)
  }

  private def estimate(sk: Seq[Long]): Long =
    if (sk.length < K) sk.length
    else ((BigInt(K - 1) * M) / sk.last).toLong

  test("exact regime: fewer distinct values than k keeps EVERY hash, est = exact") {
    val ids = (1L to 40L)
    val sk = sketchOf(ids)
    assert(sk === ids.map(hv).sorted)
    assert(estimate(sk) === 40L)
  }

  test("dedup: repeated values leave the sketch unchanged") {
    val once = sketchOf(1L to 40L)
    val thrice = sketchOf((1L to 40L) ++ (1L to 40L) ++ (1L to 40L))
    assert(once === thrice)
  }

  test("saturated sketch is the k smallest hashes; partitioning never changes it") {
    val ids = 1L to 5000L
    val gold = ids.map(hv).sorted.take(K)
    assert(sketchOf(ids, parts = 1) === gold)
    assert(sketchOf(ids, parts = 13) === gold)
    assert(sketchOf(ids, parts = 32) === gold)
  }

  test("measured calibration: |est - n| within 4 sigma (sigma ~ n/sqrt(k-2))") {
    val n = 5000
    val est = estimate(sketchOf(1L to n.toLong))
    val sigma = n / math.sqrt(K - 2)
    assert(math.abs(est - n) < 4 * sigma,
      s"est $est vs n $n exceeds 4·σ = ${4 * sigma}")
  }

  test("intersection estimator: planted partial overlap, rho strictly interior") {
    // A = [1, 3000], B = [2001, 5000]: |A∩B| = 1000, |A∪B| = 5000.
    val a = sketchOf(1L to 3000L)
    val b = sketchOf(2001L to 5000L)
    val uni = (a ++ b).distinct.sorted.take(K)
    val rho = uni.count(h => a.contains(h) && b.contains(h))
    assert(rho > 0 && rho < K, s"rho $rho must be strictly interior")
    val estU = estimate(uni)
    val estI = (BigInt(rho) * estU / uni.length).toLong
    // binomial σ for ρ ≈ k·(inter/union): √(k·p·(1−p)) scaled to set units
    val p = 1000.0 / 5000.0
    val sigma = math.sqrt(K * p * (1 - p)) / K * estU
    assert(math.abs(estI - 1000L) < 4 * sigma,
      s"est_inter $estI vs 1000 exceeds 4·σ = ${4 * sigma}")
  }

  test("disjoint sets: rho = 0, est_inter = 0") {
    val a = sketchOf(1L to 2000L)
    val b = sketchOf(100001L to 102000L)
    val uni = (a ++ b).distinct.sorted.take(K)
    assert(uni.count(h => a.contains(h) && b.contains(h)) === 0)
  }

  test("exact-regime intersection degrades to the exact count") {
    // both sets under k: union sketch holds everything, rho IS |A∩B|
    val a = sketchOf(1L to 30L)
    val b = sketchOf(21L to 50L)
    val uni = (a ++ b).distinct.sorted.take(K)
    val rho = uni.count(h => a.contains(h) && b.contains(h))
    assert(rho === 10)
    assert((BigInt(rho) * estimate(uni) / uni.length).toLong === 10L)
  }
}
