package graft.queries

import graft.SparkSpecBase
import graft.operators.{MinHashConfig, NearDup}

/** Hot-bucket guard for LSH candidate generation (SURVEY.md §2 B50).
  *
  * A planted family of 10 000 byte-identical documents lands every member in
  * the SAME (band, signature) bucket of both MinHash and SimHash — without
  * the MaxBucket cap that is one 10 000-element collect_set row on a single
  * reducer and ~5·10⁷ candidate pairs per band (the single-reducer quadratic
  * blowup). With the cap the mega-bucket is skipped (exact-dup families are
  * the linear sha-256 path's job), the pipeline completes in seconds, and
  * pairs among normal-sized families are unaffected.
  */
class SkewSpec extends SparkSpecBase {
  private val s = spark
  import s.implicits._

  private val megaText =
    "the quick brown fox jumps over the lazy dog again and again in the long meadow"
  private val smallText =
    "a completely different small family of documents that repeats itself verbatim here"

  /** 10 000-doc identical mega family (ids 100000+), a 5-doc identical small
    * family (ids 0-4), and 50 distinct filler docs (ids 10-59). */
  private lazy val docs = {
    val mega = (0 until 10000).map(i => (100000L + i, megaText))
    val small = (0 until 5).map(i => (i.toLong, smallText))
    val filler = (0 until 50).map(i =>
      (10L + i, s"filler doc number $i with tokens alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    (mega ++ small ++ filler).toDF("doc_id", "text")
  }

  test("minhash pair generation skips the 10k mega-bucket, keeps small families") {
    val pairs = NearDup.minhashPairs(docs, LlmOps.MinHashCfg).collect()
    assert(pairs.forall(r => r.getLong(0) < 100000L && r.getLong(1) < 100000L),
      "no candidate pair may come from the capped mega family")
    val smallPairs = pairs.filter(r => r.getLong(0) < 5 && r.getLong(1) < 5)
    assert(smallPairs.length == 10, s"expected C(5,2)=10 small-family pairs, got ${smallPairs.length}")
    assert(smallPairs.forall(_.getDouble(2) == 1.0))
  }

  test("simhash pair generation skips the 10k mega-bucket, keeps small families") {
    val pairs = NearDup.simhashPairs(docs, LlmOps.SimHashCfg).collect()
    assert(pairs.forall(r => r.getLong(0) < 100000L && r.getLong(1) < 100000L))
    val smallPairs = pairs.filter(r => r.getLong(0) < 5 && r.getLong(1) < 5)
    assert(smallPairs.length == 10)
    assert(smallPairs.forall(_.getInt(2) == 0), "identical docs have Hamming distance 0")
  }

  test("the cap is the only gate: a family above the default cap flips from" +
      " skipped to admitted as maxBucket crosses the family size") {
    // a 1200-doc identical family sits ABOVE the default 1000 cap (skipped)
    // and BELOW a raised 2000 cap (admitted: C(1200,2) = 719 400 pairs) —
    // same data, only the config changes, so the skip in the tests above is
    // provably the cap and not a lost bucket
    val family = (0 until 1200).map(i => (200000L + i, megaText)).toDF("doc_id", "text")
    val capped = NearDup.minhashPairs(family,
      MinHashConfig(maxBucket = 1000)).count()
    assert(capped === 0L, "family of 1200 must be skipped at cap 1000")
    val admitted = NearDup.minhashPairs(family,
      MinHashConfig(maxBucket = 2000)).count()
    assert(admitted === 1200L * 1199 / 2)
  }

  test("saltedJoin on a planted hot key equals the plain join, spread over buckets") {
    import org.apache.spark.sql.functions._
    // one customer owns 90% of the fact rows — the shape that funnels a
    // sort-merge join's hot key through a single task
    val fact = ((0 until 9000).map(_ => 1L) ++ (0 until 1000).map(i => 2L + i % 50))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "v")
    val dim = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "k", buckets = 8)
    val plain = fact.join(dim, "k")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // and the hot key's rows really are spread: >1 distinct salt bucket
    val saltSpread = fact.filter(col("k") === 1L)
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(8L)))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(saltSpread > 1, s"hot key stayed in $saltSpread bucket(s)")
  }
}
