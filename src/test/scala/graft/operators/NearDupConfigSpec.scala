package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The config-derivation half of the public NearDup/Ann API (SURVEY.md §2
  * B50/B51): the sizing math that replaced round-3's hard-coded
  * `24 × 6 / MaxBucket` vals must actually track corpus size. Pure-math
  * cases pin the formulas; the occupancy cases run the real LSH bucketing
  * at two corpus sizes and assert the derived geometry keeps expected
  * bucket occupancy near the target while a fixed geometry lets it grow
  * linearly — the property that makes candidate generation stay linear at
  * 100 TB.
  */
class NearDupConfigSpec extends SparkSpecBase {

  test("EmbedLshConfig.derive sizes bits to corpus and restores recall with bands") {
    // bits = max(4, ceil(log2(n / targetBucket))): 4x corpus => +2 bits
    val small = EmbedLshConfig.derive(corpusSize = 4096, dim = 64, targetBucket = 64)
    val large = EmbedLshConfig.derive(corpusSize = 16384, dim = 64, targetBucket = 64)
    assert(small.bits === 6)
    assert(large.bits === 8)
    // finer buckets need more bands for the same recall target
    assert(large.bands >= small.bands)
    // the amplification curve clears the recall target — or the band clamp
    // (64, a cost ceiling) was hit, the documented escape hatch for a
    // hard p/bits regime
    def recall(c: EmbedLshConfig, p: Double): Double =
      1 - math.pow(1 - math.pow(p, c.bits), c.bands)
    assert(recall(small, 0.6) >= 0.9)
    assert(recall(large, 0.6) >= 0.9 || large.bands === 64)
    // at true near-dup similarity (p ~ 0.8) both geometries clear it outright
    assert(recall(small, 0.8) >= 0.9)
    assert(recall(large, 0.8) >= 0.9)
    // prime must dominate the plane count, pairwise-distinctness's precondition
    assert(small.prime >= small.bands * small.bits)
    assert(large.prime >= large.bands * large.bits)
    assert(EmbedLshConfig.primeAtLeast(144) === 149)
  }

  test("MinHashConfig.derive lands the S-curve under the confirm threshold") {
    val c = MinHashConfig.derive(jaccardConfirm = 0.8)
    assert(c.sCurveThreshold <= 0.8)
    assert(c.numHashes === c.bands * c.rowsPerBand)
    // tighter confirm => fewer rows per band suffice; looser needs more
    val loose = MinHashConfig.derive(jaccardConfirm = 0.95)
    assert(loose.rowsPerBand <= c.rowsPerBand)
    intercept[IllegalArgumentException](MinHashConfig(numHashes = 10, bands = 4))
  }

  test("shingle width is a real knob: wider grams split fewer docs into candidates") {
    val s = spark
    import s.implicits._
    // two docs sharing a 2-token phrase but no 3-token run: 2-gram shingling
    // finds the overlap, 3-gram does not
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "omega alpha beta epsilon zeta")).toDF("doc_id", "text")
    def byDoc(width: Int): Map[Long, Set[String]] =
      NearDup.shingles(docs, width).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getString(1)).toSet).toMap
    val two = byDoc(2)
    assert((two(1L) & two(2L)) === Set("alpha beta"))
    val three = byDoc(3)
    assert((three(1L) & three(2L)).isEmpty)
    // width reaches minhashPairs through the config: identical docs pair up
    // at any width, and a doc shorter than the width yields no shingles
    val dup = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    assert(NearDup.minhashPairs(dup, MinHashConfig(shingleWidth = 2)).count() === 1)
    assert(NearDup.minhashPairs(dup, MinHashConfig(shingleWidth = 3)).count() === 0)
  }

  test("forCorpus derives geometry from the live corpus cardinality") {
    val s = spark
    import s.implicits._
    val emb = (0 until 2000).map(i =>
      (i.toLong, Array.fill(16)((i % 7).toDouble))).toDF("vec_id", "e")
    val cfg = EmbedLshConfig.forCorpus(emb, targetBucket = 64)
    // ~2000 distinct ids / 64 target => 5 bits (approx_count_distinct has
    // ~2% error; the ceil result is stable well away from the 2^k boundary)
    assert(cfg.bits === 5)
    assert(cfg.dim === 16)
    assert(cfg.prime >= cfg.bands * cfg.bits)
  }

  test("derived geometry holds bucket occupancy at the target across corpus sizes") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random 64-dim corpus at two sizes; hash-based so
    // the test is stable across runs without Math.random
    def corpus(n: Int) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (conv(substring(md5(concat(col("id"), lit("_"), j)), 1, 7), 16, 10)
          .cast("double") / 134217728.0) - 1.0).as("e"))

    def meanOccupancy(n: Int, cfg: EmbedLshConfig): Double =
      Ann.lshBands(corpus(n), cfg)
        .groupBy(col("band"), col("bucket")).count()
        .agg(avg(col("count"))).head().getDouble(0)

    val cfgSmall = EmbedLshConfig.derive(2000, 64, targetBucket = 64)
    val cfgLarge = EmbedLshConfig.derive(8000, 64, targetBucket = 64)
    val occSmallDerived = meanOccupancy(2000, cfgSmall)
    val occLargeDerived = meanOccupancy(8000, cfgLarge)
    val occLargeFixed = meanOccupancy(8000, cfgSmall)
    info(f"derived: n=2000 -> ${cfgSmall.bits} bits, occ $occSmallDerived%.1f; " +
      f"n=8000 -> ${cfgLarge.bits} bits, occ $occLargeDerived%.1f " +
      f"(fixed small geometry at n=8000: $occLargeFixed%.1f)")
    // fixed geometry: occupancy grows ~linearly with the corpus. Derived:
    // the added bits absorb the growth (hyperplane buckets are not uniform,
    // so allow generous slack — the point is the trend, not the constant).
    assert(cfgLarge.bits > cfgSmall.bits)
    assert(occLargeFixed > occLargeDerived * 1.5,
      "deriving bits from corpus size must shrink buckets vs a fixed geometry")
    // and the predicted occupancy formula is in the right regime
    assert(cfgSmall.expectedOccupancy(2000) === 2000.0 / (1 << cfgSmall.bits))
  }
}
