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

  test("EmbedLshConfig.derive sizes bits to corpus and ALWAYS meets the recall target") {
    def recall(c: EmbedLshConfig, p: Double): Double =
      1 - math.pow(1 - math.pow(p, c.bits), c.bands)
    // true near-dup regime (p ~ 0.8): ideal bits are affordable, so
    // 4x corpus => +2 bits, and bands grow to hold the recall target
    val small = EmbedLshConfig.derive(4096, dim = 64, targetBucket = 64,
      planeAgreement = 0.8)
    val large = EmbedLshConfig.derive(16384, dim = 64, targetBucket = 64,
      planeAgreement = 0.8)
    assert(small.bits === 6 && large.bits === 8)
    assert(large.bands > small.bands)
    assert(recall(small, 0.8) >= 0.9 && recall(large, 0.8) >= 0.9)
    // hard regime (p = 0.6 default): the ideal 10 bits would need ~379
    // bands — derive walks bits DOWN until recall is affordable instead of
    // silently clamping bands and missing the target (the review finding)
    val hard = EmbedLshConfig.derive(60000, dim = 64, targetBucket = 64)
    assert(hard.bits === 6 && hard.bands <= 64)
    assert(recall(hard, 0.6) >= 0.9)
    // and when even the affordable geometry would blow past maxBucket —
    // the skew cap would then skip TYPICAL buckets — derive refuses loudly
    intercept[IllegalArgumentException](
      EmbedLshConfig.derive(10000000L, dim = 64, targetBucket = 64))
    // prime must dominate the plane count, pairwise-distinctness's precondition
    assert(small.prime >= small.bands * small.bits)
    assert(hard.prime >= hard.bands * hard.bits)
    assert(EmbedLshConfig.primeAtLeast(144) === 149)
  }

  test("MinHashConfig.derive lands the S-curve under the confirm threshold") {
    val c = MinHashConfig.derive(jaccardConfirm = 0.8)
    assert(c.rowsPerBand === 3) // largest r with (1/6)^(1/r) <= 0.75*0.8
    assert(c.sCurveThreshold <= 0.75 * 0.8)
    assert(c.numHashes === c.bands * c.rowsPerBand)
    def recallAtConfirm(m: MinHashConfig): Double =
      1 - math.pow(1 - math.pow(m.jaccardConfirm, m.rowsPerBand), m.bands)
    assert(recallAtConfirm(c) >= 0.95)
    // the S-curve RISES with rows-per-band, so a HIGHER confirm threshold
    // affords MORE rows per band (stricter bands, fewer candidates)
    val strict = MinHashConfig.derive(jaccardConfirm = 0.95)
    assert(strict.rowsPerBand > c.rowsPerBand)
    assert(recallAtConfirm(strict) >= 0.95)
    // a confirm below the single-row floor (1/bands) degrades to r = 1
    // (max recall, candidate volume bounded only by maxBucket) — it must
    // never hang searching for an unreachable threshold
    assert(MinHashConfig.derive(jaccardConfirm = 0.05).rowsPerBand === 1)
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

  test("IvfConfig.derive sizes cells to corpus and refuses degenerate shapes") {
    // the sf0.01 fixture inputs reproduce the catalog's (16, 2) — see
    // LlmOps.IvfCfg: ideal k = sqrt(500*2) ~ 32 capped by 30-vector cells
    assert(IvfConfig.derive(500, recallTarget = 0.8, cellHitRate = 0.6,
      minCell = 30) === IvfConfig(16, 2))
    // uncapped regime: k tracks sqrt(n * nprobe), nprobe tracks the recall
    // target through the geometric cell-hit model
    val mid = IvfConfig.derive(100000, recallTarget = 0.8, cellHitRate = 0.6)
    assert(mid.nprobe === 2)
    assert(mid.numCentroids === math.round(math.sqrt(100000.0 * 2)).toInt)
    val strict = IvfConfig.derive(100000, recallTarget = 0.95, cellHitRate = 0.6)
    assert(strict.nprobe > mid.nprobe)
    assert(strict.numCentroids > mid.numCentroids)
    // 4x corpus => ~2x cells at equal recall
    val big = IvfConfig.derive(400000, recallTarget = 0.8, cellHitRate = 0.6)
    assert(math.abs(big.numCentroids - 2 * mid.numCentroids) <= 1)
    // refuse-to-lie: a tiny corpus cannot host enough >= minCell cells for
    // the probes the recall target demands — probing most of the index is
    // brute force with extra steps, so derive throws instead of returning it
    intercept[IllegalArgumentException](
      IvfConfig.derive(64, recallTarget = 0.9, cellHitRate = 0.6))
    // and a recall target the cell-hit rate can't amplify to stays honest:
    // nprobe grows instead of silently under-delivering
    assert(IvfConfig.derive(1000000, recallTarget = 0.99,
      cellHitRate = 0.3).nprobe === math.ceil(math.log(0.01) / math.log(0.7)).toInt)
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
