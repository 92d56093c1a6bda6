package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The motivating case for [[NearDup.containmentPairs]] (SURVEY §2 B50):
  * a short document quoted WHOLE inside a long one. Its Jaccard vs the
  * host is |short|/|long| — arbitrarily low, so minhash near-dup never
  * confirms it — while its containment is exactly 1. This spec plants
  * that shape and proves both halves: containment finds the planted pair
  * at ppm 1,000,000 and nothing else; minhashPairs (the 0.8-Jaccard
  * confirm) finds nothing.
  */
class ContainmentSpec extends SparkSpecBase {

  /** 6-hex-char word from (seed, j) — distinct across seeds in practice. */
  private def w(seed: Long, j: org.apache.spark.sql.Column) =
    substring(md5(concat_ws("_", lit(seed), j)), 1, 6)

  /** 50 long docs of 60 unique words each; doc 100 = tokens 10..29 of
    * doc 0 (a 20-token verbatim quote — every one of its 18 3-shingles
    * occurs in doc 0). */
  private def corpus: DataFrame = {
    val long = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(59)),
        j => w(-1, concat_ws("_", col("id"), j)))).as("text"))
    val quote = spark.range(100, 101).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(10), lit(29)),
        j => w(-1, concat_ws("_", lit(0), j)))).as("text"))
    long.unionByName(quote)
  }

  test("a verbatim quote is found by containment at ppm 1e6 and missed by Jaccard minhash") {
    val docs = corpus
    val cont = NearDup.containmentPairs(docs).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      === Set((0L, 100L, 1000000L)),
      s"expected exactly the planted (0, 100) full containment, got ${cont.toSeq}")
    // 18 shared shingles out of the quote's 18 — intersection is the
    // whole smaller set
    assert(cont.head.getLong(2) === 18L)

    // the same pair under Jaccard: 18/(58+18-18) ≈ 0.31 — far below the
    // 0.8 confirm, so the minhash path reports NOTHING on this corpus
    val jac = NearDup.minhashPairs(docs,
      MinHashConfig.derive(jaccardConfirm = 0.8))
    assert(jac.count() === 0L,
      "Jaccard-based near-dup must miss the subset duplicate (that gap is " +
        "why containmentPairs exists); if this ever fires, the corpus " +
        "generator broke")
  }

  test("the df cap drops boilerplate shingles from numerator and denominator both") {
    // append one boilerplate sentence to every doc: its interior shingles
    // have df = 51 > maxDf = 50, so they are dropped from BOTH sides of
    // the score. Without the cap they would INFLATE containment (every
    // doc "contains" every other doc's boilerplate); with it, the planted
    // quote scores 18/20: its 18 quote shingles (all shared with doc 0)
    // plus exactly 2 discriminative SEAM shingles where the quote meets
    // the boilerplate (token windows straddling the join are unique to
    // doc 100 — df 1, correctly kept, correctly unshared).
    val boiler = concat_ws(" ", transform(sequence(lit(0), lit(9)),
      j => w(-2, j)))
    val docs = corpus.select(col("doc_id"),
      concat_ws(" ", col("text"), boiler).as("text"))
    val cont = NearDup.containmentPairs(docs, maxDf = 50).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      === Set((0L, 100L, 18L, 900000L)),
      s"expected 18/20 = 900000 ppm over the discriminative set, got ${cont.toSeq}")
  }
}
