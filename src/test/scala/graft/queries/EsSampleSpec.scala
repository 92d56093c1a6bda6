package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** B108 Efraimidis–Spirakis exact-k weighted sampling: every catalog field
  * against an independent driver-side recompute (MessageDigest md5, plain
  * scala.math.log — zero shared SQL), the without-replacement and exact-k
  * contracts, the ES key-monotonicity property the algorithm's weighting
  * rests on, and the measured weight bias on the live fixture.
  */
class EsSampleSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  /** Driver-side reference: 28-bit md5 hash of "<id>_es", the ES log-key,
    * the same tie-safe round-9. */
  private def refKey(docId: Long, nChars: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${docId}_es".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(7)
    val h = java.lang.Long.parseLong(hex, 16)
    val raw = math.log((h + 1) / 268435456.0) / math.max(nChars, 1L)
    math.floor(raw * 1e9 + 0.5) / 1e9
  }

  test("catalog sample equals an independent driver-side ES recompute, all fields") {
    val rows = SparkEntry.queries("q_sample_es")(spark, sf).collect()
    assert(rows.length === 100)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = docs
      .map { case (id, nc) => (refKey(id, nc), id, nc) }
      .sortBy { case (k, id, _) => (-k, id) }
      .take(100)
    rows.zip(expected).zipWithIndex.foreach { case ((got, (k, id, nc)), i) =>
      assert(got.getLong(0) === i + 1L, s"rank at $i")
      assert(got.getLong(1) === id, s"doc_id at rank ${i + 1}")
      assert(got.getLong(2) === nc, s"n_chars at rank ${i + 1}")
      assert(got.getDouble(3) === k, s"key9 at rank ${i + 1}")
    }
  }

  test("without replacement and exact-k: 100 distinct doc_ids") {
    val ids = SparkEntry.queries("q_sample_es")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(ids.length === 100 && ids.distinct.length === 100)
  }

  test("ES key monotonicity: raising an item's weight never lowers its key") {
    // ln(u)/w is negative; a larger w moves it toward 0 — the property
    // that makes heavier items likelier winners for EVERY draw u.
    for (id <- 1L to 50L; w1 <- Seq(1L, 10L, 400L)) {
      assert(refKey(id, w1 * 2) >= refKey(id, w1),
        s"key must be nondecreasing in weight (id=$id, w=$w1)")
    }
  }

  test("measured weight bias: the sample over-represents long docs") {
    // inclusion under ES is weight-biased; compare the sample's median
    // n_chars against the corpus median — deterministic on the fixture.
    val sampleMed = SparkEntry.queries("q_sample_es")(spark, sf)
      .agg(expr("percentile(n_chars, 0.5)")).collect()(0).getDouble(0)
    val corpusMed = graft.Tables.documents(spark, sf)
      .agg(expr("percentile(n_chars, 0.5)")).collect()(0).getDouble(0)
    assert(sampleMed > corpusMed,
      s"sample median $sampleMed should exceed corpus median $corpusMed")
  }
}
