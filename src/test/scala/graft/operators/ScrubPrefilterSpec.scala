package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** graft.operators.ScrubPassages (SURVEY.md §2 B82; r11 verdict #6): the
  * CMS prefilter in front of the distinct doc-frequency shuffle must change
  * BYTES, never RESULTS. Soundness argument in the operator scaladoc
  * (occurrences ≥ df and CMS never undercounts); this spec pins the
  * consequence — exact row-for-row output equality on the real fixture —
  * plus non-vacuousness (the fixture actually has frequent passages and the
  * prefiltered plan actually carries the probe). Byte evidence lives in
  * SCALE.md's 100k-doc soak section. */
class ScrubPrefilterSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.01"

  test("prefiltered scrub equals the exact scrub row-for-row") {
    val docs = graft.Tables.documents(spark, sf)
    val exact = ScrubPassages.scrub(docs, prefilter = false)
    val pre = ScrubPassages.scrub(docs, prefilter = true)
    assert(exact.except(pre).isEmpty && pre.except(exact).isEmpty,
      "prefilter changed scrub results")
    // non-vacuous: the fixture must exercise actual removals, else the
    // equality proves nothing about the frequent-passage path
    val removed = exact.agg(sum(col("n_removed"))).head().getLong(0)
    assert(removed > 0, "fixture has no frequent passages to scrub")
  }

  test("the prefiltered plan carries the probe; the exact plan does not") {
    val docs = graft.Tables.documents(spark, sf)
    val prePlan = ScrubPassages.scrub(docs, prefilter = true)
      .queryExecution.executedPlan.toString()
    val exactPlan = ScrubPassages.scrub(docs, prefilter = false)
      .queryExecution.executedPlan.toString()
    // the scala-udf probe plans as a `Filter (UDF(...))`; a bare "UDF"
    // grep would false-positive on Spark 4's UDFAdaptors lambda name
    // inside the sanctioned typed-flatMap MapPartitions (r18: passagesOf)
    assert(prePlan.contains("Filter (UDF("),
      "prefilter probe missing from the plan")
    assert(!exactPlan.contains("Filter (UDF("),
      "the exact (oracled) path must stay scala-udf-free")
  }
}
