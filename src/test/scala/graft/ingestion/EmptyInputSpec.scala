package graft.ingestion

import java.sql.Timestamp

import graft.SparkSpecBase
import model.IngestionConfig

/** Operational edges: a poll against an empty or missing input directory
  * must be a clean no-op (the reference's executer just finds no files),
  * not an analysis error. */
class EmptyInputSpec extends SparkSpecBase {
  private val ts = new Timestamp(1767225600000L)

  test("empty input directory → zero-row outputs, no sink dirs created") {
    val in = scratch("empty-in")
    val wh = scratch("empty-wh")
    val out = MetadataPipeline.runBatch(spark, IngestionConfig(in, wh), ts)
    assert(out.newWorkflow.count() === 0)
    assert(out.deadLetter.count() === 0)
    assert(out.skipped.count() === 0)
  }

  test("missing input directory → clean empty batch") {
    val wh = scratch("missing-wh")
    val cfg = IngestionConfig(scratch("missing-in") + "/does-not-exist", wh)
    val out = MetadataPipeline.runBatch(spark, cfg, ts)
    assert(out.newWorkflow.count() === 0)
  }
}
