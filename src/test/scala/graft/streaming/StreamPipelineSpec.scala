package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import graft.ingestion.{Fixtures, MetadataPipeline, model}

/** B6/B45/A16/A17: the streaming ingestion mode (binaryFile readStream +
  * foreachBatch multi-sink) produces byte-for-byte the same sink content as
  * the batch mode, and the checkpoint makes re-runs no-ops. */
class StreamPipelineSpec extends SparkSpecBase {

  private val ts1 = new Timestamp(1767225600000L)

  test("Trigger.AvailableNow streaming run == batch run; restart is a no-op") {
    val in = Fixtures.writeCorpus(scratch("spipe-in"))
    val whB = scratch("spipe-wh-batch")
    val whS = scratch("spipe-wh-stream")

    MetadataPipeline.runBatch(spark, model.IngestionConfig(in, whB), ts1)

    val cfgS = model.IngestionConfig(in, whS)
    val q = MetadataPipeline.runStream(spark, cfgS, ingestTs = Some(ts1))
    q.awaitTermination()

    def snap(wh: String, zone: String, cols: Seq[String]): Seq[String] = {
      val p = s"$wh/$zone"
      if (!new java.io.File(p).exists()) Seq.empty
      else spark.read.parquet(p).selectExpr(cols: _*)
        .collect().map(_.toString).toSeq.sorted
    }
    val zones = Seq(
      (model.Zone.Workflow, Seq("isbn", "book_title", "book_genre", "nr_of_chapters")),
      (model.Zone.Raw, Seq("zip_name", "sha2(content, 256)")),
      (model.Zone.DeadLetter, Seq("zip_name", "error_code")))
    zones.foreach { case (z, cols) =>
      assert(snap(whS, z, cols) === snap(whB, z, cols), s"zone $z")
      assert(snap(whS, z, cols).nonEmpty, s"zone $z empty")
    }

    // restart against the same checkpoint: no new files → sinks unchanged
    val q2 = MetadataPipeline.runStream(spark, cfgS, ingestTs = Some(ts1))
    q2.awaitTermination()
    zones.foreach { case (z, cols) =>
      assert(snap(whS, z, cols) === snap(whB, z, cols), s"zone $z after restart")
    }
  }
}
