package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.StreamCdc

/** B134 streaming CDC apply — the StreamCurateSpec convention: the real
  * streaming entry is checked against an independent driver-side staged
  * replay, the batch body is proven idempotent under an at-least-once
  * retry, and the CDC ordering rules (tombstone beats earlier update,
  * higher-seq update resurrects) are pinned on a hand-built changelog. */
class StreamCdcSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def log(rows: Seq[(Long, Long, String, Option[Long])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "seq", "op", "price_cents")
  }

  private def snap(root: String): Seq[(Long, Long, String, Option[Long])] =
    spark.read.parquet(root).collect().map(r => (r.getAs[Long]("k"),
      r.getAs[Long]("seq"), r.getAs[String]("op"),
      Option(r.getAs[java.lang.Long]("price_cents")).map(_.longValue())))
      .toSeq.sortBy(_._1)

  test("hand-built changelog: tombstone beats earlier update, higher-seq update resurrects") {
    val root = scratch("stream_cdc_hand")
    // batch 0: inserts for k=1,2,3
    StreamCdc.applyBatch(log(Seq((1L, 1L, "I", Some(100L)),
      (2L, 1L, "I", Some(200L)), (3L, 1L, "I", Some(300L)))), 0L, root)
    // batch 1: k=1 updated; k=2 deleted; k=3 update AND delete in ONE
    // batch (within-batch max_by must keep the delete, seq 3 > 2)
    StreamCdc.applyBatch(log(Seq((1L, 2L, "U", Some(110L)),
      (2L, 2L, "D", None), (3L, 2L, "U", Some(330L)),
      (3L, 3L, "D", None))), 1L, root)
    // batch 2: k=2 RESURRECTED by a higher-seq update; a LATE low-seq
    // update for k=1 (seq 1 < snapshot's 2) must lose to the snapshot
    StreamCdc.applyBatch(log(Seq((2L, 3L, "U", Some(222L)),
      (1L, 1L, "U", Some(999L)))), 2L, root)
    val live = StreamCdc.readLatest(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Long]("price_cents")).map(_.longValue())))
      .toSeq.sortBy(_._1)
    assert(live === Seq((1L, "U", Some(110L)), (2L, "U", Some(222L))),
      s"live table wrong: $live")
    // version-as-of: at v1 both 2 and 3 are tombstoned
    val asOf1 = StreamCdc.readVersion(spark, root, 1L).collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(asOf1 === Seq(1L), s"AS OF v1 wrong: $asOf1")
  }

  test("retry idempotence: re-applying a batch rewrites byte-identical state") {
    val rootA = scratch("stream_cdc_retry_a")
    val rootB = scratch("stream_cdc_retry_b")
    val batches = Seq(
      log(Seq((1L, 1L, "I", Some(100L)), (2L, 1L, "I", Some(200L)))),
      log(Seq((1L, 2L, "U", Some(150L)), (3L, 2L, "I", Some(300L)))),
      log(Seq((2L, 3L, "D", None))))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamCdc.applyBatch(b, i.toLong, rootA)
    }
    // B: batch 1 is retried mid-stream (at-least-once), then the tail runs
    StreamCdc.applyBatch(batches(0), 0L, rootB)
    StreamCdc.applyBatch(batches(1), 1L, rootB)
    StreamCdc.applyBatch(batches(1), 1L, rootB) // the retry
    StreamCdc.applyBatch(batches(2), 2L, rootB)
    (0 to 2).foreach { v =>
      assert(snap(s"$rootA/v$v") === snap(s"$rootB/v$v"),
        s"version v$v diverged under the retry")
    }
  }

  test("real stream entry equals the manual staged replay and the one-pass batch fold") {
    val got = graft.SparkEntry.queries("q_stream_cdc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Long]("price_cents")).map(_.longValue()))).toSeq
    val onePass = graft.SparkEntry.queries("q_cdc_apply")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Long]("price_cents")).map(_.longValue()))).toSeq
    assert(got === onePass,
      "3 incremental folds diverged from the one-pass latest-wins fold")
    assert(got.nonEmpty && got.exists(_._2 == "U") && got.exists(_._2 == "I"),
      "vacuous: feed exercised no update or no surviving insert")
    assert(onePass.size < graft.Tables.orders(spark, sf).count(),
      "vacuous: no delete ever dropped a key")
  }
}
