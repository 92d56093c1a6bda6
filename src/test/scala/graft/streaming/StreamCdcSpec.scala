package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.StreamCdc

/** B134 streaming CDC apply over the BUCKETED versioned layout (r17) —
  * the StreamCurateSpec convention: the real streaming entry is checked
  * against an independent driver-side staged replay, the batch body is
  * proven idempotent under an at-least-once retry, the CDC ordering rules
  * (tombstone beats earlier update, higher-seq update resurrects) are
  * pinned on a hand-built changelog, and the r16-verdict scale asks are
  * pinned as theorems: bucket-pruned fold ≡ full-rewrite fold under a
  * mid-stream retry, a narrow batch writes only its touched buckets, and
  * vacuum keeps every surviving AS-OF read byte-identical while making
  * horizon−1 fail loudly (manifest tightness). */
class StreamCdcSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def log(rows: Seq[(Long, Long, String, Option[Long])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "seq", "op", "price_cents")
  }

  /** Full snapshot state (incl. tombstones) at version v, sorted. */
  private def snap(root: String, v: Long): Seq[(Long, Long, String, Option[Long])] =
    StreamCdc.readVersionFull(spark, root, v).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("seq"),
        r.getAs[String]("op"),
        Option(r.getAs[java.lang.Long]("price_cents")).map(_.longValue())))
      .toSeq.sortBy(_._1)

  private def liveRows(root: String): Seq[(Long, String, Option[Long])] =
    StreamCdc.readLatest(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Long]("price_cents")).map(_.longValue())))
      .toSeq.sortBy(_._1)

  private def bucketDirs(root: String, v: Long): Seq[String] = {
    val d = new java.io.File(s"$root/v$v/data")
    d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName).toSeq.sorted
  }

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
    assert(liveRows(root) === Seq((1L, "U", Some(110L)), (2L, "U", Some(222L))),
      s"live table wrong: ${liveRows(root)}")
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
    (0L to 2L).foreach { v =>
      assert(snap(rootA, v) === snap(rootB, v),
        s"version v$v diverged under the retry")
    }
  }

  test("equal-seq conflict in one batch resolves deterministically (max struct(seq,op,price))") {
    // two ops for the same (k, seq) — the r16-advice nondeterminism trap:
    // the winner must be the struct-max (5,'U',100) > (5,'D',null) on
    // EVERY attempt, or retries rewrite different state
    val conflict = log(Seq((1L, 5L, "U", Some(100L)), (1L, 5L, "D", None)))
    val roots = Seq(scratch("stream_cdc_tie_a"), scratch("stream_cdc_tie_b"))
    roots.foreach(r => StreamCdc.applyBatch(conflict, 0L, r))
    roots.foreach { r =>
      assert(snap(r, 0L) === Seq((1L, 5L, "U", Some(100L))),
        s"equal-seq winner not the deterministic struct-max in $r")
    }
  }

  test("bucket-pruned fold ≡ full-rewrite fold byte-identically under a mid-stream retry; narrow batch writes only touched buckets") {
    val nb = 8
    // pick 5 keys that all hash into ONE bucket so batch 1 is genuinely
    // narrow (the key→bucket map is the engine's own expression)
    val kb = spark.range(200).select(col("id"),
        pmod(xxhash64(col("id")), lit(nb.toLong)).cast("int").as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val target = kb(0L)
    val narrowKeys = kb.filter(_._2 == target).keys.toSeq.sorted.take(5)
    assert(narrowKeys.size == 5, "fixture too small to find 5 same-bucket keys")
    val b0 = log((0L until 64L).map(k => (k, 1L, "I", Some(k * 10))))
    val b1 = log(narrowKeys.map(k => (k, 2L, "U", Some(k * 10 + 1))))
    val b2 = log(Seq((narrowKeys.head, 3L, "D", None),
      (63L, 3L, "U", Some(7777L))))
    val pruned = scratch("stream_cdc_pruned") // 8 buckets, retried batch 1
    val full = scratch("stream_cdc_full")     // 1 bucket = full rewrite/batch
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamCdc.applyBatch(b, i.toLong, full, numBuckets = 1)
    }
    StreamCdc.applyBatch(b0, 0L, pruned, numBuckets = nb)
    StreamCdc.applyBatch(b1, 1L, pruned, numBuckets = nb)
    StreamCdc.applyBatch(b1, 1L, pruned, numBuckets = nb) // mid-stream retry
    StreamCdc.applyBatch(b2, 2L, pruned, numBuckets = nb)
    (0L to 2L).foreach { v =>
      assert(snap(pruned, v) === snap(full, v),
        s"bucket-pruned v$v diverged from the full fold")
    }
    assert(liveRows(pruned) === liveRows(full), "live tables diverged")
    // write ∝ touched buckets: v0 spans many buckets, v1 exactly one
    assert(bucketDirs(pruned, 0L).size > 1, "vacuous: b0 landed in one bucket")
    assert(bucketDirs(pruned, 1L) === Seq(s"bucket=$target"),
      s"narrow batch rewrote ${bucketDirs(pruned, 1L)} — pruning broken")
  }

  test("vacuum: surviving AS-OF reads byte-identical, horizon−1 fails loudly, purge manifest tight") {
    val nb = 4
    val root = scratch("stream_cdc_vacuum")
    val kb = spark.range(200).select(col("id"),
        pmod(xxhash64(col("id")), lit(nb.toLong)).cast("int").as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val target = kb(0L)
    val narrowKeys = kb.filter(_._2 == target).keys.toSeq.sorted.take(3)
    StreamCdc.applyBatch(
      log((0L until 64L).map(k => (k, 1L, "I", Some(k * 10)))), 0L, root, nb)
    StreamCdc.applyBatch(
      log(Seq((1L, 2L, "D", None), (2L, 2L, "U", Some(42L)))), 1L, root, nb)
    // batch 2 touches ONLY bucket `target`, so v2's manifest still
    // references v0/v1 dirs for the other buckets — vacuum must keep those
    StreamCdc.applyBatch(
      log(narrowKeys.map(k => (k, 3L, "U", Some(k * 10 + 3)))), 2L, root, nb)
    val before2 = snap(root, 2L)
    val beforeLive = liveRows(root)
    val report = StreamCdc.vacuum(spark, root, horizon = 2L)
    // surviving horizon unchanged, byte for byte
    assert(snap(root, 2L) === before2, "AS-OF 2 changed under vacuum")
    assert(liveRows(root) === beforeLive, "live read changed under vacuum")
    // tightness: horizon−1 (and below) now fails loudly, never a partial read
    intercept[IllegalArgumentException] { StreamCdc.readVersion(spark, root, 1L) }
    intercept[IllegalArgumentException] { StreamCdc.readVersion(spark, root, 0L) }
    // the purge is real and minimal: v0/v1 manifests deleted, referenced
    // bucket dirs kept, and the durable purge manifest records it
    assert(report.deleted.exists(_.endsWith("_manifest.json")),
      "no manifest was purged — horizon never tightened")
    assert(report.keptReferenced.nonEmpty,
      "vacuous: narrow v2 should leave v0/v1 buckets referenced and kept")
    report.keptReferenced.foreach { p =>
      assert(new java.io.File(new java.net.URI(p).getPath).exists() ||
        new java.io.File(p).exists(), s"kept-referenced dir missing: $p")
    }
    assert(new java.io.File(s"$root/_vacuum.json").exists(),
      "durable purge manifest not written")
    // idempotent: a re-run deletes nothing new
    val again = StreamCdc.vacuum(spark, root, horizon = 2L)
    assert(again.deleted.isEmpty, s"vacuum re-run deleted: ${again.deleted}")
  }

  test("rebase: one self-contained version, deep vacuum reclaims the whole chain, reads byte-identical") {
    val nb = 4
    val root = scratch("stream_cdc_rebase")
    StreamCdc.applyBatch(
      log((0L until 64L).map(k => (k, 1L, "I", Some(k * 10)))), 0L, root, nb)
    StreamCdc.applyBatch(
      log(Seq((1L, 2L, "D", None), (2L, 2L, "U", Some(42L)))), 1L, root, nb)
    StreamCdc.applyBatch(
      log(Seq((5L, 3L, "U", Some(55L)))), 2L, root, nb)
    val beforeFull = snap(root, 2L)
    val beforeLive = liveRows(root)
    // rebasing below the committed head is refused — it would shadow newer state
    intercept[IllegalArgumentException] { StreamCdc.rebase(spark, root, 2L) }
    StreamCdc.rebase(spark, root, 10L)
    // the rebased version holds every live bucket locally, state unchanged
    assert(snap(root, 10L) === beforeFull, "rebase changed full state")
    assert(liveRows(root) === beforeLive, "rebase changed the live read")
    assert(bucketDirs(root, 10L).nonEmpty)
    // deep vacuum: with a self-contained head, the ENTIRE old chain goes —
    // nothing below the horizon is referenced anymore
    val report = StreamCdc.vacuum(spark, root, horizon = 10L)
    assert(report.keptReferenced.isEmpty,
      s"rebase should unpin every old dir, kept: ${report.keptReferenced}")
    Seq(0L, 1L, 2L).foreach { v =>
      assert(!new java.io.File(s"$root/v$v").exists(),
        s"v$v survived a post-rebase deep vacuum")
      intercept[IllegalArgumentException] { StreamCdc.readVersion(spark, root, v) }
    }
    assert(snap(root, 10L) === beforeFull, "deep vacuum changed the rebased state")
    assert(liveRows(root) === beforeLive)
    // a later rebase on top is deterministic: same state again
    StreamCdc.rebase(spark, root, 20L)
    assert(snap(root, 20L) === beforeFull)
  }

  test("applyBatch below a rebase/vacuum horizon fails loudly instead of folding against empty state") {
    val nb = 4
    val root = scratch("stream_cdc_rebase_guard")
    StreamCdc.applyBatch(
      log((0L until 32L).map(k => (k, 1L, "I", Some(k * 10)))), 0L, root, nb)
    StreamCdc.applyBatch(
      log(Seq((3L, 2L, "U", Some(33L)))), 1L, root, nb)
    StreamCdc.rebase(spark, root, 10L)
    StreamCdc.vacuum(spark, root, horizon = 10L)
    // a replay of batch 3 would find no version below it — the guard turns
    // silent fold-against-empty (data loss) into an error
    intercept[IllegalArgumentException] {
      StreamCdc.applyBatch(log(Seq((4L, 3L, "U", Some(44L)))), 3L, root, nb)
    }
    // the stream continuing ABOVE the rebase id folds correctly
    StreamCdc.applyBatch(log(Seq((4L, 3L, "U", Some(44L)))), 11L, root, nb)
    val live = liveRows(root)
    assert(live.collectFirst { case (4L, _, p) => p }.flatten === Some(44L))
    assert(live.collectFirst { case (3L, _, p) => p }.flatten === Some(33L))
    assert(live.size === 32)
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
    // the vacuumed entry reads the same live table through a purged layout
    val vac = graft.SparkEntry.queries("q_stream_cdc_vacuum")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Long]("price_cents")).map(_.longValue()))).toSeq
    assert(vac === onePass, "post-vacuum live read diverged from the fold")
  }
}
