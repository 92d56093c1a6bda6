package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-dedup helpers (SURVEY.md §2 B49/B58) shared by the query catalog
  * (q_dedup_bloom_gate) and the scale soak — one operator body, so a fix
  * in either place reaches both (the r8-review discipline that produced
  * [[TextCuration]]). */
object ExactDedup {

  /** Bloom-gated incremental exact dedup — the per-batch form at its real
    * scale shape: `history` is the persisted sha index (one `sha` per
    * distinct historical doc; the CALLER persists it — it is the artifact
    * a production ingest maintains between batches), summarized as a
    * bloom sketch (bits, not rows). A `delta` row ((doc_id, sha)) whose
    * probe MISSES is certainly new (blooms have no false negatives) and
    * never touches the history join at all; only probe HITS (dupes + the
    * fpp false positives) pay the exact anti-join that confirms them.
    *
    * Returns the delta rows that are NEW, with `probe_hit` recording
    * which path proved it: false = bypassed the history join entirely,
    * true = confirmed new by the anti-join. The id set is provably
    * identical to `delta LEFT ANTI JOIN history` regardless of the
    * sketch — an undersized or colliding bloom only demotes certain-new
    * rows to the confirm join, never changes the result (the catalog's
    * oracle states exactly the plain anti-join). The sketch is sized
    * from `history.count()` — a cheap action on the caller-persisted
    * index that doubles as its materialization.
    *
    * Probe = the codegen `bloom_might_contain` kernel (B58) on
    * xxhash64(sha). At 100 TB the sketch is megabytes for billions of
    * docs (~1.2 GB per 10⁹ at fpp 0.01) and ships once per executor as a
    * literal; an all-new batch then streams past the gate with zero
    * shuffle on the history side. */
  def bloomGatedNew(history: DataFrame, delta: DataFrame,
                    fpp: Double = 0.01): DataFrame = {
    val hist = history.select(col("sha"))
    val histN = hist.count()
    // empty history (first batch, or everything tombstoned by a B122
    // retraction): nothing can gate — and Spark's stat.bloomFilter NPEs
    // on zero input rows, so the guard is correctness, not just speed
    if (histN == 0L) return delta.withColumn("probe_hit", lit(false))
    val bf = hist.select(xxhash64(col("sha")).as("k"))
      .stat.bloomFilter("k", histN, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // the probe is computed in ONE projection and both paths branch on the
    // materialized column (r9 review: building the filter expression twice
    // embedded a second copy of the sketch literal in the plan). The
    // two-branch union IS the bypass — only probe hits shuffle to the
    // confirm join — at the cost of two columnar scans of the delta batch;
    // a caller holding the batch in memory (or reading it from parquet, as
    // CurateCli's stages do) pays pruned re-reads, never a second shuffle.
    val probed = delta.withColumn("probe_hit",
      call_function("bloom_might_contain",
        xxhash64(col("sha")), lit(bos.toByteArray)))
    probed.filter(!col("probe_hit"))
      .unionByName(probed.filter(col("probe_hit"))
        .join(hist, Seq("sha"), "left_anti"))
  }
}
