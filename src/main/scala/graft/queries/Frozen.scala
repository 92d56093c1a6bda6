package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Frozen OFFLINE artifacts for the index-lifecycle entries (r15 verdict
  * #6): the insert / delete / search / serve entries measure index
  * MAINTENANCE and SERVING, but each used to rebuild its frozen input
  * state (the NN-descent graph, the PQ codebook + codes) inline — ~60 s
  * per bench sweep of repeated offline training that production pays
  * ONCE and then reads from storage. This helper IS that storage:
  * build-once per (tag, sf) into a parquet dir under
  * `target/qscratch/frozen/` ([[graft.BuildOnce]] serializes across
  * threads and JVMs), read back by every entry and every sweep — the
  * actual production dataflow for maintained-index operations, and the
  * reason the affected entries' bench baselines were re-frozen in r16.
  *
  * Correctness is untouched: every artifact is a deterministic function
  * of the fixture, and the DuckDB oracles replay the FULL timeline
  * INCLUDING the offline training — a stale or corrupted artifact
  * hash-mismatches its oracle instead of passing silently. Entries whose
  * MEASURED SUBJECT is the training itself (q_embed_pq*, q_embed_ivfpq*,
  * q_embed_kmeans, q_embed_knn_graph) deliberately do NOT use this:
  * caching there would fake the headline number (the verify-skill rule —
  * "don't fix them by caching across queries").
  *
  * The `_v1` version segment in every tag is the staleness contract:
  * bump it when an operator change alters an artifact's contents (the
  * oracle gate catches a stale read loudly; the bump is the fix that
  * doesn't require hunting scratch dirs).
  */
object Frozen {
  /** Read the artifact `tag` for fixture `d`, building it first if this
    * is the first reader ever (across processes). */
  def parquet(s: SparkSession, d: String, tag: String)
             (build: => DataFrame): DataFrame = {
    val dir = new File("target/qscratch/frozen/" +
      tag + "_" + d.replaceAll("[^a-zA-Z0-9.]", "_"))
    val data = new File(dir, "data")
    graft.BuildOnce(dir) {
      build.write.mode("overwrite").parquet(data.getPath)
    }
    s.read.parquet(data.getPath)
  }
}
