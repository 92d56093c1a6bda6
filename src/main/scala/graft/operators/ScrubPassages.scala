package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-doc frequent-passage scrub core (SURVEY.md §2 B82 — Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better":
  * repeated long substrings across documents are memorization fuel; this
  * removes every token covered by a `w`-token passage appearing in ≥
  * `minDf` distinct docs, and emits per-doc before/removed counts plus the
  * sha-256 of the exactly-reconstructed scrubbed text).
  *
  * Shared by the catalog entry (exact path — the DuckDB-oracled form), the
  * prefilter-equality spec, and the 10× soak. `prefilter = true` inserts
  * the [[HeavyHitters]] count-min-sketch probe BEFORE the distinct
  * doc-frequency shuffle — the 100 TB posture the entry's scaladoc
  * documents, here implemented and measured instead of claimed:
  *
  *  - SOUND for the df threshold: occurrences ≥ distinct-doc df, and a
  *    CMS never undercounts, so `estimate(gram) < minDf` proves
  *    df < minDf — the probe can only pass through grams the exact path
  *    would also test, never drop one it would keep;
  *  - it changes SHUFFLE BYTES, never results: the survivors still go
  *    through the exact distinct + df ≥ minDf aggregate
  *    (ScrubPrefilterSpec pins output equality; the SCALE.md soak
  *    measures the byte reduction on the 100k-doc corpus);
  *  - the probe UDF runs once per gram row pre-shuffle — the
  *    q_heavy_hitters broadcast-model pattern, the shuffle-avoiding side
  *    of the UDF trade.
  */
object ScrubPassages {

  /** All (pos, w-token passage) of one text — exactly the relational
    * `transform(sequence(0, size(t)−w), i → array_join(slice(t, i+1, w),
    * ' '))` over `split(text, ' ')` (split keeps trailing empties: Spark's
    * StringSplit uses limit −1), emitted pos-ascending. r18: a typed
    * flatMap in the scan stage — the HOF transform-under-explode form it
    * replaces is CodegenFallback and profiled as the entry's dominant
    * single-task stage (the LangId gramsOf lesson); emissions are
    * value-identical, and a text with fewer than w tokens (or null)
    * emits nothing, exactly the old `size(t) >= w` pre-filter. */
  private[operators] def passagesOf(text: String, w: Int): Iterator[(Int, String)] = {
    if (text == null) return Iterator.empty
    val t = text.split(" ", -1)
    if (t.length < w) Iterator.empty
    else (0 to t.length - w).iterator.map(i => (i, t.slice(i, i + w).mkString(" ")))
  }

  def scrub(docs: DataFrame, w: Int = 8, minDf: Long = 3,
            prefilter: Boolean = false): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val grams = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, tx) => passagesOf(tx, w).map(pg => (id, pg._1, pg._2)) }
      .toDF("doc_id", "p", "gram")
    val gramRows = grams.select(col("gram"), col("doc_id"))
    val pre =
      if (!prefilter) gramRows
      else {
        val cms = HeavyHitters.sketch(gramRows, "gram")
        val bc = docs.sparkSession.sparkContext.broadcast(cms)
        val mightBeFrequent = udf { (v: String) =>
          v != null && bc.value.estimateCount(v) >= minDf
        }
        gramRows.filter(mightBeFrequent(col("gram")))
      }
    val freq = pre.distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select(col("gram"))
    val covered = grams.join(freq, "gram")
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (w - 1))).as("pos"))
      .distinct()
    val tokens = base
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
    val scrubbed = tokens.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("scrubbed"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(scrubbed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        sha2(coalesce(col("scrubbed"), lit("")), 256).as("scrubbed_sha"))
  }
}
