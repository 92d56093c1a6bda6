package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear text-quality scorer — the "apply a trained classifier to the whole
  * corpus" dataflow (SURVEY.md §2 B71), the shape of every
  * fasttext/logistic-regression quality filter in a large-scale curation
  * pipeline (CCNet/fineweb-style): model = a (term → weight) table, score =
  * the sum of matched token weights, keep = score ≥ threshold.
  *
  * The model here is self-contained and deterministic — vocabulary = terms
  * with corpus frequency ≥ minCount, weight = a signed integer micro-logit
  * derived from md5(term) — because the engine's job is the APPLY dataflow,
  * not the training: a real pipeline swaps in its trained weight table and
  * nothing else changes.
  *
  * Scale posture (100 TB): the heavy path carries (doc_id, term) token rows
  * only; the model is vocabulary-sized (≪ corpus — fasttext vocabularies are
  * a few million rows) and rides as a BROADCAST build side, so scoring is
  * map-side — the only shuffle is the per-doc sum on doc_id. Integer
  * micro-logits end to end: the per-doc score is an order-free exact int64
  * sum (|score| ≤ n_toks·1000 ≪ 2^63), so results hash-compare across
  * engines and partition orders. OOV tokens score 0 via the left join —
  * docs made entirely of unseen tokens get logit 0, which the threshold
  * must (and does) handle explicitly.
  */
object LinearScorer {

  /** Signed micro-logit in [-1000, 1000] from md5(term) — the deterministic
    * stand-in for trained weights (same expression in the DuckDB oracle). */
  private[graft] def weightMicro(term: org.apache.spark.sql.Column) =
    NearDup.h28(term) % 2001 - 1000

  /** Derive the (term, w_micro) model table: vocabulary = corpus frequency
    * ≥ minCount. One partial+final count aggregate over the token stream. */
  def model(docs: DataFrame, minCount: Int): DataFrame = {
    require(minCount >= 1, s"minCount ($minCount) must be >= 1")
    docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("term"), weightMicro(col("term")).as("w_micro"))
  }

  /** Score every document against the model: (doc_id, n_toks, logit_micro,
    * keep). The model side is broadcast; OOV terms contribute 0. */
  def score(docs: DataFrame, modelTable: DataFrame, thresholdMicro: Long): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(modelTable), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("w_micro"), lit(0L))).as("logit_micro"))
      .withColumn("keep", col("logit_micro") >= thresholdMicro)

  /** The SHUFFLE-FREE scoring form for streams: the model table collapses
    * to a driver-side Map (vocabulary-sized — the same O(model) collect as
    * Ann's centroid state) broadcast inside a scalar UDF that sums the
    * token weights of one document per call. No explode, no per-doc
    * aggregation state — scoring a stream stays STATELESS (each doc is one
    * row in one micro-batch), which is what makes online scoring viable on
    * an unbounded stream. The UDF runs once per document row — the
    * cheap-per-row / shuffle-avoiding side of the UDF trade (the
    * q_heavy_hitters probe precedent), not a hot-loop-under-explode. */
  def scoreUdf(modelTable: DataFrame): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val m: Map[String, Long] = modelTable.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = modelTable.sparkSession.sparkContext.broadcast(m)
    // null text scores 0 — the no-tokens-matched value, NOT a dropped row
    // (r10 ADVICE: the first cut NPE'd here while the join+agg form silently
    // dropped the doc via explode-of-null; neither was a decision). 0 is the
    // all-OOV logit, so the threshold handles null and unseen text the same
    // way; callers wanting nulls gone filter them explicitly upstream.
    udf { text: String =>
      if (text == null) 0L
      else {
        var s = 0L
        text.split(" ", -1).foreach(t => s += bc.value.getOrElse(t, 0L))
        s
      }
    }
  }
}
