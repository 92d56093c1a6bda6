package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Char-n-gram language identification as a TRAINED LINEAR MODEL
  * (SURVEY.md §2 B52; r14 verdict #4) — the production form of LID
  * (fasttext lid.176, CLD3: character-n-gram features into a linear
  * classifier) next to the q_text_langid stopword heuristic, built on the
  * B71 [[LinearScorer]] dataflow: model = a (lang, gram → weight) table,
  * score = sum of matched feature weights, predict = per-doc argmax.
  *
  * Training is SUPERVISED on the labeled `lang` column over a train split:
  * weight(l, g) = ppm frequency of char-n-gram g within language l's
  * training text (`c·1e6 DIV t` — the exact-integer discipline, so scores
  * hash-compare cross-engine; a real pipeline swaps in trained logistic
  * weights and nothing else changes). Gram extraction is CHARACTER-based
  * substring semantics in both engines (multibyte-safe — the zh fixture
  * text exercises it); documents shorter than n characters produce no
  * grams and predict as 'und', stated not silent.
  *
  * Scale posture (100 TB): the heavy path carries (doc_id, gram) rows
  * only; the model is (langs × bounded vocabulary) and rides BROADCAST,
  * so scoring is map-side — the shuffles are the per-(doc, lang) sum and
  * the per-doc argmax, both keyed on the document. The argmax is a
  * partial+final `min(struct(-score, lang))` — no window, no sort. */
object LangId {

  /** All char n-grams of `text` (1-based substring, character semantics).
    * Callers must pre-filter length(text) >= n: Spark's
    * `sequence(1, length-n+1)` DESCENDS on shorter strings instead of
    * returning empty (the [[Bpe.symbolTable]] caveat). */
  private def grams(n: Int): Column =
    expr(s"transform(sequence(1, length(text) - ${n - 1}), " +
      s"i -> substring(text, i, $n))")

  /** Train the (lang, gram, w_ppm) model: per-language n-gram ppm
    * frequencies over grams with count >= minCount in that language. */
  def model(docs: DataFrame, n: Int, minCount: Long): DataFrame = {
    require(n >= 1, s"n ($n) must be >= 1")
    require(minCount >= 1, s"minCount ($minCount) must be >= 1")
    val g = docs.filter(length(col("text")) >= n)
      .select(col("lang"), explode(grams(n)).as("gram"))
    val cnt = g.groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("t"))
    cnt.join(tot, "lang").filter(col("c") >= minCount)
      .select(col("lang"), col("gram"), expr("c * 1000000 DIV t").as("w_ppm"))
  }

  /** Score every document against every language and keep the argmax
    * (score DESC, lang ASC tie-break): (doc_id, pred, score). Documents
    * with no in-vocabulary grams are ABSENT — callers left-join and map
    * the miss to 'und' (the oracle does the same). */
  def predict(docs: DataFrame, modelTable: DataFrame, n: Int): DataFrame = {
    val g = docs.filter(length(col("text")) >= n)
      .select(col("doc_id"), explode(grams(n)).as("gram"))
    g.join(broadcast(modelTable), Seq("gram"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("w_ppm")).as("score"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("ns"), col("lang").as("lang"))).as("b"))
      .select(col("doc_id"), col("b.lang").as("pred"),
        (-col("b.ns")).as("score"))
  }
}
