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

  /** All char n-grams of one text (code-point semantics — exactly Spark's
    * `substring(text, i, n)` over `sequence(1, length(text)-n+1)`, which
    * counts CHARACTERS, not UTF-16 units; the zh fixture exercises
    * multibyte). r17: a typed flatMap in the scan stage — the HOF
    * transform-under-explode form this replaces is CodegenFallback and
    * profiled as the entry's dominant stage (the shingleRows lesson,
    * verify-skill gotcha); emissions are value-identical, and a text
    * shorter than n code points emits nothing, which is exactly the old
    * `length(text) >= n` pre-filter. */
  private def gramsOf(text: String, n: Int): Iterator[String] = {
    // null text emits nothing — the pre-r17 relational form's
    // length(text) >= n filter silently dropped null rows; the typed
    // flatMap must preserve that, not NPE (r17 ADVICE)
    if (text == null) return Iterator.empty
    val cp = text.codePointCount(0, text.length)
    if (cp < n) Iterator.empty
    else new Iterator[String] {
      private var start = 0
      private var i = 0
      def hasNext: Boolean = i <= cp - n
      def next(): String = {
        val end = text.offsetByCodePoints(start, n)
        val out = text.substring(start, end)
        start = text.offsetByCodePoints(start, 1)
        i += 1
        out
      }
    }
  }

  /** Train the (lang, gram, w_ppm) model: per-language n-gram ppm
    * frequencies over grams with count >= minCount in that language. */
  def model(docs: DataFrame, n: Int, minCount: Long): DataFrame = {
    require(n >= 1, s"n ($n) must be >= 1")
    require(minCount >= 1, s"minCount ($minCount) must be >= 1")
    val s = docs.sparkSession
    import s.implicits._
    val g = docs.select(col("lang"), col("text")).as[(String, String)]
      .flatMap { case (lang, text) => gramsOf(text, n).map((lang, _)) }
      .toDF("lang", "gram")
    // r17: cnt feeds its own total AND the join below — cut it once
    // instead of re-running the gram fan-out per consumer (profiled 2x)
    val cnt = Materialize.cutFinal(
      g.groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c")))
    val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("t"))
    cnt.join(tot, "lang").filter(col("c") >= minCount)
      .select(col("lang"), col("gram"), expr("c * 1000000 DIV t").as("w_ppm"))
  }

  /** Score every document against every language and keep the argmax
    * (score DESC, lang ASC tie-break): (doc_id, pred, score). Documents
    * with no in-vocabulary grams are ABSENT — callers left-join and map
    * the miss to 'und' (the oracle does the same). */
  def predict(docs: DataFrame, modelTable: DataFrame, n: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val g = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => gramsOf(text, n).map((id, _)) }
      .toDF("doc_id", "gram")
    g.join(broadcast(modelTable), Seq("gram"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("w_ppm")).as("score"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("ns"), col("lang").as("lang"))).as("b"))
      .select(col("doc_id"), col("b.lang").as("pred"),
        (-col("b.ns")).as("score"))
  }
}
