package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level text-curation scoring operators (SURVEY.md §2 B52), shared
  * by the oracle catalog (`graft.queries.LlmOps`) and the scale soak so the
  * two can never drift apart (the r8 review found the soak carrying
  * copy-pasted bodies of all three — a catalog fix would not have reached
  * the soak, which would then keep green-lighting a shape the catalog no
  * longer ships). Input contract: `docs` has `doc_id: long, text: string`.
  *
  * Cross-engine discipline (the differential gate hash-compares against
  * DuckDB): every rational ships as exact integer ppm / micro-nats, BM25's
  * constants are written as the SAME decimal literals the oracle uses (a
  * Scala-computed `k1 + 1` lands on a round-to-even tie against the SQL
  * literal 2.2), and per-term float contributions are added in WRITTEN
  * order, never via a float SUM over an unordered group.
  */
object TextCuration {

  /** Corpus-wide paragraph (boilerplate) dedup — the CCNet shape: cut
    * every doc into disjoint `windowTokens`-token windows (the paragraph
    * proxy), hash each, flag windows whose hash occurs in ≥ `minDocs`
    * DISTINCT documents (headers, footers, navigation chrome — the text
    * that survives document-level dedup because the surrounding doc
    * differs). Exact integer arithmetic end to end. Shape at 100 TB:
    * windows from a typed flatMap in the scan stage; ONE
    * (hash → distinct-doc count) aggregate bounded by the distinct-window
    * count; per-doc rollup partial+final.
    *
    * @return (doc_id, n_windows, n_boiler, boiler_ppm), unordered. */
  def boilerplate(docs: DataFrame, windowTokens: Int = 16,
                  minDocs: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val win = docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val tk = text.split(" ", -1)
        Iterator.range(0, tk.length, windowTokens)
          .map(st => (id, st, tk.slice(st, st + windowTokens).mkString(" ")))
      }.toDF("doc_id", "start", "w")
      .withColumn("h", md5(col("w")))
    val freq = win.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    win.join(freq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("ndocs") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_windows"), col("n_boiler"),
        floor(col("n_boiler") * 1000000 / col("n_windows").cast("double"))
          .cast("long").as("boiler_ppm"))
  }

  /** BM25 (Robertson–Spärck Jones) lexical retrieval scoring over a fixed
    * query-term set, top-`k` docs. Shape at 100 TB: one scan → per-doc
    * conditional-sum tf columns (partial+final, exact ints), two
    * single-row broadcasts (df, corpus stats), top-k via TakeOrdered — no
    * full sort, no second scan. Constants k1 = 1.2, b = 0.75 are baked as
    * the literals `2.2 / 1.2 / 0.25 / 0.75` — the exact spellings the
    * DuckDB oracle carries (see the object doc for why they are not
    * parameters).
    *
    * @return (doc_id, tf_<term>..., score) — the top `k` by
    *         (score DESC, doc_id), already limited. */
  def bm25TopK(docs: DataFrame, qterms: Seq[String], k: Int): DataFrame = {
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(qterms: _*))
    val tfCols = qterms.map(t =>
      sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val tf = toks.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val dfCols = qterms.map(t =>
      sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"df_$t"))
    val dfs = toks.distinct().agg(dfCols.head, dfCols.tail: _*)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    def idf(t: String) = log(
      (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) + lit(1))
    def frac(t: String) = col(s"tf_$t") * lit(2.2) /
      (col(s"tf_$t") + lit(1.2) * (lit(0.25) +
        lit(0.75) * (col("dl").cast("double") * col("n_docs") / col("tot_dl"))))
    tf.join(dl, "doc_id").crossJoin(broadcast(dfs)).crossJoin(broadcast(stats))
      .select(col("doc_id") +: qterms.map(t => col(s"tf_$t")) :+
        round(qterms.map(t => idf(t) * frac(t)).reduce(_ + _), 6).as("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Bigram-LM average negative log-likelihood (the CCNet/KenLM
    * perplexity-filter shape): an add-one-smoothed bigram LM trained ON
    * the corpus scores every document. Determinism: per-token log-probs
    * are QUANTIZED to integer micro-nats (floor(ln(p)·1e6 + 0.5)) BEFORE
    * the per-doc sum — an integer sum is order-free where a float sum
    * over an unordered group differs between engines (ulp caveat
    * documented at the catalog entry). Shape at 100 TB: bigrams via a
    * typed flatMap in the scan stage (keeps multiplicities — an LM must
    * not dedup); the count tables are vocabulary²-bounded (≪ corpus) and
    * join on w1 — in production they'd be a persisted model read as a
    * dimension.
    *
    * @return (doc_id, n_bigrams, sum_ll_micro, nll_micro), unordered. */
  def bigramNll(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bi = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val tk = text.split(" ", -1)
        (0 until tk.length - 1).iterator.map(i => (id, tk(i), tk(i + 1)))
      }.toDF("doc_id", "w1", "w2")
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = docs.select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t")).as("vocab"))
    bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("ll_micro",
        floor(log((col("c12") + lit(1)).cast("double") / (col("c1") + col("vocab")))
          * lit(1000000) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ll_micro")).as("sum_ll_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_ll_micro"),
        floor(-col("sum_ll_micro").cast("double") / col("n_bigrams"))
          .cast("long").as("nll_micro"))
  }
}
