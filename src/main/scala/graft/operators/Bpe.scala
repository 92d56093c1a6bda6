package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction (SURVEY.md §2 B84) — the tokenizer-
  * TRAINING half of the token-counting story (q_text_tokens_bpe counts with
  * a fixed rule; this LEARNS the merge table), the standard subword
  * algorithm of Sennrich et al. 2016 ("Neural Machine Translation of Rare
  * Words with Subword Units").
  *
  * Exactly the textbook loop, made relational:
  *  - the corpus collapses to the WORD-FREQUENCY table first (distinct
  *    words with counts — how production BPE trainers run: statistics are
  *    per word type, weighted by frequency, never per corpus occurrence);
  *  - a word's symbol sequence starts as its characters + a `</w>`
  *    terminator (merges never cross word boundaries);
  *  - each round: count ALL adjacent symbol pairs (overlapping occurrences
  *    included — the get_stats convention), weighted by word frequency;
  *    pick the argmax with the deterministic (count DESC, pair ASC)
  *    tie-break; APPLY it greedily left-to-right.
  *
  * Greedy left-to-right application is the one step that looks procedural —
  * and is exactly expressible relationally: for pair (a,b) with a ≠ b two
  * matches can never overlap (positions i and i+1 both matching forces
  * a = b), so every match is taken; for a = b, matches inside a run of
  * identical symbols overlap chain-wise and greedy takes every OTHER one —
  * the gaps-and-islands rule (group consecutive match positions, keep odd
  * ranks). Both engines compute the same islands, so the DuckDB oracle
  * replays every round bit-for-bit.
  *
  * Scale posture (100 TB): the corpus is touched ONCE (the word-frequency
  * aggregate — partial+final counts); every round after that runs on the
  * VOCABULARY (word types × ~word-length symbol rows — millions of rows for
  * a web corpus, not billions), the per-round argmax collect is ONE row,
  * and the per-word windows partition on the word (bounded ≤ word length).
  * This is why real BPE trainers are feasible at all — and the same
  * structure here keeps every round a small shuffle over vocab-sized data.
  */
object Bpe {

  /** (word, f, s: array<string>) — initial symbol table from the corpus.
    * Empty tokens are excluded: Spark's `sequence(1, 0)` DESCENDS instead
    * of returning empty, so a zero-length word would diverge from the
    * oracle's `range(0)` = [] (and a zero-length "word" is a tokenizer
    * input bug anyway). */
  def symbolTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
      .select(col("word"), col("f"),
        concat(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
          array(lit("</w>"))).as("s"))

  /** Weighted adjacent-pair counts over the symbol table. */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.select(col("f"), explode(expr(
        "transform(sequence(0, size(s) - 2), i -> struct(s[i] AS a, s[i+1] AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("f")).as("cnt"))

  /** Apply ONE merge (a0, b0) greedily left-to-right to every word. */
  def applyMerge(syms: DataFrame, a0: String, b0: String): DataFrame = {
    val byI = Window.partitionBy(col("word")).orderBy(col("i"))
    val ex = syms.select(col("word"), col("f"),
      posexplode(col("s")).as(Seq("i", "sym")))
    val matches = ex
      .withColumn("nxt", lead(col("sym"), 1).over(byI))
      .filter(col("sym") === a0 && col("nxt") === b0)
      .withColumn("rn", row_number().over(byI))
      .withColumn("grp", col("i") - col("rn"))
      .withColumn("rn2", row_number().over(
        Window.partitionBy(col("word"), col("grp")).orderBy(col("i"))))
      .filter(col("rn2") % 2 === 1)
      .select(col("word"), col("i"))
    val starts = matches.withColumn("chosen", lit(true))
    val absorbed = matches.select(col("word"), (col("i") + 1).as("i"),
      lit(true).as("absorbed"))
    ex.join(starts, Seq("word", "i"), "left")
      .join(absorbed, Seq("word", "i"), "left")
      .filter(col("absorbed").isNull)
      .select(col("word"), col("f"), col("i"),
        when(col("chosen"), lit(a0 + b0)).otherwise(col("sym")).as("sym"))
      .groupBy(col("word"), col("f"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("sym")))),
        x => x.getField("sym")).as("s"))
  }

  /** Train `rounds` merges; returns (round, sym_a, sym_b, cnt) — the merge
    * table, in induction order. Each round's argmax is a ONE-row collect
    * (the O(model) driver state); ties break (cnt DESC, a ASC, b ASC). */
  def merges(docs: DataFrame, rounds: Int): DataFrame = {
    val (tbl, syms) = mergesWithVocab(docs, rounds)
    syms.unpersist(blocking = false)
    tbl
  }

  /** [[merges]] plus the FINAL symbol table (word, f, s) — the trained
    * tokenizer already applied to its own training vocabulary, which is
    * what the tokenize-with-learned-merges path consumes (r11 verdict #4).
    * Re-segmenting a fresh symbol table with the returned merge list via
    * [[applyMerges]] produces the identical table (BpeSpec pins the
    * equality) — returning the training-side state just avoids paying the
    * application twice. The symbol table is returned PERSISTED; callers
    * that only want the merge table use [[merges]], which unpersists it. */
  def mergesWithVocab(docs: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var syms = symbolTable(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val best = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      require(best.nonEmpty, s"round $r: no pairs left to merge")
      val (a0, b0, c0) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += ((r, a0, b0, c0))
      val next = applyMerge(syms, a0, b0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count()
      syms.unpersist(blocking = false)
      syms = next
    }
    (out.toSeq.toDF("round", "sym_a", "sym_b", "cnt"), syms)
  }

  /** Corpus token totals per training round — the COMPRESSION CURVE each
    * merge buys, the acceptance metric a tokenizer trainer actually
    * watches (round 0 = the chars + `</w>` baseline; Sennrich 2016 §3).
    * Same training loop as [[mergesWithVocab]], plus ONE 1-row aggregate
    * per round on the vocabulary table (total = Σ f · |s| — the exact
    * token count of the corpus re-segmented with the merges so far).
    * Returns (round, total_tokens) for rounds 0..`rounds`. */
  def compressionCurve(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    def total(s: DataFrame): Long =
      s.agg(sum(col("f") * size(col("s")))).head().getLong(0)
    var syms = symbolTable(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = scala.collection.mutable.ArrayBuffer((0, total(syms)))
    for (r <- 1 to rounds) {
      val best = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      require(best.nonEmpty, s"round $r: no pairs left to merge")
      val next = applyMerge(syms, best(0).getString(0), best(0).getString(1))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out += ((r, total(next)))
      syms.unpersist(blocking = false)
      syms = next
    }
    syms.unpersist(blocking = false)
    out.toSeq.toDF("round", "total_tokens")
  }

  /** Apply a LEARNED merge table (induction order) to a symbol table — the
    * tokenizer's APPLY side (Sennrich 2016): a corpus is re-segmented with
    * the frozen merge list, no pair statistics involved. Same greedy
    * gaps-and-islands rule per merge; on the training corpus the result
    * equals the training-side state [[mergesWithVocab]] returns. */
  def applyMerges(syms: DataFrame, learned: Seq[(String, String)]): DataFrame =
    learned.foldLeft(syms) { case (t, (a, b)) => applyMerge(t, a, b) }
}
