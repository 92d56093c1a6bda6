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

  /** Weighted adjacent-pair counts over the symbol table. Fully-merged
    * words (single-symbol sequences) have no pairs and are filtered FIRST:
    * Spark's `sequence(0, -1)` DESCENDS instead of returning empty (the
    * [[symbolTable]] caveat again), so without the guard a word that
    * collapses to one symbol after enough merges crashes the count with an
    * out-of-bounds `s[1]` — reachable on small vocabularies at high merge
    * counts (the batched entry's regime). The oracle's `rr.i <= len-2`
    * bound skips these rows the same way. */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("s")) >= 2)
      .select(col("f"), explode(expr(
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
    val (tbl, _, release) = trainLoop(docs, rounds)
    release() // merge table is driver-side; the vocab storage goes now
    tbl
  }

  /** [[merges]] plus the FINAL symbol table (word, f, s) — the trained
    * tokenizer already applied to its own training vocabulary, which is
    * what the tokenize-with-learned-merges path consumes (r11 verdict #4).
    * Re-segmenting a fresh symbol table with the returned merge list via
    * [[applyMerges]] produces the identical table (BpeSpec pins the
    * equality) — returning the training-side state just avoids paying the
    * application twice. The returned symbol table is CHECKPOINT-BACKED
    * ([[Materialize.cut]] — executor blocks in default mode, checkpoint
    * files in reliable mode); its storage is freed when the ContextCleaner
    * GCs the frame. Callers that only want the merge table use [[merges]],
    * which frees it eagerly. */
  def mergesWithVocab(docs: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val (tbl, syms, _) = trainLoop(docs, rounds)
    (tbl, syms)
  }

  private def trainLoop(docs: DataFrame,
                        rounds: Int): (DataFrame, DataFrame, () => Unit) = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var syms = symbolTable(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // round 0's table is persist-backed; later rounds are checkpoint-backed
    // and need their Cut.release handle — unpersist() on the re-wrapped
    // frame is a no-op (r15 advice)
    var release: () => Unit = () => { syms.unpersist(blocking = false); () }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val best = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      require(best.nonEmpty, s"round $r: no pairs left to merge")
      val (a0, b0, c0) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += ((r, a0, b0, c0))
      // Materialize.cut, not persist: applyMerge references its input
      // several times, so the LOGICAL plan multiplies ~4x per round and at
      // 8+ rounds the un-truncated lineage OOMs the driver just
      // STRINGIFYING the plan — persistence alone stops recompute, only
      // checkpointing stops plan growth, and only the fresh-leaf re-wrap
      // stops the size-estimate BigInt blow-up (see [[Materialize]]) — the
      // production-32k-merge regime mergesBatched exists for makes both
      // non-optional
      val next = Materialize.cut(applyMerge(syms, a0, b0)) // eager
      release() // previous round's storage, safe now next is materialized
      syms = next.df
      release = next.release
    }
    (out.toSeq.toDF("round", "sym_a", "sym_b", "cnt"), syms, release)
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

  /** Apply a BATCH of pairwise-disjoint merges in ONE vocabulary pass —
    * the rewrite kernel of [[mergesBatched]]. Precondition (the caller's
    * prefix rule establishes it): no two batch pairs share a symbol and no
    * pair contains another's concatenation. Under it, match SITES of
    * different pairs can never overlap — positions i, i+1 matching pairs
    * P, Q forces P's right symbol = Q's left symbol — so the simultaneous
    * rewrite is well-defined and equals applying the batch sequentially in
    * any order. Same gaps-and-islands greedy rule as [[applyMerge]], with
    * the run grouping keyed per (word, pair): a same-symbol run only ever
    * contains ONE pair's matches (a run of c's matches only (c,c)), so the
    * per-pair islands are exactly the single-pair islands. */
  def applyMergeBatch(syms: DataFrame, batch: Seq[(String, String)]): DataFrame = {
    require(batch.nonEmpty, "applyMergeBatch on an empty batch")
    val spark = syms.sparkSession
    import spark.implicits._
    val byI = Window.partitionBy(col("word")).orderBy(col("i"))
    val byPair = Window.partitionBy(col("word"), col("pa"), col("pb"))
      .orderBy(col("i"))
    val ex = syms.select(col("word"), col("f"),
      posexplode(col("s")).as(Seq("i", "sym")))
    val pdf = batch.toDF("pa", "pb")
    val matches = ex
      .withColumn("nxt", lead(col("sym"), 1).over(byI))
      .join(broadcast(pdf), col("sym") === col("pa") && col("nxt") === col("pb"))
      .withColumn("rn", row_number().over(byPair))
      .withColumn("grp", col("i") - col("rn"))
      .withColumn("rn2", row_number().over(
        Window.partitionBy(col("word"), col("pa"), col("pb"), col("grp"))
          .orderBy(col("i"))))
      .filter(col("rn2") % 2 === 1)
      .select(col("word"), col("i"), concat(col("pa"), col("pb")).as("merged"))
    val absorbed = matches.select(col("word"), (col("i") + 1).as("i"),
      lit(true).as("absorbed"))
    ex.join(matches, Seq("word", "i"), "left")
      .join(absorbed, Seq("word", "i"), "left")
      .filter(col("absorbed").isNull)
      .select(col("word"), col("f"), col("i"),
        coalesce(col("merged"), col("sym")).as("sym"))
      .groupBy(col("word"), col("f"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("sym")))),
        x => x.getField("sym")).as("s"))
  }

  /** BATCHED merge induction (r14 verdict #2) — the scalable form of
    * [[merges]] and EXACTLY equal to it (BpeSpec pins the theorem on both
    * a planted corpus and the fixture): production tokenizer training is
    * 32k merges, and [[mergesWithVocab]]'s one-argmax-collect-plus-one-
    * table-rewrite PER MERGE makes that 32k Spark jobs — the driver loop
    * is the bottleneck, not the data. Here each ROUND merges the longest
    * ranked prefix of the pair-count snapshot that is provably
    * order-equivalent to sequential induction, so the job count is bound
    * by ROUNDS (merges/batch), not merges.
    *
    * The exact-safe prefix rule, with the proof sketch (each accepted
    * pair must still be the sequential argmax at its turn):
    *  1. PAIRWISE DISJOINT, including concatenations: accepting P_j
    *     requires {a_j, b_j} ∩ ∪_{i<j}{a_i, b_i, a_i·b_i} = ∅. Merging
    *     P_i then leaves every later P_j's occurrence count untouched (no
    *     site of P_j contains a merged symbol), and sites of different
    *     pairs cannot overlap, so the batch rewrite equals the sequential
    *     one.
    *  2. PREFIX, stopping at the FIRST conflict (never skip-and-continue):
    *     a new pair created by merging P_i = (a,b) has the form (x, ab) or
    *     (ab, y), and its count is bounded by the snapshot count of the
    *     CONFLICTING pair (x, a) / (b, y) it descends from. A conflicting
    *     pair is outside the prefix, hence ranked below every accepted
    *     pair — so no created pair can outrank a later batch member…
    *  3. …except on a COUNT TIE at the boundary (a conflicting pair ranked
    *     just below the prefix with an EQUAL count could spawn a created
    *     pair that wins the lexicographic tie-break at P_j's turn): the
    *     batch is trimmed until its last count is STRICTLY greater than
    *     the (m+1)-th ranked count. Floor at 1 — a single merge is
    *     sequential by definition.
    *
    * Per round: one pair-count aggregate, ONE bounded collect (the top
    * batchCap+1 ranked rows — O(model), the [[merges]] argmax collect
    * widened), one [[applyMergeBatch]] vocabulary pass. Recorded counts
    * are snapshot counts, which rule 1 proves equal the sequential
    * at-turn counts. Returns (round = INDUCTION ORDER, sym_a, sym_b, cnt)
    * — identical schema and contents to [[merges]]. */
  def mergesBatched(docs: DataFrame, totalMerges: Int,
                    batchCap: Int = 64): DataFrame =
    mergesBatchedWithRounds(docs, totalMerges, batchCap)._1

  /** [[mergesBatched]] plus the number of ROUNDS (Spark job groups) it
    * took — the quantity the scale soak pins: rounds ≪ merges is the
    * whole point. */
  def mergesBatchedWithRounds(docs: DataFrame, totalMerges: Int,
                              batchCap: Int): (DataFrame, Int) = {
    require(totalMerges >= 1, s"totalMerges ($totalMerges) must be >= 1")
    require(batchCap >= 1, s"batchCap ($batchCap) must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var syms = symbolTable(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var release: () => Unit = () => { syms.unpersist(blocking = false); () }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rounds = 0
    while (out.length < totalMerges) {
      rounds += 1
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchCap + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(top.nonEmpty,
        s"round $rounds: no pairs left after ${out.length} merges")
      // rule 1+2: maximal pairwise-disjoint (incl. concats) ranked prefix
      val used = scala.collection.mutable.Set[String]()
      var m = 0
      var stop = false
      while (!stop && m < math.min(batchCap, top.length)) {
        val (a, b, _) = top(m)
        if (used(a) || used(b)) stop = true
        else { used += a; used += b; used += (a + b); m += 1 }
      }
      // rule 3: strict count drop at the boundary, floor at 1
      while (m > 1 && m < top.length && top(m - 1)._3 == top(m)._3) m -= 1
      m = math.min(m, totalMerges - out.length)
      val batch = top.take(m)
      batch.foreach { case (a, b, c) => out += ((out.length + 1, a, b, c)) }
      // Materialize.cut per round — truncates the multiplying
      // applyMergeBatch lineage AND the compounding size estimates (see
      // the trainLoop comment and the Materialize scaladoc), with the
      // explicit release freeing each round's blocks once the next round
      // is materialized
      val next = Materialize.cut(
        applyMergeBatch(syms, batch.map(t => (t._1, t._2)).toSeq)) // eager
      release()
      syms = next.df
      release = next.release
    }
    release()
    (out.toSeq.toDF("round", "sym_a", "sym_b", "cnt"), rounds)
  }
}
