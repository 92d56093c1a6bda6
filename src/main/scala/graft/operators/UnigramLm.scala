package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING (SURVEY.md §2
  * B121) — the other half of the tokenizer story next to BPE's merge
  * induction ([[Bpe]]): Kudo 2018 ("Subword Regularization", §3.2) trains
  * a subword vocabulary by EM over a bounded candidate set — seed a large
  * candidate vocabulary from corpus substrings, iterate expectation
  * (distribute each occurrence's mass over the candidates that could
  * explain it, proportionally to current piece weights) and maximization
  * (piece weight ← its collected mass), then keep the top-V survivors.
  *
  * EXACT-INTEGER discipline (the B91 lesson: log-likelihoods cannot
  * hash-compare cross-engine): the paper's lattice posteriors are
  * replaced by per-(word, position) weight shares in ppm —
  * `share = w(piece)·1e6 DIV Σ w(q)` over the candidates starting at the
  * same position of the same word type — and expected counts are
  * `Σ f(word)·share`, RENORMALIZED back to occurrence-mass scale after
  * every round (`w ← Σ f·share DIV 1e6`, single characters clamped to
  * ≥ 1 so every position keeps a usable piece and the Viterbi edge cost
  * never divides by zero). The renormalization is what keeps the
  * arithmetic int64-safe round over round (r14 ADVICE): without it
  * round-2 weights are already ppm-scaled and the share product
  * `w·1e6` overflows once a piece's occurrence mass passes ~9.2e6.
  * With it, `w ≤ mass(piece)` holds at EVERY round, so the per-round
  * product is bounded by 1e6·mass — the same ceiling as round 1. The
  * residual ceiling is total corpus occurrence mass ~9.2e12 per piece
  * (≈ trillions of occurrences of ONE piece), at which point shard the
  * corpus and average — stated, not silent. The EM structure (soft
  * counts ∝ current weights, renormalized per position, re-estimated
  * per round) is the paper's; the arithmetic is the catalog's
  * replayable integer form.
  *
  * Scale posture (100 TB): the corpus is touched ONCE (the word-frequency
  * aggregate — the [[Bpe]] posture); the occurrence table is
  * VOCABULARY-sized (word types × ≤ maxWordLen × maxPieceLen rows), every
  * EM round is one broadcast-sized weights join + two aggregates over it,
  * and nothing per-round touches the corpus again. `maxWordLen` refuses
  * degenerate "words" (URLs, base64 blobs) whose substring fan-out would
  * dominate the table — mirrored in the oracle's WHERE.
  */
object UnigramLm {

  /** (word, f) — word types with frequencies, the one corpus pass.
    * Words longer than `maxWordLen` are excluded (fan-out refusal). */
  def wordFreq(docs: DataFrame, maxWordLen: Int): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("f"))

  /** All (word, f, pos, piece) substring occurrences with
    * 1 ≤ len(piece) ≤ maxPieceLen — SQL substring semantics (code
    * points), so the DuckDB oracle segments identically. pos is 0-based. */
  def occurrences(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("word"), col("f"),
        explode(expr(
          s"""flatten(transform(sequence(0, length(word) - 1), p ->
             |  transform(sequence(1, least($maxPieceLen, length(word) - p)), l ->
             |    struct(p AS pos, substring(word, p + 1, l) AS piece))))"""
            .stripMargin)).as("o"))
      .select(col("word"), col("f"), col("o.pos").as("pos"),
        col("o.piece").as("piece"))

  /** Train `emRounds` rounds; returns the final weights (piece, w) over
    * the candidate vocabulary — pieces whose total occurrence mass
    * tf = Σ f is ≥ minCount, plus ALL single characters (coverage: a
    * tokenizer must be able to segment anything it saw). Initial weight =
    * tf (the paper's frequency-seeded start). */
  def train(docs: DataFrame, maxPieceLen: Int, minCount: Long,
            emRounds: Int, maxWordLen: Int = 30): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen ($maxPieceLen) must be >= 1")
    require(emRounds >= 1, s"emRounds ($emRounds) must be >= 1")
    require(maxWordLen >= 1, s"maxWordLen ($maxWordLen) must be >= 1")
    val occ = occurrences(wordFreq(docs, maxWordLen), maxPieceLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tf = occ.groupBy(col("piece")).agg(sum(col("f")).as("tf"))
      var w = tf.filter(col("tf") >= minCount || length(col("piece")) === 1)
        .select(col("piece"), col("tf").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      w.count()
      for (_ <- 1 to emRounds) {
        val cocc = occ.join(w, Seq("piece"))
        val denom = cocc.groupBy(col("word"), col("pos"))
          .agg(sum(col("w")).as("dw"))
        val next = cocc.join(denom, Seq("word", "pos"))
          .withColumn("share", expr("w * 1000000 DIV dw"))
          .groupBy(col("piece")).agg(sum(col("f") * col("share")).as("wr"))
          // renormalize to mass scale (see scaladoc); single chars clamp
          // to >= 1 — coverage AND a nonzero denominator at every position
          .select(col("piece"),
            greatest(expr("wr DIV 1000000"),
              when(length(col("piece")) === 1, lit(1L)).otherwise(lit(0L)))
              .as("w"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        w.unpersist(blocking = false)
        w = next
      }
      val out = Materialize.cutFinal(w)
      w.unpersist(blocking = false)
      out
    } finally occ.unpersist(blocking = false)
  }

  /** EXACT Viterbi segmentation with the trained weights (SURVEY.md §2
    * B125) — the APPLY half of the unigram tokenizer ([[train]] learns,
    * this segments), and the exact decode the paper's inference uses
    * (vs. the greedy longest-match shortcut WordPiece-style tokenizers
    * take): per word type, the segmentation minimizing the additive
    * integer cost Σ (1 + costScale DIV w(piece)), token count as the
    * tie-break — both folded into ONE int64 key `combined =
    * cost·64 + n_tokens` (token counts < 64 ≤ maxWordLen bound, so the
    * encoding is additive and min-combined IS the lexicographic
    * (cost, n_tokens) minimum; the B91 discipline again: integer costs
    * where true log-probs would never hash-compare).
    *
    * The DP is relational MIN-PLUS DOUBLING, not a per-word loop: edge
    * (p → p+|piece|) for every vocab piece at position p, then
    * ceil(log2(maxWordLen)) rounds of R ∪ min(R∘R) — each round one
    * self-join on the middle position, state bounded by word types ×
    * maxWordLen² pairs (the maxWordLen cap is what bounds it — stated
    * refusal, mirrored in the oracle). Single-char coverage guarantees
    * dist(0, len) exists for every word.
    *
    * @return (word, f, n_tokens, cost) — per word TYPE; callers join back
    *         to docs for per-document totals */
  def viterbiSegment(docs: DataFrame, maxPieceLen: Int, minCount: Long,
                     emRounds: Int, costScale: Long,
                     maxWordLen: Int = 30): DataFrame = {
    require(costScale >= 1, s"costScale ($costScale) must be >= 1")
    require(maxWordLen < 64,
      s"maxWordLen ($maxWordLen) must stay < 64 for the combined encoding")
    val w = train(docs, maxPieceLen, minCount, emRounds, maxWordLen)
    val words = wordFreq(docs, maxWordLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val occ = occurrences(words, maxPieceLen)
      // w >= 1 only: integer share truncation can drive a low-mass
      // multi-char piece's weight to exactly 0 and `costScale DIV 0`
      // would throw (r14 ADVICE). Single chars are clamped >= 1 by
      // train(), so every position keeps an edge — segmentation never
      // fails. Mirrored in the oracle's edges CTE.
      val edges = occ.join(w.filter(col("w") >= 1), Seq("piece"))
        .select(col("word"), col("pos").as("p"),
          (col("pos") + length(col("piece"))).as("q"),
          ((lit(1L) + expr(s"$costScale DIV w")) * 64 + 1).as("c"))
      var r = edges.groupBy(col("word"), col("p"), col("q"))
        .agg(min(col("c")).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count()
      // rounds sized to the CORPUS's longest word, not the cap: a path has
      // ≤ maxLen unit edges, so ceil(log2(maxLen)) doublings close it —
      // one 1-row aggregate of already-materialized state (the Bpe argmax
      // convention), and each saved round is a saved shuffle trio
      val maxLenRow = words.agg(max(length(col("word")))).collect()(0)
      require(!maxLenRow.isNullAt(0),
        "viterbiSegment on an empty corpus (no words within maxWordLen)")
      val maxLen = math.max(1L, maxLenRow.getInt(0).toLong)
      val rounds =
        (math.log(maxLen.toDouble) / math.log(2.0)).ceil.toInt.max(1)
      for (_ <- 1 to rounds) {
        val comp = r.select(col("word"), col("p"), col("q").as("m"), col("c").as("c1"))
          .join(r.select(col("word"), col("p").as("m"), col("q"), col("c").as("c2")),
            Seq("word", "m"))
          .select(col("word"), col("p"), col("q"), (col("c1") + col("c2")).as("c"))
        val next = r.select(col("word"), col("p"), col("q"), col("c"))
          .union(comp)
          .groupBy(col("word"), col("p"), col("q")).agg(min(col("c")).as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        r.unpersist(blocking = false)
        r = next
      }
      val out = Materialize.cutFinal(words
        .join(r.filter(col("p") === 0), Seq("word"))
        .filter(col("q") === length(col("word")))
        .select(col("word"), col("f"),
          (col("c") % 64).cast("long").as("n_tokens"),
          expr("c DIV 64").as("cost")))
      r.unpersist(blocking = false)
      out
    } finally words.unpersist(blocking = false)
  }

  /** The pruned vocabulary: top `vocabTarget` pieces by (w DESC, piece
    * ASC) + every single character regardless of rank (Kudo §3.2 keeps
    * chars unconditionally so segmentation never fails). Returns
    * (rank, piece, w) with rank over the kept set in the same order. */
  def vocab(trained: DataFrame, vocabTarget: Int): DataFrame = {
    require(vocabTarget >= 1, s"vocabTarget ($vocabTarget) must be >= 1")
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("w").desc, col("piece"))
    // single-partition window is over the MODEL (|vocab| rows), not the
    // corpus — the same bounded-state argument as Bpe's 1-row argmax
    val ranked = trained.withColumn("r0", row_number().over(win))
    ranked.filter(col("r0") <= vocabTarget || length(col("piece")) === 1)
      .withColumn("rank", row_number().over(win))
      .select(col("rank"), col("piece"), col("w"))
  }
}
