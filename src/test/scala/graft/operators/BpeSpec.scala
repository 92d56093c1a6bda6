package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** graft.operators.Bpe (SURVEY.md §2 B84): the merge loop must follow the
  * textbook semantics exactly — overlapping pair counting, (cnt DESC, pair
  * ASC) tie-break, and GREEDY left-to-right application with the
  * every-other-match rule inside identical-symbol runs (the one case where
  * matches overlap). All expectations here are hand-derived. */
class BpeSpec extends SparkSpecBase {

  private def docsDf(text: String) = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text")
  }

  test("three rounds on a planted corpus: counts, tie-breaks, and greedy application") {
    // corpus: aaab x2, aab x1 → symbols aaab=[a,a,a,b,</w>], aab=[a,a,b,</w>]
    // round 1: (a,a) counted WITH overlap = 2*2 + 1 = 5 beats (a,b)=3,
    //   (b,</w>)=3; applying merges only the FIRST aa of aaab (greedy):
    //   aaab→[aa,a,b,</w>], aab→[aa,b,</w>]
    // round 2: (b,</w>) = 3 beats (aa,a)=2, (a,b)=2, (aa,b)=1
    // round 3: tie at 2 between (a,b</w>) and (aa,a) → pair-ASC picks
    //   ("a","b</w>")
    val got = Bpe.merges(docsDf("aaab aaab aab"), rounds = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1, "a", "a", 5L),
      (2, "b", "</w>", 3L),
      (3, "a", "b</w>", 2L)))
  }

  test("applyMerge keeps every other match inside an identical-symbol run") {
    // "aaaa" = [a,a,a,a,</w>]: matches at 0,1,2 chain — greedy takes 0 and
    // 2 → [aa,aa,</w>]; "aaa" = [a,a,a,</w>]: matches 0,1 → take 0 →
    // [aa,a,</w>]
    val syms = Bpe.symbolTable(docsDf("aaaa aaa"))
    val out = Bpe.applyMerge(syms, "a", "a")
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(out("aaaa") === Seq("aa", "aa", "</w>"))
    assert(out("aaa") === Seq("aa", "a", "</w>"))
  }

  test("applying the learned merge table reproduces the training-side symbol table") {
    // r11 verdict #4: the tokenizer APPLY path (a fresh symbol table
    // re-segmented with the frozen merge list via applyMerges) must equal
    // the state training itself reached — two different code paths
    // (incremental persist-per-round vs one lazy fold) over the same rule.
    val docs = docsDf("aaab aaab aab to to go")
    val (tbl, trained) = Bpe.mergesWithVocab(docs, rounds = 3)
    val learned = tbl.orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val applied = Bpe.applyMerges(Bpe.symbolTable(docs), learned)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    val t = trained
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(applied === t)
    trained.unpersist(blocking = false)
  }

  test("learned-merge tokenization: hand-derived segmentations") {
    // corpus aaab x2, aab -> merges (a,a), (b,</w>), (a,b</w>) (first test);
    // aaab: [a,a,a,b,</w>] -> [aa,a,b,</w>] -> [aa,a,b</w>] -> [aa,ab</w>]
    // aab:  [a,a,b,</w>]   -> [aa,b,</w>]   -> [aa,b</w>]  -> (aa != a: stop)
    val (_, vocab) = Bpe.mergesWithVocab(docsDf("aaab aaab aab"), rounds = 3)
    val m = vocab.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(m("aaab") === Seq("aa", "ab</w>"))
    assert(m("aab") === Seq("aa", "b</w>"))
    vocab.unpersist(blocking = false)
  }

  test("compression curve: hand-derived corpus token totals per round") {
    // corpus aaab x2, aab: round 0 = chars+</w> = 2·5 + 4 = 14;
    // after (a,a): 2·4 + 3 = 11; after (b,</w>): 2·3 + 2 = 8;
    // after (a,b</w>): 2·2 + 2 = 6 — each merge's marginal win measured
    val got = Bpe.compressionCurve(docsDf("aaab aaab aab"), rounds = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === Seq((0, 14L), (1, 11L), (2, 8L), (3, 6L)))
  }

  test("symbol table weights by word frequency and terminates words") {
    val st = Bpe.symbolTable(docsDf("to to to go"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](2))).toMap
    assert(st("to") === ((3L, Seq("t", "o", "</w>"))))
    assert(st("go") === ((1L, Seq("g", "o", "</w>"))))
  }

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("round")).collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("batched ≡ sequential theorem: planted corpora exercising every prefix rule") {
    // r14 verdict #2 — mergesBatched must reproduce merges() EXACTLY.
    // Corpus A exercises rule 1 + coalescing. Doubled words ('abab' x5,
    // 'cdcd' x4, 'efef' x3): the internal pair counts TWICE per
    // occurrence, so (a,b)=10 > (c,d)=8 > (e,f)=6 strictly dominate every
    // other pair ((b,a)/(b,</w>)=5 at best) and are symbol-disjoint —
    // round 1 must take all three. Merge 4 is then (ab,</w>) (tie with
    // (ab,ab) at 5 broken by b ASC, '<'<'a'), which conflicts with
    // everything at its count — a second round of one.
    val a = docsDf(Seq.fill(5)("abab").mkString(" ") + " " +
      Seq.fill(4)("cdcd").mkString(" ") + " " + Seq.fill(3)("efef").mkString(" "))
    val (gotA, roundsA) = Bpe.mergesBatchedWithRounds(a, totalMerges = 4,
      batchCap = 8)
    assert(mergeRows(gotA) === mergeRows(Bpe.merges(a, rounds = 4)),
      "batched diverged from sequential on the disjoint corpus")
    assert(mergeRows(gotA).take(3) === Seq((1, "a", "b", 10L),
      (2, "c", "d", 8L), (3, "e", "f", 6L)), "hand-derived sequence changed")
    assert(roundsA === 2,
      s"3 disjoint merges + 1 should take exactly 2 rounds, took $roundsA")

    // Corpus B exercises rule 2 (stop at first conflict): 'aaab aab' makes
    // round 1's top pairs share symbols — (a,a) then (a,b)/(b,</w>) all
    // touch 'a' or 'b' chains — so batches stay small but the result must
    // still equal sequential.
    val b = docsDf("aaab aaab aab")
    val (gotB, _) = Bpe.mergesBatchedWithRounds(b, totalMerges = 3,
      batchCap = 8)
    assert(mergeRows(gotB) === mergeRows(Bpe.merges(b, rounds = 3)),
      "batched diverged from sequential on the conflict-heavy corpus")
    assert(mergeRows(gotB) === Seq((1, "a", "a", 5L), (2, "b", "</w>", 3L),
      (3, "a", "b</w>", 2L)), "hand-derived sequence changed")

    // Corpus C exercises rule 3 (the boundary tie trim is LOAD-BEARING):
    // 'aib' ranks (a,i), (b,</w>), (i,b) all at count 1 — (b,</w>) is
    // symbol-disjoint from (a,i) so rules 1+2 alone would batch it, but
    // sequential merge 2 is (ai,b) (the pair CREATED by merge 1, winning
    // the count-1 tie on a ASC: 'ai' < 'b'). The trim must shrink the
    // batch to 1; without it the batched table would be wrong.
    val c = docsDf("aib")
    val (gotC, _) = Bpe.mergesBatchedWithRounds(c, totalMerges = 2,
      batchCap = 8)
    assert(mergeRows(gotC) === mergeRows(Bpe.merges(c, rounds = 2)),
      "batched diverged from sequential on the boundary-tie corpus")
    assert(mergeRows(gotC)(1)._2 === "ai",
      "merge 2 should be the created pair (ai,b) — tie trim not exercised")
  }

  test("batched ≡ sequential on the fixture corpus; rounds bound the job count") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val (got, rounds) = Bpe.mergesBatchedWithRounds(docs, totalMerges = 8,
      batchCap = 4)
    assert(mergeRows(got) === mergeRows(Bpe.merges(docs, rounds = 8)),
      "batched diverged from sequential on the fixture corpus")
    assert(rounds < 8,
      s"batching never coalesced on the fixture (rounds=$rounds of 8 " +
        "merges) — the catalog entry's batching is vacuous")
  }
}
