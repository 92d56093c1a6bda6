package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** B111 segment-blocked fuzzy join: the pigeonhole completeness theorem on
  * planted substitutions (blocked ≡ brute force), confirm-filter
  * correctness, the documented indel false-negative (the operator's honest
  * limitation, demonstrated rather than hidden), and the block cap.
  */
class FuzzyJoinSpec extends SparkSpecBase {

  private def df(rows: Seq[(Long, String)]) =
    spark.createDataFrame(rows).toDF("id", "s")

  private def run(rows: Seq[(Long, String)], d: Int = 2,
                  cap: Int = Int.MaxValue): Set[(Long, Long, Int)] =
    FuzzyJoin.selfJoin(df(rows), d, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Brute-force reference (driver-side DP levenshtein, no shared code). */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet

  test("pigeonhole theorem: planted substitution pairs are never missed") {
    // 40 base strings (length 30), each cloned with 1 or 2 substitutions
    // at hash-spread positions — equal length, substitutions only, so the
    // blocked result must equal brute force EXACTLY.
    val base = (0 until 40).map(i => f"doc number $i%04d payload ${i * 7}%05d!")
    assert(base.forall(_.length == 30))
    val rows = base.zipWithIndex.flatMap { case (s, i) =>
      val p1 = (i * 13) % 30
      val p2 = (i * 19 + 7) % 30
      val oneSub = s.updated(p1, '@')
      val twoSub = s.updated(p1, '@').updated(p2, '#')
      Seq((i * 10L, s), (i * 10L + 1, oneSub), (i * 10L + 2, twoSub))
    }
    val got = run(rows)
    val want = brute(rows, 2)
    assert(want.nonEmpty && want.exists(_._3 == 1) && want.exists(_._3 == 2),
      "fixture must plant both distance bands")
    assert(got === want, "blocked join must equal brute force on substitution pairs")
  }

  test("confirm filter: shared segments at distance > maxDist are rejected") {
    // identical first third, remainder completely different: blocked as
    // candidates, confirmed away.
    val rows = Seq(
      (1L, "aaaaaaaaaa0123456789xxxxxxxxxx"),
      (2L, "aaaaaaaaaaZYXWVUTSRQyyyyyyyyyy"))
    assert(run(rows) === Set.empty)
  }

  test("documented limitation: a pure-indel shift can be a false negative") {
    // s2 = s1 with one char deleted then one appended — levenshtein 2,
    // but every positional segment differs AND lengths differ: positional
    // blocking misses it (the PASS-JOIN shifted-probe extension is the
    // documented fix; this test pins the limitation so it can't silently
    // masquerade as completeness).
    val s1 = "abcdefghijklmnopqrstuvwxyz0123"
    val s2 = s1.drop(1) + "!"
    assert(lev(s1, s2) === 2)
    assert(run(Seq((1L, s1), (2L, s2))) === Set.empty)
    assert(brute(Seq((1L, s1), (2L, s2)), 2).size === 1)
  }

  test("maxBlock cap refuses degenerate blocks") {
    // 50 strings identical in every segment (distance 0 pairs) — a cap of
    // 10 refuses the blocks entirely; uncapped finds all C(50,2) pairs.
    val rows = (1L to 50L).map(i => (i, "identical-string-payload-here!"))
    assert(run(rows).size === 50 * 49 / 2)
    assert(run(rows, cap = 10) === Set.empty)
  }
}
