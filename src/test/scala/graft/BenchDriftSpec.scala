package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed-baseline drift gate (r10 verdict #1) — [[Bench.driftOf]] is
  * a pure function precisely so its rules are pinned here without a Spark
  * session: ratio AND absolute-delta must both trip, stream-join entries
  * compare floors-subtracted data-bound time, and entries missing from the
  * frozen baseline are reported for re-freezing, never silently skipped. */
class BenchDriftSpec extends AnyFunSuite {

  private val baseline = Map(
    "q_big" -> 4.0,
    "q_small" -> 0.2,
    "q_stream_join_x" -> 5.0) // data-bound vs baseline floor 3.0 → 2.0

  test("ratio + absolute delta must BOTH trip for a batch entry") {
    // 4.0 → 6.4 is 1.6x and +2.4 s: drifted
    val (d1, _) = Bench.driftOf(Seq("q_big" -> 6.4), baseline, 0.0, 0.0)
    assert(d1.map(_._1) === Seq("q_big"))
    assert(math.abs(d1.head._4 - 1.6) < 1e-9)
    // 4.0 → 5.6 is only 1.4x: not drifted (ratio guard)
    assert(Bench.driftOf(Seq("q_big" -> 5.6), baseline, 0.0, 0.0)._1.isEmpty)
    // 0.2 → 0.45 is 2.25x but +0.25 s: not drifted (absolute guard —
    // sub-second entries jitter by more than this on the shared box)
    assert(Bench.driftOf(Seq("q_small" -> 0.45), baseline, 0.0, 0.0)._1.isEmpty)
    // 0.2 → 0.9 is 4.5x AND +0.7 s: drifted
    assert(Bench.driftOf(Seq("q_small" -> 0.9), baseline, 0.0, 0.0)._1
      .map(_._1) === Seq("q_small"))
  }

  test("stream-join entries drift on data-bound time, floors subtracted per side") {
    // entry grew 5.0 → 7.0 but the floor grew 3.0 → 5.0 with it: the
    // data-bound part is 2.0 on both sides — harness noise, not a drift
    assert(Bench.driftOf(Seq("q_stream_join_x" -> 7.0), baseline,
      joinFloorCur = 5.0, joinFloorBase = 3.0)._1.isEmpty)
    // entry grew to 8.5 with the floor unchanged: data-bound 2.0 → 5.5
    // (2.75x, +3.5 s) — a real join-stage regression, flagged with the
    // data-bound numbers in the row
    val (d, _) = Bench.driftOf(Seq("q_stream_join_x" -> 8.5), baseline,
      joinFloorCur = 3.0, joinFloorBase = 3.0)
    assert(d.map(_._1) === Seq("q_stream_join_x"))
    assert(d.head._2 === 2.0 && d.head._3 === 5.5)
  }

  test("all-failed queries (median 0) and unbaselined entries are not drift") {
    val (d, unb) = Bench.driftOf(
      Seq("q_big" -> 0.0, "q_new_this_round" -> 9.9), baseline, 0.0, 0.0)
    assert(d.isEmpty)
    assert(unb === Seq("q_new_this_round"))
  }
}
