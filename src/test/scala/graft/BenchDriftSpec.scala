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

  test("frozen per-entry data-bound baseline takes precedence over floor arithmetic (r16 verdict #4)") {
    // cur 7.0 with floor 3.0 → data-bound 4.0. Against the ARITHMETIC
    // fallback (entry 5.0 − baseline floor 3.0 = 2.0) that is 2.0× and
    // would drift; the FROZEN map pins 3.0 (the entry was re-frozen in a
    // sweep whose floor differed) → 1.33×, inside the gate. The map must
    // decide.
    val db = Map("q_stream_join_x" -> 3.0)
    assert(Bench.driftOf(Seq("q_stream_join_x" -> 7.0), baseline,
      joinFloorCur = 3.0, joinFloorBase = 3.0, dataBoundBase = db)._1.isEmpty)
    // and with a tighter frozen value the same observation drifts
    val (d, _) = Bench.driftOf(Seq("q_stream_join_x" -> 7.0), baseline,
      joinFloorCur = 3.0, joinFloorBase = 3.0,
      dataBoundBase = Map("q_stream_join_x" -> 2.5))
    assert(d.map(_._1) === Seq("q_stream_join_x"))
    assert(math.abs(d.head._2 - 2.5) < 1e-9 && math.abs(d.head._3 - 4.0) < 1e-9)
  }

  test("the join floor drifts as its own named row by the same two-guard rule") {
    assert(Bench.floorDrifted(cur = 10.4, base = 3.4),
      "the r16 floor movement (3.4 → 10.4) must flag")
    assert(!Bench.floorDrifted(cur = 4.5, base = 3.4), "1.32x: inside ratio")
    assert(!Bench.floorDrifted(cur = 0.45, base = 0.2), "+0.25 s: inside absolute")
  }

  test("all-failed queries (median 0) and unbaselined entries are not drift") {
    val (d, unb) = Bench.driftOf(
      Seq("q_big" -> 0.0, "q_new_this_round" -> 9.9), baseline, 0.0, 0.0)
    assert(d.isEmpty)
    assert(unb === Seq("q_new_this_round"))
  }

  // r11 verdict #1: drifted rows self-adjudicate from their raw runs —
  // r11's two false positives needed a 16-minute judge re-sweep to classify
  // as box load; min-over-base classifies them from the artifact alone.

  test("tight cluster far above base classifies systematic") {
    // base 4.0, runs 6.3/6.4/6.6 — even the BEST run is 1.575x: no box
    // noise story explains that; it's a real regression
    val mob = Bench.minOverBase(Seq(6.4, 6.3, 6.6), base = 4.0,
      isJoin = false, joinFloorCur = 0.0)
    assert(math.abs(mob - 6.3 / 4.0) < 1e-9)
    assert(Bench.driftClass(mob) === "systematic")
  }

  test("one loaded sweep dragging the median classifies noise_suspect") {
    // base 4.0, runs 4.1/9.0/8.8 — median 8.8 trips the gate, but the best
    // run sat AT baseline: an outlier dragged the median (exactly the r11
    // q_bpe_merges / q_embed_ivfpq_residual false-positive shape)
    val mob = Bench.minOverBase(Seq(4.1, 9.0, 8.8), base = 4.0,
      isJoin = false, joinFloorCur = 0.0)
    assert(math.abs(mob - 4.1 / 4.0) < 1e-9)
    assert(Bench.driftClass(mob) === "noise_suspect")
  }

  test("stream-join entries adjudicate on floor-subtracted runs, clamped at 0") {
    // data-bound base 2.0 (entry 5.0 − baseline floor 3.0); raw runs
    // 8.5/8.6/8.4 with current floor 3.0 → adjusted min 5.4 → 2.7x best-run
    val mob = Bench.minOverBase(Seq(8.5, 8.6, 8.4), base = 2.0,
      isJoin = true, joinFloorCur = 3.0)
    assert(math.abs(mob - 5.4 / 2.0) < 1e-9)
    assert(Bench.driftClass(mob) === "systematic")
    // a floor measured noisier than the entry clamps at 0, never negative
    assert(Bench.minOverBase(Seq(2.5), base = 2.0, isJoin = true,
      joinFloorCur = 3.0) === 0.0)
  }

  test("degenerate inputs report the JSON-safe sentinel, never Infinity") {
    assert(Bench.minOverBase(Nil, base = 2.0, isJoin = false,
      joinFloorCur = 0.0) === 999999.0)
    assert(Bench.minOverBase(Seq(1.0), base = 0.0, isJoin = false,
      joinFloorCur = 0.0) === 999999.0)
  }

  test("failed-run -1.0 sentinels never masquerade as a best run") {
    // r12 ADVICE: runs arrays carry -1.0 for failed sweeps so positions
    // stay aligned with load_avg_per_run — minOverBase must skip them (a
    // raw -1.0 would otherwise be the "best" run and classify every
    // partially-failing drifted entry as noise)
    val mob = Bench.minOverBase(Seq(-1.0, 6.4, 6.6), base = 4.0,
      isJoin = false, joinFloorCur = 0.0)
    assert(math.abs(mob - 6.4 / 4.0) < 1e-9)
    assert(Bench.driftClass(mob) === "systematic")
    // a join entry's sentinel must not clamp to 0 (which would read as a
    // free ride over the baseline) — it is excluded before the clamp
    assert(Bench.minOverBase(Seq(-1.0), base = 2.0, isJoin = true,
      joinFloorCur = 3.0) === 999999.0)
  }

  // r12 verdict #1: the end-of-sweep retest is the adjudicating sample —
  // q_embed_ivfpq_residual flagged two consecutive driver sweeps, both
  // noise, the second only 6% inside the min_over_base line.

  test("a retest inside the gate overrides a systematic-looking sweep cluster") {
    // every sweep ran hot (min_over_base 1.6 > 1.5) but the quiet-box
    // retest came back at 1.1x: the sweeps were loaded, not the operator
    assert(Bench.classWithRetest(1.6, Some(1.1)) === "noise_suspect")
  }

  test("systematic requires the retest to exceed the gate too") {
    // tight sweep cluster AND the quiet retest both over the gate: real
    assert(Bench.classWithRetest(1.7, Some(1.62)) === "systematic")
    // retest over the gate but a sweep run inside it: still noise_suspect
    // (min over ALL observations decides — same rule as before)
    assert(Bench.classWithRetest(1.3, Some(1.8)) === "noise_suspect")
  }

  test("a failed retest falls back to the sweeps' own classification") {
    assert(Bench.classWithRetest(1.6, None) === "systematic")
    assert(Bench.classWithRetest(1.4, None) === "noise_suspect")
  }
}
