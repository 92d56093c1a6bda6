package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stateful-streaming shuffle-partition formula (SURVEY.md §2 B44
  * scale posture): partitions = state-store instances, sized to the state
  * key space and clamped to what the cluster's cores can usefully run. */
class SessionsSpec extends AnyFunSuite {

  test("statefulShufflePartitions sizes to keys, clamped to cores") {
    // the harness case: ≤1500 keys at 200/store on a 32-thread master
    assert(Sessions.statefulShufflePartitions(1500, 200, 32) === 8)
    // small key space never rounds to zero stores
    assert(Sessions.statefulShufflePartitions(0, 1000, 32) === 1)
    assert(Sessions.statefulShufflePartitions(50, 1000, 32) === 1)
    // a 1B-key job on 400 cores wants the state bound, not the default 200
    assert(Sessions.statefulShufflePartitions(1000000000L, 500000, 400) === 2000)
    // ...until the core clamp (8 stores/core) caps runaway partition counts
    assert(Sessions.statefulShufflePartitions(1000000000L, 1000, 400) === 3200)
    intercept[IllegalArgumentException](
      Sessions.statefulShufflePartitions(10, 0, 32))
  }
}
