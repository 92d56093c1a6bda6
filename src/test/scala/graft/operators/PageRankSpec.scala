package graft.operators

import graft.SparkSpecBase

/** PageRank: hand-checkable graphs where the integer-ppm arithmetic can be
  * verified against closed-form expectations, plus the determinism property
  * the integer design exists for.
  */
class PageRankSpec extends SparkSpecBase {
  private def edgeDf(edges: Seq[(Long, Long)]) =
    spark.createDataFrame(edges).toDF("src", "dst")

  private def scores(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edgeDf(edges), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle is a fixed point at full initial mass") {
    // a↔b: each node passes its whole score on; 150000 + 850000·1e6/1e6 = 1e6.
    val s = scores(Seq((1L, 2L), (2L, 1L)), 5)
    assert(s === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star graph concentrates mass in the hub, leaves get base only") {
    // leaves 2..5 → hub 1; hub dangles. After 1 iter: hub = 150000 +
    // 850000·(4·1e6)/1e6 = 3550000; leaves get no in-links → 150000.
    val s = scores((2L to 5L).map(_ -> 1L), 1)
    assert(s(1L) === 3550000L)
    (2L to 5L).foreach(l => assert(s(l) === 150000L))
  }

  test("out-degree split truncates, never invents mass") {
    // 1 → {2,3} with score 1e6: each gets 500000; 2,3 → nothing.
    // After 1 iter: 2 = 3 = 150000 + 850000·500000/1e6 = 575000.
    val s = scores(Seq((1L, 2L), (1L, 3L)), 1)
    assert(s(2L) === 575000L && s(3L) === 575000L)
    assert(s(1L) === 150000L)
  }

  test("duplicate edges do not double-count") {
    val s1 = scores(Seq((1L, 2L), (1L, 2L), (2L, 1L)), 3)
    val s2 = scores(Seq((1L, 2L), (2L, 1L)), 3)
    assert(s1 === s2)
  }

  test("scores are identical across partition counts (integer determinism)") {
    val edges = edgeDf((0L until 400L).map(i => (i % 20, (i * 7 + 3) % 20)))
    val a = PageRank.run(edges.repartition(1), 4).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = PageRank.run(edges.repartition(13), 4).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
  }
}
