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

  test("checkpointEvery is a pure materialization knob: scores byte-identical, both durability modes") {
    // the per-round cut goes through Materialize (r16) — cutting every
    // iteration, never, and cutting under reliable checkpoints must all
    // produce the same integer scores; the knob changes WHERE lineage is
    // truncated, never arithmetic.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
    val plain = PageRank.run(edgeDf(edges), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val cut = PageRank.run(edgeDf(edges), 6, checkpointEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cut === plain, "checkpointEvery changed the scores")
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    spark.conf.set(Materialize.ReliableKey, "true")
    spark.conf.set(Materialize.DirKey, scratch("pagerank_reliable"))
    try {
      val rel = PageRank.run(edgeDf(edges), 6, checkpointEvery = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rel === plain, "reliable-mode scores diverged")
    } finally {
      spark.conf.unset(Materialize.ReliableKey)
      spark.conf.unset(Materialize.DirKey)
      sc.setCheckpointDir(prevDir.orNull)
    }
  }

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

  private def seedDf(nodes: Seq[Long]) =
    spark.createDataFrame(nodes.map(Tuple1(_))).toDF("node")

  private def pprScores(edges: Seq[(Long, Long)], seeds: Seq[Long],
                        iters: Int): Map[Long, (Boolean, Long)] =
    PageRank.runPersonalized(edgeDf(edges), seedDf(seeds), iters)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap

  test("PPR: teleport lands only on seeds; mass flows from the seed (hand-derived)") {
    // 1↔2 with seed {1}: s0 = (1e6, 0).
    // iter1: n1 = 150000 + 850000·0//1e6 = 150000; n2 = 0 + 850000·1e6//1e6 = 850000.
    // iter2: n1 = 150000 + 850000·850000//1e6 = 872500; n2 = 850000·150000//1e6 = 127500.
    val s = pprScores(Seq((1L, 2L), (2L, 1L)), Seq(1L), 2)
    assert(s === Map(1L -> ((true, 872500L)), 2L -> ((false, 127500L))))
  }

  test("PPR: nodes unreachable from the seed set stay at exactly zero") {
    // two disjoint 2-cycles, seed in the first — the second never sees mass
    val s = pprScores(Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)), Seq(1L), 4)
    assert(s(3L) === ((false, 0L)) && s(4L) === ((false, 0L)))
    assert(s(1L)._2 > 0L && s(2L)._2 > 0L)
  }

  test("PPR: seed rows outside the graph are ignored; global run is the all-seeds special case") {
    // seeding EVERY node reproduces PageRank.run exactly (same recursion
    // with [v ∈ S] ≡ 1) — the property that pins the two implementations
    // to one recursion; 99 is not a graph node and must change nothing
    val edges = (0L until 60L).map(i => (i % 12, (i * 5 + 1) % 12))
    val global = scores(edges, 3)
    val allSeeded = pprScores(edges, (0L until 12L) :+ 99L, 3)
    assert(allSeeded.keySet === global.keySet)
    allSeeded.foreach { case (n, (seeded, sc)) =>
      assert(seeded, s"node $n should be flagged as seed")
      assert(sc === global(n), s"node $n: all-seeded PPR != global PageRank")
    }
  }
}
