package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** B100 bounded multi-source BFS (q_graph_bfs). The correctness gate hashes
  * the output against the chained-CTE oracle; this spec pins the GRAPH
  * theorems the hash alone wouldn't localize:
  *  - dist 0 rows are exactly the seed set;
  *  - every reached non-seed node satisfies the Bellman optimality equation
  *    dist(v) = 1 + min over in-neighbors dist(u) — i.e. the rounds
  *    computed true shortest hop counts, not just any labels;
  *  - the fixture converges within the catalog's round bound (running the
  *    relaxation longer changes nothing), so the bound is not truncating
  *    this graph and the entry is stable if BfsRounds ever rises.
  */
class GraphBfsSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def edges = graft.Tables.lineitem(spark, sf)
    .select((col("l_orderkey") % 100).as("src"), (col("l_partkey") % 100).as("dst"))
    .filter(col("src") =!= col("dst"))
    .distinct()
    .collect().map(r => (r.getLong(0), r.getLong(1)))

  private def dist = Graph.defs("q_graph_bfs")(spark, sf)
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("dist-0 rows are exactly the seed set") {
    val e = edges
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val seeds = nodes.filter(_ % 29 == 3).toSet
    assert(seeds.nonEmpty, "fixture lost its seeds — re-derive the seed rule")
    assert(dist.filter(_._2 == 0L).keySet == seeds)
  }

  test("reached non-seeds satisfy the Bellman optimality equation") {
    val d = dist
    val inNbrs = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nonSeeds = d.filter(_._2 > 0L)
    assert(nonSeeds.nonEmpty, "vacuous fixture: every node is a seed")
    nonSeeds.foreach { case (v, dv) =>
      val best = inNbrs(v).flatMap(d.get).min
      assert(dv == best + 1, s"node $v: dist $dv but best in-neighbor $best")
    }
  }

  test("the fixture converges within the catalog round bound") {
    val d = dist
    // one more relaxation round, driver-side, must be a no-op
    val relaxedOnce = d.map { case (v, dv) => v -> dv }.toMap
    val e = edges
    val after = e.foldLeft(relaxedOnce) { case (acc, (u, v)) =>
      acc.get(u) match {
        case Some(du) if !acc.get(v).exists(_ <= du + 1) => acc + (v -> (du + 1))
        case _ => acc
      }
    }
    assert(after == d, "an extra round still relaxes — raise BfsRounds")
  }
}
