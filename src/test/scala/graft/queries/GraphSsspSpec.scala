package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** B113 weighted SSSP (q_graph_sssp). The oracle hashes the chained-CTE
  * replay; this spec pins the weighted Bellman theorems:
  *  - dist 0 rows are exactly the seed set;
  *  - every reached non-seed satisfies dist(v) = min over reached
  *    in-neighbors (dist(u) + w(u,v)) — true min-plus optimality within
  *    the bound, not just labels;
  *  - an extra driver-side relaxation round is a no-op (the bound is not
  *    truncating the fixture);
  *  - weights MATTER: some reached node's weighted dist strictly exceeds
  *    its BFS hop count (all weights ≥ 1, so dist ≥ hops always — strict
  *    somewhere proves non-unit weights sit on optimal paths, i.e. the
  *    entry is not BFS in disguise).
  */
class GraphSsspSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def wEdges = graft.Tables.lineitem(spark, sf)
    .select((col("l_orderkey") % 100).as("src"),
      (col("l_partkey") % 100).as("dst"), col("l_quantity").as("q"))
    .filter(col("src") =!= col("dst"))
    .groupBy(col("src"), col("dst")).agg(min(col("q")).cast("long").as("w"))
    .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

  private def dist = Graph.defs("q_graph_sssp")(spark, sf)
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("dist-0 rows are exactly the seed set") {
    val e = wEdges.keySet
    val nodes = (e.map(_._1) ++ e.map(_._2))
    val seeds = nodes.filter(_ % 29 == 3)
    assert(seeds.nonEmpty)
    assert(dist.filter(_._2 == 0L).keySet == seeds)
  }

  test("reached non-seeds satisfy weighted Bellman optimality") {
    val d = dist
    val in = wEdges.toSeq.groupBy(_._1._2)
    val nonSeeds = d.filter(_._2 > 0L)
    assert(nonSeeds.nonEmpty)
    nonSeeds.foreach { case (v, dv) =>
      val best = in(v).flatMap { case ((u, _), w) => d.get(u).map(_ + w) }.min
      assert(dv == best, s"node $v: dist $dv but best relaxation $best")
    }
  }

  test("an extra relaxation round is a no-op at the catalog bound") {
    val d = dist
    val after = wEdges.foldLeft(d) { case (acc, ((u, v), w)) =>
      acc.get(u) match {
        case Some(du) if !acc.get(v).exists(_ <= du + w) => acc + (v -> (du + w))
        case _ => acc
      }
    }
    assert(after == d, "an extra round still relaxes — raise the bound")
  }

  test("weights matter: some node's weighted dist strictly exceeds its hop count") {
    val hops = Graph.defs("q_graph_bfs")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = dist
    assert(d.keySet == hops.keySet, "same reachability under either metric")
    assert(d.forall { case (v, dv) => dv >= hops(v) },
      "weighted dist must dominate hop count at weights >= 1")
    assert(d.exists { case (v, dv) => dv > hops(v) },
      "no node where weights changed the distance — the entry degenerated to BFS")
  }
}
