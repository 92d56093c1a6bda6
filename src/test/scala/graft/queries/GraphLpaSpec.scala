package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** B101 synchronous label propagation (q_graph_labelprop). The correctness
  * gate hashes the output against the chained-CTE oracle; this spec pins
  * the ALGORITHM against an independent driver-side implementation (plain
  * Scala maps, no SQL in common with either engine) plus the structural
  * claims a hash wouldn't localize.
  */
class GraphLpaSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def edges: Seq[(Long, Long)] =
    graft.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") <= 2)
      .select((col("l_orderkey") % 1000).as("a"), (col("l_partkey") % 1000).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def got: Map[Long, Long] =
    Graph.defs("q_graph_labelprop")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Independent sync-LPA: 3 rounds, new label = min among the labels with
    * max count over the node's (undirected) neighbors. */
  private def reference(e: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbrs = (e ++ e.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      labels = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(labels).view.mapValues(_.size)
        val maxC = counts.values.max
        v -> counts.collect { case (l, c) if c == maxC => l }.min
      }
    }
    labels
  }

  test("engine labels equal an independent driver-side sync-LPA recount") {
    val g = got
    val ref = reference(edges, rounds = 3)
    assert(g.size == ref.size, s"node sets differ: ${g.size} vs ${ref.size}")
    val diff = g.collect { case (v, l) if ref(v) != l => (v, l, ref(v)) }
    assert(diff.isEmpty, s"labels diverge at ${diff.take(5)}")
  }

  test("the labeling is a non-vacuous partition") {
    val g = got
    val bySize = g.groupBy(_._2).map(_._2.size)
    assert(bySize.size > 1, "one community swallowed the graph — vacuous")
    assert(bySize.max >= 3, "all (near-)singletons — propagation never moved")
    // every assigned label is itself a node of the graph (labels are ids)
    val nodes = g.keySet
    assert(g.values.forall(nodes.contains), "label escaped the node set")
  }
}
