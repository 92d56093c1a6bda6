package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.PageRank

/** Graph analytics over relational edge lists (SURVEY.md §2 Part B
  * extensions): PageRank and triangle counting, the two canonical
  * joins-as-graph-ops. The graph is derived from lineitem with modded keys
  * (a ~100-node multigraph) so the oracle stays cheap; the dataflow is the
  * one a billion-edge graph pays — distinct edges once, then per-iteration
  * key-partitioned join + aggregate (PageRank) or a two-hop self-join bounded
  * by degree (triangles). Complements [[graft.operators.ConnectedComponents]]
  * (the third classic, exercised by q_dedup_clusters).
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Directed edges: (orderkey mod 100) → (partkey mod 100), self-loops
    * dropped, deduplicated inside the consumers. */
  private def edges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select((col("l_orderkey") % 100).as("src"), (col("l_partkey") % 100).as("dst"))
      .filter(col("src") =!= col("dst"))

  /** B100 relaxation rounds — the hop bound. Every round is one
    * edges ⋈ dist join + one min-aggregate, so the bound is also the
    * round-trip count a 1000-executor run pays; mirrored in the oracle's
    * chained CTEs. */
  private val BfsRounds = 4

  /** B101 synchronous label-propagation rounds. Fixed-round SYNCHRONOUS
    * LPA with a total tie order (max neighbor-label count, then MIN label)
    * is fully deterministic — the async/random-order variant the original
    * paper uses is not replayable across engines, so the catalog pins the
    * deterministic form (the same choice GraphFrames made). */
  private val LpaRounds = 3

  /** Sparser undirected graph for LPA: the mod-100 multigraph is so dense
    * one community swallows it (probed: 1 label in 3 rounds); mod-1000
    * nodes restricted to rare line items (l_quantity ≤ 2) keeps real
    * structure at every fixture density (probed: 189 / 174 / 9 communities
    * at sf0.001/0.01/0.1). */
  private def lpaEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") <= 2)
      .select((col("l_orderkey") % 1000).as("a"), (col("l_partkey") % 1000).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()

  val defs: Map[String, Q] = Map(
    // 3 integer-exact PageRank hops (graft.operators.PageRank): each hop is
    // one edges⋈scores join + one partial+final aggregate on dst — linear in
    // edges, no driver state, bit-reproducible (all-integer ppm arithmetic).
    "q_graph_pagerank" -> { (s, d) =>
      PageRank.run(edges(s, d), iterations = 3).orderBy(col("node"))
    },

    // Triangle count: canonical undirected edges (u < v, distinct), then the
    // two-hop join e(a,b)⋈e(b,c)⋈e(a,c) with a<b<c — each triangle counted
    // exactly once. At 100 TB the join fans out by degree²; production adds
    // degree-ordered orientation (high-degree nodes never expand), which the
    // u<v canonicalization here is the first half of.
    "q_graph_triangles" -> { (s, d) =>
      val und = edges(s, d)
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
      val e1 = und.select(col("u").as("a"), col("v").as("b"))
      val e2 = und.select(col("u").as("b2"), col("v").as("c"))
      val e3 = und.select(col("u").as("a3"), col("v").as("c3"))
      e1.join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c") === col("c3"))
        .agg(count(lit(1)).as("n_triangles"))
    },

    // B100 bounded multi-source BFS: hop distances from a seed set via
    // BfsRounds Bellman-Ford relaxations — each round ONE dist ⋈ edges join
    // plus ONE min-aggregate on node, i.e. cost ∝ |edges| per round with no
    // driver state and no frontier collect; after round r every node holds
    // its exact shortest hop count over paths of length ≤ r (unreached
    // nodes are absent, the production convention — an outer join against
    // the node set would materialize the infinite rows). At 100 TB the
    // dist table is node-sized, so both join sides shuffle on the same key
    // each round and the hop BOUND (not the diameter) caps the round-trips
    // — the reason bounded BFS, not full transitive closure, is the
    // operator large-graph systems ship.
    "q_graph_bfs" -> { (s, d) =>
      val e = edges(s, d).distinct()
      var dist = e.select(col("src").as("node"))
        .union(e.select(col("dst")))
        .distinct()
        .filter(col("node") % 29 === 3)
        .select(col("node"), lit(0L).as("dist"))
      for (_ <- 1 to BfsRounds) {
        // the dist table derives from the edge table (seeds are nodes of e),
        // so the join is a self-join — qualify both sides
        val relaxed = dist.as("dd").join(e.as("ee"), col("dd.node") === col("ee.src"))
          .select(col("ee.dst").as("node"), (col("dd.dist") + 1).as("dist"))
        dist = dist.union(relaxed).groupBy(col("node"))
          .agg(min(col("dist")).as("dist"))
      }
      dist.orderBy(col("node"))
    },

    // B113 WEIGHTED single-source shortest paths — the Bellman-Ford
    // relaxation q_graph_bfs runs, generalized from hop counts to integer
    // edge weights (w = min l_quantity over the edge's underlying line
    // items — the multigraph collapses to its cheapest parallel edge,
    // exactly what min-plus relaxation wants): dist' = min(dist,
    // dist_src + w) per round, so after r rounds every node holds its
    // exact cheapest cost over paths of ≤ r edges (same bound semantics,
    // same per-round join+min-aggregate dataflow and scale posture as
    // BFS; unreached nodes absent). All-integer arithmetic —
    // bit-reproducible, and the oracle replays the rounds as chained CTEs.
    "q_graph_sssp" -> { (s, d) =>
      val e = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 100).as("src"),
          (col("l_partkey") % 100).as("dst"), col("l_quantity").as("q"))
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(min(col("q")).cast("long").as("w"))
      var dist = e.select(col("src").as("node"))
        .union(e.select(col("dst")))
        .distinct()
        .filter(col("node") % 29 === 3)
        .select(col("node"), lit(0L).as("dist"))
      for (_ <- 1 to BfsRounds) {
        val relaxed = dist.as("dd").join(e.as("ee"), col("dd.node") === col("ee.src"))
          .select(col("ee.dst").as("node"), (col("dd.dist") + col("ee.w")).as("dist"))
        dist = dist.union(relaxed).groupBy(col("node"))
          .agg(min(col("dist")).as("dist"))
      }
      dist.orderBy(col("node"))
    },

    // B106 personalized PageRank from the q_graph_bfs seed set (node % 29
    // ≡ 3): the teleport term lands only on seeds, so scores measure
    // random-walk PROXIMITY to the seed set — the similarity rank
    // data-selection pipelines use ("expand from these known-good docs"),
    // next to BFS's hop DISTANCE from the same seeds. Same integer-ppm
    // recursion and per-hop join+aggregate dataflow as q_graph_pagerank
    // (graft.operators.PageRank.runPersonalized), bit-reproducible by the
    // same argument.
    "q_graph_ppr" -> { (s, d) =>
      val e = edges(s, d).distinct()
      val seeds = e.select(col("src").as("node"))
        .union(e.select(col("dst")))
        .distinct()
        .filter(col("node") % 29 === 3)
      PageRank.runPersonalized(e, seeds, iterations = 3).orderBy(col("node"))
    },

    // B101 community detection by synchronous label propagation (Raghavan
    // et al. 2007, the deterministic fixed-round variant — see LpaRounds):
    // per round ONE neighbor-labels join + ONE (node, label) count
    // aggregate + ONE per-node top-1 window — the window orders each
    // node's DISTINCT neighbor labels (bounded by degree), never the
    // corpus. Labels are node ids, so min-label ties are stable and the
    // whole computation is integer-exact. Complements PageRank
    // (importance), triangles (cohesion), CC (reachability), BFS
    // (distance), and the mutual-kNN clusters (B98 operates on a derived
    // similarity graph; this operates on any explicit edge list).
    "q_graph_labelprop" -> { (s, d) =>
      val und = lpaEdges(s, d)
      val dir = und.select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
      var labels = dir.select(col("node")).distinct()
        .withColumn("label", col("node"))
      val w = Window.partitionBy(col("node")).orderBy(col("c").desc, col("label"))
      for (_ <- 1 to LpaRounds) {
        labels = dir.as("d").join(labels.as("l"), col("l.node") === col("d.nbr"))
          .groupBy(col("d.node").as("node"), col("l.label").as("label"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("node"), col("label"))
      }
      labels.orderBy(col("node"))
    })

  val oracle: Map[String, String] = Map(
    "q_graph_pagerank" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
        |  FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 100),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes),
        |c1 AS (SELECT e.dst, CAST(sum(s.score // d.outdeg) AS BIGINT) AS contrib
        |       FROM edges e JOIN deg d ON d.src = e.src JOIN s0 s ON s.node = e.src
        |       GROUP BY e.dst),
        |s1 AS (SELECT n.node, CAST(150000 +
        |         (850000 * coalesce(c.contrib, 0)) // 1000000 AS BIGINT) AS score
        |       FROM nodes n LEFT JOIN c1 c ON c.dst = n.node),
        |c2 AS (SELECT e.dst, CAST(sum(s.score // d.outdeg) AS BIGINT) AS contrib
        |       FROM edges e JOIN deg d ON d.src = e.src JOIN s1 s ON s.node = e.src
        |       GROUP BY e.dst),
        |s2 AS (SELECT n.node, CAST(150000 +
        |         (850000 * coalesce(c.contrib, 0)) // 1000000 AS BIGINT) AS score
        |       FROM nodes n LEFT JOIN c2 c ON c.dst = n.node),
        |c3 AS (SELECT e.dst, CAST(sum(s.score // d.outdeg) AS BIGINT) AS contrib
        |       FROM edges e JOIN deg d ON d.src = e.src JOIN s2 s ON s.node = e.src
        |       GROUP BY e.dst),
        |s3 AS (SELECT n.node, CAST(150000 +
        |         (850000 * coalesce(c.contrib, 0)) // 1000000 AS BIGINT) AS score
        |       FROM nodes n LEFT JOIN c3 c ON c.dst = n.node)
        |SELECT node, score FROM s3 ORDER BY node""".stripMargin,

    // personalized variant: same chained-CTE replay with the teleport term
    // gated on the seed flag
    "q_graph_ppr" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
        |  FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 100),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |sd AS (SELECT node, (node % 29 = 3) AS is_seed FROM nodes),
        |s0 AS (SELECT node, is_seed,
        |       CAST(CASE WHEN is_seed THEN 1000000 ELSE 0 END AS BIGINT) AS score FROM sd),
        |c1 AS (SELECT e.dst, CAST(sum(s.score // d.outdeg) AS BIGINT) AS contrib
        |       FROM edges e JOIN deg d ON d.src = e.src JOIN s0 s ON s.node = e.src
        |       GROUP BY e.dst),
        |s1 AS (SELECT n.node, n.is_seed, CAST(CASE WHEN n.is_seed THEN 150000 ELSE 0 END +
        |         (850000 * coalesce(c.contrib, 0)) // 1000000 AS BIGINT) AS score
        |       FROM sd n LEFT JOIN c1 c ON c.dst = n.node),
        |c2 AS (SELECT e.dst, CAST(sum(s.score // d.outdeg) AS BIGINT) AS contrib
        |       FROM edges e JOIN deg d ON d.src = e.src JOIN s1 s ON s.node = e.src
        |       GROUP BY e.dst),
        |s2 AS (SELECT n.node, n.is_seed, CAST(CASE WHEN n.is_seed THEN 150000 ELSE 0 END +
        |         (850000 * coalesce(c.contrib, 0)) // 1000000 AS BIGINT) AS score
        |       FROM sd n LEFT JOIN c2 c ON c.dst = n.node),
        |c3 AS (SELECT e.dst, CAST(sum(s.score // d.outdeg) AS BIGINT) AS contrib
        |       FROM edges e JOIN deg d ON d.src = e.src JOIN s2 s ON s.node = e.src
        |       GROUP BY e.dst),
        |s3 AS (SELECT n.node, n.is_seed, CAST(CASE WHEN n.is_seed THEN 150000 ELSE 0 END +
        |         (850000 * coalesce(c.contrib, 0)) // 1000000 AS BIGINT) AS score
        |       FROM sd n LEFT JOIN c3 c ON c.dst = n.node)
        |SELECT node, is_seed, score FROM s3 ORDER BY node""".stripMargin,

    "q_graph_triangles" ->
      """WITH und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM (
        |    SELECT l_orderkey % 100 AS src, l_partkey % 100 AS dst
        |    FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 100))
        |SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |FROM und e1 JOIN und e2 ON e2.u = e1.v
        |JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin,

    // bounded BFS: the same relaxation rounds as chained CTEs — integer
    // arithmetic throughout, so the replay is exact by construction
    "q_graph_bfs" -> {
      def round(r: Int): String =
        s"""d$r AS (SELECT node, min(dist) AS dist FROM (
           |  SELECT node, dist FROM d${r - 1}
           |  UNION ALL
           |  SELECT e.dst AS node, p.dist + 1 AS dist
           |  FROM d${r - 1} p JOIN edges e ON e.src = p.node) t
           |GROUP BY node)""".stripMargin
      s"""WITH edges AS (
         |  SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
         |  FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 100),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
         |       WHERE node % 29 = 3),
         |${(1 to BfsRounds).map(round).mkString(",\n")}
         |SELECT node, dist FROM d$BfsRounds ORDER BY node""".stripMargin
    },

    // weighted SSSP: the BFS replay with +w relaxation over the
    // cheapest-parallel-edge weights
    "q_graph_sssp" -> {
      def round(r: Int): String =
        s"""d$r AS (SELECT node, min(dist) AS dist FROM (
           |  SELECT node, dist FROM d${r - 1}
           |  UNION ALL
           |  SELECT e.dst AS node, p.dist + e.w AS dist
           |  FROM d${r - 1} p JOIN edges e ON e.src = p.node) t
           |GROUP BY node)""".stripMargin
      s"""WITH edges AS (
         |  SELECT src, dst, CAST(min(q) AS BIGINT) AS w FROM (
         |    SELECT l_orderkey % 100 AS src, l_partkey % 100 AS dst,
         |           l_quantity AS q FROM lineitem) t
         |  WHERE src <> dst GROUP BY src, dst),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
         |       WHERE node % 29 = 3),
         |${(1 to BfsRounds).map(round).mkString(",\n")}
         |SELECT node, dist FROM d$BfsRounds ORDER BY node""".stripMargin
    },

    // synchronous LPA: the same rounds as chained CTEs — all-integer, so
    // the replay is exact; ties by (count DESC, label ASC) in both engines
    "q_graph_labelprop" -> {
      def round(r: Int): String =
        s"""c$r AS (SELECT d.node, l.label, count(*) AS c
           |  FROM dir d JOIN l${r - 1} l ON l.node = d.nbr GROUP BY 1, 2),
           |l$r AS (SELECT node, label FROM (
           |  SELECT node, label, row_number() OVER (
           |    PARTITION BY node ORDER BY c DESC, label) AS rn
           |  FROM c$r) t WHERE rn = 1)""".stripMargin
      s"""WITH und AS (
         |  SELECT DISTINCT least(l_orderkey % 1000, l_partkey % 1000) AS u,
         |    greatest(l_orderkey % 1000, l_partkey % 1000) AS v
         |  FROM lineitem
         |  WHERE l_orderkey % 1000 <> l_partkey % 1000 AND l_quantity <= 2),
         |dir AS (SELECT u AS node, v AS nbr FROM und
         |  UNION ALL SELECT v AS node, u AS nbr FROM und),
         |l0 AS (SELECT DISTINCT node, node AS label FROM dir),
         |${(1 to LpaRounds).map(round).mkString(",\n")}
         |SELECT node, label FROM l$LpaRounds ORDER BY node""".stripMargin
    })
}
