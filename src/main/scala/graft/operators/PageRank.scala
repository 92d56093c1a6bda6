package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over an edge list.
  *
  * Scores are carried as parts-per-million longs (initial mass 1 000 000 per
  * node) and every step is integer arithmetic: `contrib = score div outdeg`,
  * `score' = (1−d)·1e6 + (d·1e6 · Σcontrib) div 1e6`. No floats anywhere, so
  * the result is bit-identical across engines, partitionings, and retries —
  * the property that lets a DuckDB oracle (or a re-run on a different
  * cluster) hash-match the scores exactly. The truncation loses < 1 ppm of
  * mass per hop, the standard price of exact reproducibility.
  *
  * Scale posture: each iteration is one key-partitioned join of edges to
  * scores plus one partial+final aggregate on `dst` — the same dataflow a
  * 100 TB graph pays, with no driver-side state. Dangling-node mass is
  * dropped (not redistributed), matching the oracle's arithmetic. For deep
  * iteration counts pass `checkpointEvery` to cut lineage; the cut goes
  * through [[Materialize]], so `graft.checkpoint.reliable=true` upgrades
  * it to DFS checkpoints (executor-loss durability on long runs) and each
  * cut's storage is freed when the next one materializes.
  */
object PageRank {
  /** @param edges       two columns `src`, `dst` (long); duplicates ignored
    * @param iterations  fixed hop count (deterministic termination)
    * @param dampingPpm  damping factor scaled by 1e6 (default 0.85)
    * @param checkpointEvery cut lineage every k iterations (0 = never)
    * @return `(node, score)` — score in ppm of one initial-node mass
    */
  def run(edges: DataFrame, iterations: Int, dampingPpm: Long = 850000L,
          checkpointEvery: Int = 0): DataFrame = {
    require(iterations >= 0 && iterations <= 100,
      s"iterations must be in [0,100], got $iterations")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be in [0,1e6], got $dampingPpm")
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var score = nodes.withColumn("score", lit(1000000L))
    var release: () => Unit = () => ()
    for (i <- 1 to iterations) {
      val contrib = e.join(deg, "src")
        .join(score.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("score div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      score = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(1000000L - dampingPpm) + expr(
            s"($dampingPpm * coalesce(contrib, CAST(0 AS BIGINT))) div 1000000"))
            .as("score"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0) {
        val cut = Materialize.cut(score) // eager
        release() // previous cut's blocks, safe once this one exists
        score = cut.df
        release = cut.release
      }
    }
    score
  }

  /** Personalized PageRank (B106): identical integer-ppm recursion, but the
    * teleport term lands ONLY on the seed set — `score' = (1−d)·1e6·[v ∈ S]
    * + (d·1e6 · Σcontrib) div 1e6`, seeds start at 1e6 and everything else
    * at 0. The result is proximity-to-the-seed-set mass (the random-walk
    * similarity measure data-selection and recommendation pipelines use:
    * "rank the corpus by closeness to THESE documents"), complementing
    * [[run]]'s global importance and the bounded-BFS hop distance over the
    * same seed convention. Same per-iteration dataflow and scale posture
    * as [[run]]; the seed table rides the node-keyed join, so seeds may be
    * corpus-scale without changing the plan.
    *
    * @param seeds one column `node`; rows not in the graph are ignored */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, iterations: Int,
                      dampingPpm: Long = 850000L,
                      checkpointEvery: Int = 0): DataFrame = {
    require(iterations >= 0 && iterations <= 100,
      s"iterations must be in [0,100], got $iterations")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be in [0,1e6], got $dampingPpm")
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // distinct() guards against duplicate seed rows: without it each
    // duplicate fans out every score row through this left join and
    // silently corrupts all subsequent iterations.
    val flagged = nodes
      .join(seeds.select(col("node")).distinct()
        .select(col("node"), lit(true).as("is_seed")), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
    var score = flagged.withColumn("score",
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)))
    var release: () => Unit = () => ()
    for (i <- 1 to iterations) {
      val contrib = e.join(deg, "src")
        .join(score.select(col("node").as("src"), col("score")), "src")
        .select(col("dst"), expr("score div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      score = flagged.join(contrib, flagged("node") === contrib("dst"), "left")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), lit(1000000L - dampingPpm)).otherwise(lit(0L)) +
            expr(s"($dampingPpm * coalesce(contrib, CAST(0 AS BIGINT))) div 1000000"))
            .as("score"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0) {
        val cut = Materialize.cut(score) // eager
        release()
        score = cut.df
        release = cut.release
      }
    }
    score.select(col("node"), col("is_seed"), col("score"))
  }
}
