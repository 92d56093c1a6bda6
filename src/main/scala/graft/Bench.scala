package graft

/** Benchmark main — runs the query catalog on SPARK_GRAFT_SF_DIR and prints
  * one JSON line `{"metric":"total","value":N,"unit":"sec","queries":{...},
  * "failed":[...],"sf":...}`.
  *
  * Harness notes:
  *  - session comes from [[Sessions]] (AQE, UTC, nanosAsLong) — the same
  *    configuration Verify and the tests run under;
  *  - each query is driven by a `noop`-format write, which fully evaluates
  *    every output column (a `.count()` would let Catalyst prune all
  *    projections that don't affect row count and measure only the scan);
  *  - failures are recorded per query (`"failed"` list + nonzero exit), never
  *    silently folded into a timing;
  *  - the deliberately-quadratic all-pairs correctness baseline
  *    q_dedup_ngram_jaccard is excluded: it exists as the oracle for the LSH
  *    variants at small sf and would be three-quarters of the wall time here.
  */
object Bench {
  private val excluded = Set("q_dedup_ngram_jaccard")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get()
    // Warm up the JVM (codegen compiler, parquet readers, shuffle machinery)
    // so the first measured query doesn't absorb ~10 s of one-time cost.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries("q_agg_pricing")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => excluded(name) }
      .map { case (name, fn) =>
        // collect the previous query's garbage OUTSIDE the timed window so
        // a stop-the-world pause doesn't land on a random victim query
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e"); false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    // 4-decimal timings keep the whole line ~3x shorter — the r2 driver log
    // tail truncated the head of the full-precision line, losing the JSON.
    def sec(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // The full line is ~25 bytes/query (~3 KB at 115 queries) — longer than a
    // log-tail capture window, so a parser that only sees the end of the run
    // can find the line's tail but not its head. Emit a second, compact line
    // LAST (slowest 20 queries only, full map persisted to a file) so a
    // complete parseable JSON line always sits within the final ~1.5 KB of
    // output on both streams.
    val top = results.sortBy(-_._2).take(20)
      .map { case (k, v, _) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    // "slowest20", not "queries": a parser that takes the first line with a
    // "queries" map must never mistake this truncated top-20 map for the
    // complete per-query set (that is the full line / bench_last.json).
    val compact =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","slowest20":$top,"queries_reported":${math.min(20, results.size)},"queries_run":${results.size},"failed":$failed,"sf":"$sfDir","full":"target/bench_last.json"}"""
    // Both lines on BOTH streams so the driver's parser finds one regardless
    // of which stream it captures; full line also persisted to a file so a
    // truncated log tail can never lose it.
    println(line)
    System.err.println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_last.json"), line + "\n")
    catch { case _: Throwable => () }
    println(compact)
    System.err.println(compact)
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
