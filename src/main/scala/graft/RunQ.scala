package graft

/** Dev CLI: run one catalog query and print its wall time and, optionally,
  * the formatted physical plan.
  *
  *   sbt "runMain graft.RunQ q_dedup_minhash_lsh /root/testdata/sf0.1 explain"
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explain = args.contains("explain")
    val spark = Sessions.get()
    if (explain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    // run twice: first includes JVM/codegen warmup, second is steady-state.
    // The ENTRY CALL is inside the timed window — some entries (the
    // streaming harnesses, fixture-building sources) do their real work
    // during construction, and Bench's window includes it too.
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[runq] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
