package graft

/** Dev A/B for the r17 verdict #3 adjudication: run catalog entries with
  * [[graft.operators.Materialize.cutFinal]] ON vs OFF (the
  * `graft.cutFinal.disable` measurement knob) in ONE JVM, alternating
  * A/B/A/B per round so JVM drift lands on both arms, and print per-arm
  * medians. Measurement-only tool — not part of the bench contract.
  *
  *   sbt "runMain graft.CutToggleAb /root/testdata/sf0.1 3 q_dedup_clusters q_stream_curate"
  */
object CutToggleAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = Sessions.get()
    // warmup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      names.foreach(n => SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
    } catch { case e: Throwable => println(s"[cutab] warmup failed: $e") }

    def time(n: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val on = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val off = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      names.foreach { n =>
        spark.conf.unset(graft.operators.Materialize.CutFinalOffKey)
        val a = time(n)
        spark.conf.set(graft.operators.Materialize.CutFinalOffKey, "true")
        val b = time(n)
        spark.conf.unset(graft.operators.Materialize.CutFinalOffKey)
        on(n) = a :: on(n); off(n) = b :: off(n)
        println(f"[cutab] round$r $n cutON=$a%.2f cutOFF=$b%.2f")
      }
    }
    def med(xs: List[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    names.foreach { n =>
      println(f"[cutab] MEDIAN $n cutON=${med(on(n))}%.2f cutOFF=${med(off(n))}%.2f")
    }
    spark.stop()
  }
}
