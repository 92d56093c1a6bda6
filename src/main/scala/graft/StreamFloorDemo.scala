package graft

/** Demonstrates the bench's stream-join floor detectability claim
  * (BENCH `stream_join_data_bound_s`): a join-stage slowdown that barely
  * moves the raw entry time — because ~85% of a stream-join entry is fixed
  * StreamingQuery harness cost — moves (entry − stream_join_floor_s) by a
  * large, unmistakable factor.
  *
  * Method: round-robin sweeps (the Bench convention — a slow JVM phase
  * lands on every measurement a little) of three wall times, medians over
  * the successful runs:
  *   floor   = StreamingQ.harnessJoinFloor  (two zero-row sources through
  *             the real stream-stream join machinery)
  *   entry   = the q_stream_join catalog entry, unmodified
  *   planted = the same dataflow with a busy-burn of `burnMicros` per
  *             matched row inside the join stage (StreamingQ.plantedSlowJoin)
  *
  * Reported: entry, floor, data_bound = entry − floor, planted,
  * planted_data_bound, and the two ratios that make the case —
  * planted/entry (what a reader of raw times sees) vs
  * planted_data_bound/data_bound (what a reader of the subtracted metric
  * sees). Exit 1 if the planted slowdown is NOT visible in the subtracted
  * metric (planted_data_bound ≤ 1.2 × data_bound), so the demo is a check,
  * not just a printout.
  *
  *   sbt "runMain graft.StreamFloorDemo [sfDir] [burnMicros] [runs]"
  */
object StreamFloorDemo {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val burnMicros = args.lift(1).flatMap(_.toIntOption).getOrElse(400)
    val runs = args.lift(2).flatMap(_.toIntOption).getOrElse(5)
    val spark = Sessions.get()
    // warm up codegen + parquet + the streaming machinery once, unmeasured
    try graft.queries.StreamingQ.harnessJoinFloor(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    val legs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "floor" -> (() => graft.queries.StreamingQ.harnessJoinFloor(spark, sfDir)),
      "entry" -> (() => SparkEntry.queries("q_stream_join")(spark, sfDir)),
      "planted" -> (() =>
        graft.queries.StreamingQ.plantedSlowJoin(spark, sfDir, burnMicros)))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to runs).foreach { _ =>
      legs.foreach { case (name, mk) =>
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { mk().write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[floor-demo] $name FAILED: $e"); false
          }
        if (ok) times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
      }
    }
    val floor = median(times("floor"))
    val entry = median(times("entry"))
    val planted = median(times("planted"))
    val db = math.max(0.0, entry - floor)
    val pdb = math.max(0.0, planted - floor)
    def r(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val line =
      s"""{"metric":"stream_floor_demo","sf":"$sfDir","burn_us_per_row":$burnMicros,"runs":$runs,"floor_s":${r(floor)},"entry_s":${r(entry)},"data_bound_s":${r(db)},"planted_s":${r(planted)},"planted_data_bound_s":${r(pdb)},"entry_ratio":${r(if (entry > 0) planted / entry else 0)},"data_bound_ratio":${r(if (db > 0) pdb / db else 0)}}"""
    println(line)
    System.err.println(line)
    spark.stop()
    // the demo's assertion: the planted join-stage cost must be VISIBLE in
    // the subtracted metric — if it isn't, the floor is not doing its job
    if (!(pdb > 1.2 * db)) {
      System.err.println(
        s"[floor-demo] planted slowdown NOT visible: planted_data_bound ${r(pdb)} <= 1.2 x data_bound ${r(db)}")
      sys.exit(1)
    }
  }
}
