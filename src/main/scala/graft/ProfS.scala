package graft

import scala.collection.mutable
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev profiler for the STREAMING entries (r17 verdict "next round" #1):
  * run one catalog query (or the bench's harness floors) under the bench's
  * noop-sink methodology with a [[StreamingQueryListener]] attached and
  * print, per micro-batch, the engine's own `durationMs` breakdown —
  * triggerExecution and its components (latestOffset/getBatch source
  * calls, queryPlanning, walCommit = offset-log write, commitOffsets =
  * commit-log write, addBatch = the batch job itself) plus the
  * stateOperators' commit times and the gaps BETWEEN batches that no
  * component owns (trigger scheduling). This is the guide-§1 instrument
  * for "where does the streaming harness floor actually go" on a UI-less
  * box; [[ProfQ]] answers the same question for batch stages.
  *
  *   sbt "runMain graft.ProfS q_stream_join /root/testdata/sf0.1 [runs]"
  *   sbt "runMain graft.ProfS __floor /root/testdata/sf0.1"       (stateless floor)
  *   sbt "runMain graft.ProfS __join_floor /root/testdata/sf0.1"  (stateful floor)
  *
  * Measurement-only tool — not part of the bench contract or the catalog.
  */
object ProfS {
  /** (queryName, batchId, durationMs, inputRows, stateCommitMs,
    * stateRows, observedAtMs) rows published by [[ProfSListener]] —
    * static so listener instances on EVERY session (the streaming
    * entries run on `newSession()` children with their own
    * StreamingQueryManager) share one sink. */
  val sink = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, Long, Map[String, Long], Long, Long, Long, Long)]()

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    // registered as a CONF listener class: newSession() children create
    // their own StreamingQueryManager, which instantiates listeners from
    // this conf — a programmatic addListener on the root session would
    // never see the children's queries
    val spark = Sessions.builder()
      .config("spark.sql.streaming.streamingQueryListeners",
        classOf[ProfSListener].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mk(): org.apache.spark.sql.DataFrame = name match {
      case "__floor" => graft.queries.StreamingQ.harnessFloor(spark, sfDir)
      case "__join_floor" => graft.queries.StreamingQ.harnessJoinFloor(spark, sfDir)
      case _ => SparkEntry.queries(name)(spark, sfDir)
    }

    // warmup (codegen, parquet readers, fixture builds) — same as Bench
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      mk().write.mode("overwrite").format("noop").save()
    } catch { case e: Throwable => println(s"[profs] warmup failed: $e") }

    (1 to runs).foreach { i =>
      sink.clear()
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain trailing listener events
      println(f"[profs] $name run$i wall=$wall%.2f s")
      val evs = {
        val b = mutable.ArrayBuffer.empty[
          (String, Long, Map[String, Long], Long, Long, Long, Long)]
        val it = sink.iterator(); while (it.hasNext) b += it.next()
        b.toSeq.sortBy(p => (p._7, p._1, p._2))
      }
      val keys = Seq("triggerExecution", "latestOffset", "getBatch",
        "queryPlanning", "walCommit", "commitOffsets", "addBatch")
      println(f"[profs] ${"query"}%-24s ${"batch"}%5s ${"rows"}%7s " +
        keys.map(k => f"$k%17s").mkString + f" ${"stateMs"}%8s ${"stateRows"}%9s")
      evs.foreach { case (q, batch, dur, rows, sms, srows, _) =>
        println(f"[profs] ${q.take(24)}%-24s $batch%5d $rows%7d " +
          keys.map(k => f"${dur.getOrElse(k, -1L)}%17d").mkString +
          f" $sms%8d $srows%9d")
      }
      // totals: how much of the wall the engine's own components explain
      val trig = evs.map(_._3.getOrElse("triggerExecution", 0L)).sum
      val comp = keys.drop(1).map(k => k -> evs.map(_._3.getOrElse(k, 0L)).sum)
      println(f"[profs] batches=${evs.size} triggerExecutionSum=${trig}ms " +
        comp.map { case (k, v) => s"$k=${v}ms" }.mkString(" ") +
        f" unattributedWall=${(wall * 1000).toLong - trig}ms")
    }
    spark.stop()
  }
}

/** Conf-registered listener (no-arg constructor) publishing every
  * progress event to [[ProfS.sink]] — instantiated by EACH session's
  * StreamingQueryManager, including `newSession()` children. */
class ProfSListener extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val m = scala.collection.mutable.Map.empty[String, Long]
    p.durationMs.forEach((k, v) => m(k) = v)
    val (sms, srows) = p.stateOperators.foldLeft((0L, 0L)) { (acc, so) =>
      (acc._1 + so.commitTimeMs, acc._2 + so.numRowsTotal)
    }
    ProfS.sink.add((p.name, p.batchId, m.toMap, p.numInputRows, sms, srows,
      System.currentTimeMillis()))
  }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
