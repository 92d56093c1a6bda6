package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiler: run one catalog query under the bench's noop-sink
  * methodology with a SparkListener attached, and print a per-job /
  * per-stage cost breakdown (wall, task time, shuffle bytes, input bytes).
  * This is the guide-§1 "where is the time actually going" instrument for a
  * UI-less box (Sessions pins spark.ui.enabled=false).
  *
  *   sbt "runMain graft.ProfQ q_embed_ivfpq /root/testdata/sf0.1 [runs]"
  *
  * Measurement-only tool — not part of the bench contract or the catalog.
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.get()

    final case class StageRow(stageId: Int, name: String, var wallMs: Long,
                              var taskMs: Long, var shufWrite: Long,
                              var shufRead: Long, var input: Long,
                              var tasks: Int)
    val stages = mutable.LinkedHashMap.empty[Int, StageRow]
    val jobOfStage = mutable.Map.empty[Int, Int]
    val jobWall = mutable.LinkedHashMap.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        j.stageIds.foreach(s => jobOfStage(s) = j.jobId)
        jobWall(j.jobId) = -System.currentTimeMillis()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobWall(j.jobId) = jobWall.getOrElse(j.jobId, 0L) + System.currentTimeMillis()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val r = stages.getOrElseUpdate(si.stageId,
          StageRow(si.stageId, si.name.takeWhile(_ != '\n'), 0, 0, 0, 0, 0, 0))
        r.wallMs += si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        r.tasks += si.numTasks
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val r = stages.getOrElseUpdate(te.stageId,
            StageRow(te.stageId, "?", 0, 0, 0, 0, 0, 0))
          r.taskMs += m.executorRunTime
          r.shufWrite += m.shuffleWriteMetrics.bytesWritten
          r.shufRead += m.shuffleReadMetrics.totalBytesRead
          r.input += m.inputMetrics.bytesRead
        }
      }
    }

    // warmup run (codegen, parquet readers) — same as Bench's warmup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    } catch { case e: Throwable => println(s"[profq] warmup failed: $e") }

    spark.sparkContext.addSparkListener(listener)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[profq] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let trailing listener events drain

    println(f"[profq] ${"stage"}%7s ${"job"}%4s ${"wallMs"}%8s ${"taskMs"}%8s " +
      f"${"shufW"}%10s ${"shufR"}%10s ${"input"}%10s ${"tasks"}%5s  name")
    stages.values.toSeq.sortBy(-_.taskMs).take(40).foreach { r =>
      println(f"[profq] ${r.stageId}%7d ${jobOfStage.getOrElse(r.stageId, -1)}%4d " +
        f"${r.wallMs}%8d ${r.taskMs}%8d ${r.shufWrite}%10d ${r.shufRead}%10d " +
        f"${r.input}%10d ${r.tasks}%5d  ${r.name.take(60)}")
    }
    val totTask = stages.values.map(_.taskMs).sum
    val totWall = jobWall.values.filter(_ > 0).sum
    println(f"[profq] total taskMs=$totTask jobWallMs=$totWall jobs=${jobWall.size} stages=${stages.size}")
    spark.stop()
  }
}
