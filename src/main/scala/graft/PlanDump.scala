package graft

/** Dev CLI: write the formatted physical plan of one or more catalog
  * queries to `<outDir>/<name>_<tag>.txt` — the before/after plan
  * evidence the optimization rounds commit under `plans/`.
  *
  *   sbt "runMain graft.PlanDump plans/r18 before /root/testdata/sf0.1 q_a q_b"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    val spark = Sessions.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val plan = try {
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"PLAN FAILED: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
