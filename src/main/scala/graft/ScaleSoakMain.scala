package graft

import graft.operators.ScaleSoak

/** Regenerates SCALE.md: the measured scale soak of the dedup/ANN/CC path
  * on the deterministic ~10x corpus (see [[graft.operators.ScaleSoak]]).
  *
  *   sbt "runMain graft.ScaleSoakMain [corpusDir] [outFile]"
  */
object ScaleSoakMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/scale_soak")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val report = ScaleSoak.run(spark, dir)
    val md = ScaleSoak.renderMarkdown(report)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      md.getBytes("UTF-8"))
    println(s"[soak] wrote $out")
    println(md)
    spark.stop()
  }
}
