package graft

/** Graph-ANN lifecycle soak (SCALE.md section):
  *   sbt "runMain graft.KnnSoakMain [corpusDir] [outFile]"
  */
object KnnSoakMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/vec_scale")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runKnnLifecycleSoak(spark, dir)
    ScaleMd.upsert(out, "\n## Graph-ANN lifecycle at 10x", md)
    println(s"[knnsoak] appended section to $out")
    println(md)
    spark.stop()
  }
}
