package graft

/** Appends the B99 PCA covariance soak section to SCALE.md: the one-pass
  * mergeable-buffer statistics pass vs the n·d² exploded self-join at the
  * 10× vector scale — see [[graft.operators.ScaleSoak.runPcaSoak]].
  *
  *   sbt "runMain graft.PcaSoakMain [corpusDir] [outFile]"
  */
object PcaSoakMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/vec_scale")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runPcaSoak(spark, dir)
    ScaleMd.upsert(out, "\n## PCA covariance at 10x", md)
    println(s"[pcasoak] appended section to $out")
    println(md)
    spark.stop()
  }
}
