package graft

/** Appends the 10×-vector-scale evidence section to SCALE.md (r10 verdict
  * #5): 200k+2k synthetic vectors, the soak's planted-dup protocol, geometry
  * derived (not hand-tuned) at the new size — see
  * [[graft.operators.ScaleSoak.runVectorScale]].
  *
  *   sbt "runMain graft.VecScaleMain [corpusDir] [outFile]"
  */
object VecScaleMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/vec_scale")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runVectorScale(spark, dir)
    ScaleMd.upsert(out, "\n## Vector scale 10x", md)
    println(s"[vecscale] appended section to $out")
    println(md)
    spark.stop()
  }
}
