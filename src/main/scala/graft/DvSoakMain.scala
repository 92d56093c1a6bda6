package graft

/** Appends the B137 deletion-vector soak section to SCALE.md: merge-on-read
  * vs copy-on-write on a 2M-row table, clustered vs scattered delete shapes
  * — see [[graft.operators.ScaleSoak.runDvSoak]].
  *
  *   sbt "runMain graft.DvSoakMain [scratchDir] [outFile]"
  */
object DvSoakMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/dv_scale")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runDvSoak(spark, dir)
    ScaleMd.upsert(out, "\n## Deletion vectors at 2M rows", md)
    println(s"[dvsoak] appended section to $out")
    println(md)
    spark.stop()
  }
}
