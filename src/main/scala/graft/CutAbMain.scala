package graft

/** Appends the zero-copy-cut A/B section (r16 verdict #5) to SCALE.md —
  * see [[graft.operators.ScaleSoak.runCutAbSoak]].
  *
  *   sbt "runMain graft.CutAbMain [outFile]"
  */
object CutAbMain {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runCutAbSoak(spark)
    ScaleMd.upsert(out,
      "\n## Zero-copy lineage cut (r17)",
      "\n## Zero-copy lineage cut (r17)\n" + md)
    println(s"[cut-ab] appended section to $out")
    println(md)
    spark.stop()
  }
}
