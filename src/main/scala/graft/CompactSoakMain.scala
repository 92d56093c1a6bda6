package graft

/** Appends the B114 compaction soak section to SCALE.md: a 2048-file
  * small-files-pathology table vs its compacted rewrite, identical
  * full-scan aggregate on both — see
  * [[graft.operators.ScaleSoak.runCompactSoak]].
  *
  *   sbt "runMain graft.CompactSoakMain [scratchDir] [outFile]"
  */
object CompactSoakMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/compact_scale")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runCompactSoak(spark, dir)
    ScaleMd.upsert(out, "\n## Compaction at the small-files pathology", md)
    println(s"[compactsoak] appended section to $out")
    println(md)
    spark.stop()
  }
}
