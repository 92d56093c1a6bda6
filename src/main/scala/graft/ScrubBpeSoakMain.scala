package graft

/** Appends the scrub + BPE 10× text soak section (r11 verdict #6) to
  * SCALE.md — the CMS-prefilter byte measurement and one BPE training
  * round on the 100k-doc soak corpus; see
  * [[graft.operators.ScaleSoak.runScrubBpeSoak]].
  *
  *   sbt "runMain graft.ScrubBpeSoakMain [corpusDir] [outFile]"
  */
object ScrubBpeSoakMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/scale_soak")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runScrubBpeSoak(spark, dir)
    ScaleMd.upsert(out, "\n## Scrub + BPE 10x text soak", md)
    println(s"[scrub-bpe-soak] appended section to $out")
    println(md)
    spark.stop()
  }
}
