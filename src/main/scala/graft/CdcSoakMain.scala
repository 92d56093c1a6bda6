package graft

/** Appends the streaming-CDC fold soak section to SCALE.md — see
  * [[graft.operators.ScaleSoak.runCdcSoak]].
  *
  *   sbt "runMain graft.CdcSoakMain [scratchDir] [outFile]"
  */
object CdcSoakMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/cdc_scale")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runCdcSoak(spark, dir)
    ScaleMd.upsert(out,
      "\n## Streaming-CDC fold at 2M keys (r16; bucketed r17)",
      "\n## Streaming-CDC fold at 2M keys (r16; bucketed r17)\n" + md)
    println(s"[cdcsoak] appended section to $out")
    println(md)
    spark.stop()
  }
}
