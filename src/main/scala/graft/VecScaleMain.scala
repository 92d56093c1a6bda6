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
    val p = java.nio.file.Paths.get(out)
    val existing =
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p) else ""
    // replace a previous run's section if present, else append. The old
    // section ends at the NEXT "\n## " header (ADVICE r11): content that
    // was appended after it must survive a re-run, so splice prefix +
    // trailing sections and put the fresh section at the end.
    val headerIdx = existing.indexOf("\n## Vector scale 10x")
    val base = if (headerIdx >= 0) {
      val next = existing.indexOf("\n## ", headerIdx + 1)
      val tail = if (next >= 0) existing.substring(next) else ""
      existing.substring(0, headerIdx) + tail
    } else existing
    java.nio.file.Files.writeString(p, base + md)
    println(s"[vecscale] appended section to $out")
    println(md)
    spark.stop()
  }
}
