package graft

/** Appends the batched-BPE soak section (r14 verdict #2) to SCALE.md —
  * ≥256 effective merges over a wide synthetic vocabulary, measuring
  * that ROUNDS, not merges, bound the job count; see
  * [[graft.operators.ScaleSoak.runBpeBatchedSoak]].
  *
  *   sbt "runMain graft.BpeBatchSoakMain [outFile]"
  */
object BpeBatchSoakMain {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runBpeBatchedSoak(spark)
    ScaleMd.upsert(out, "\n## Batched BPE soak", md)
    println(s"[bpe-batch-soak] appended section to $out")
    println(md)
    spark.stop()
  }
}
