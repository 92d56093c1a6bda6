package graft

/** Appends the re-rank raw-vector-fetch soak section to SCALE.md (r12
  * verdict #6): the broadcast-semi-join fetch Pq.rerankExact uses vs the
  * deliberately-wrong corpus-shuffle fetch, at the 10× vector scale and
  * shortlist sizes 10/50/200 — see
  * [[graft.operators.ScaleSoak.runRerankFetchSoak]].
  *
  *   sbt "runMain graft.RerankFetchMain [corpusDir] [outFile]"
  */
object RerankFetchMain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/qscratch/vec_scale")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runRerankFetchSoak(spark, dir)
    ScaleMd.upsert(out, "\n## Re-rank fetch at 10x", md)
    println(s"[rerankfetch] appended section to $out")
    println(md)
    spark.stop()
  }
}
