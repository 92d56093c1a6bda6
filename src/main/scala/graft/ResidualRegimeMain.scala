package graft

/** Appends the residual-IVFADC regime comparison (r11 verdict #3) to
  * SCALE.md — raw vs residual PQ coding measured on the sf0.1 fixture
  * embeddings at the catalog geometry (16 cells, the parity regime the
  * hash-checked entry pins) and the ~sqrt(n) tight-quantizer geometry
  * (64 cells, scan fraction matched via nprobe) — see
  * [[graft.operators.ScaleSoak.runResidualRegime]].
  *
  *   sbt "runMain graft.ResidualRegimeMain [sfDir] [outFile]"
  */
object ResidualRegimeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = Sessions.get()
    val md = graft.operators.ScaleSoak.runResidualRegime(spark, sfDir)
    ScaleMd.upsert(out, "\n## Residual IVFADC regime", md)
    val dial = graft.operators.ScaleSoak.runRerankDial(spark, sfDir)
    ScaleMd.upsert(out, "\n## IVFADC-R shortlist dial", dial)
    println(s"[residual-regime] appended sections to $out")
    println(md)
    println(dial)
    spark.stop()
  }
}
