package graft

/** Prints per-batch stateOperators telemetry for the stream-stream interval
  * joins (r10 verdict #7: explain q_stream_join_semi's data-bound gap vs the
  * other flavors). Dev CLI, not part of any gate:
  *
  *   sbt "runMain graft.StreamJoinDiag [sfDir] [joinTypes...]"
  */
object StreamJoinDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val types = if (args.length > 1) args.drop(1).toSeq
      else Seq("inner", "left_semi", "left_outer")
    val spark = Sessions.get()
    types.foreach { jt =>
      println(s"=== joinType=$jt ===")
      graft.queries.StreamingQ.joinStateDiag(spark, sfDir, jt)
        .foreach { j =>
          // one compact line per batch: batchId, durations, state operators
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val n = om.readTree(j)
          val dur = n.get("durationMs")
          val so = n.get("stateOperators")
          val soStr = (0 until so.size()).map { i =>
            val o = so.get(i)
            s"op$i(total=${o.get("numRowsTotal")}, upd=${o.get("numRowsUpdated")}, " +
              s"removed=${o.get("numRowsRemoved")}, " +
              s"updMs=${o.get("allUpdatesTimeMs")}, rmMs=${o.get("allRemovalsTimeMs")}, " +
              s"commitMs=${o.get("commitTimeMs")})"
          }.mkString(" ")
          println(s"batch=${n.get("batchId")} rows=${n.get("numInputRows")} " +
            s"addBatch=${dur.get("addBatch")} commit=${dur.get("commitOffsets")} " +
            s"$soStr")
        }
    }
    spark.stop()
  }
}
