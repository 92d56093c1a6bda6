package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM (SURVEY.md §5.2-1). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpecBase extends AnyFunSuite {
  def spark: SparkSession = TestSession.spark

  /** Per-suite scratch dir under target/ (never outside the repo). */
  def scratch(name: String): String = {
    val f = new java.io.File(s"target/test-scratch/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    f.mkdirs()
    f.getAbsolutePath
  }
}
