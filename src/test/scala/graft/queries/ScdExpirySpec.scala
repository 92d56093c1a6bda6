package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** q_scd2_expire safety proof (SURVEY.md §2 B70): the purge manifest must be
  * removable WITHOUT changing any AS OF read at or after the retention
  * cutoff, and must be tight — retaining nothing that only pre-cutoff reads
  * need. Runs on sf0.001 (the spec-speed tier). */
class ScdExpirySpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def versions: DataFrame = Curation.scdVersions(spark, sf).cache()
  private def purged: DataFrame =
    Curation.defs("q_scd2_expire")(spark, sf).select("k", "version")
  private def kept: DataFrame =
    versions.join(purged, Seq("k", "version"), "left_anti")

  /** The SCD2 point-in-time read: latest version <= v per key. */
  private def asOf(df: DataFrame, v: Int): DataFrame =
    df.filter(col("version") <= v)
      .groupBy(col("k"))
      .agg(max_by(col("price_cents"), col("version")).as("price_cents"))

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty

  test("manifest is a nonempty strict subset of the history") {
    val all = versions.count()
    val np = purged.count()
    assert(np > 0, "expected some purgeable versions in the 4-batch fixture")
    assert(np < all)
    // every purged (k, version) exists in the history exactly once
    assert(purged.join(versions, Seq("k", "version"), "left_anti").isEmpty)
    assert(kept.count() + np === all)
  }

  test("AS OF reads at and after the cutoff are unchanged by the purge") {
    (Curation.ScdExpireCutoff to 4).foreach { v =>
      assert(sameRows(asOf(kept, v), asOf(versions, v)),
        s"AS OF $v diverged after the purge")
    }
  }

  test("tight: AS OF cutoff-1 IS changed — nothing extra is retained") {
    val v = Curation.ScdExpireCutoff - 1
    assert(!sameRows(asOf(kept, v), asOf(versions, v)),
      s"AS OF $v still intact — the manifest retained history it should purge")
  }

  test("current rows (no successor) are never purged") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("version"))
    val current = versions
      .withColumn("nv", lead(col("version"), 1).over(w))
      .filter(col("nv").isNull)
      .select("k", "version")
    assert(current.join(purged, Seq("k", "version"), "left_semi").isEmpty)
  }
}
