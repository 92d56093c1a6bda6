package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** graft.operators.LangId (B52 trained LID; r14 verdict #4): a planted
  * corpus with GENUINELY language-distinct character statistics (the
  * fixture's lang labels are synthetic — its text is the same token soup
  * under every label, so the catalog entry's confusion matrix pins the
  * DATAFLOW and the cross-engine replay, not model quality — stated here
  * so nobody reads the fixture matrix as an accuracy claim), plus a
  * driver-side recompute of the full train→score→argmax chain as the
  * second, structurally different witness next to the DuckDB oracle. */
class LangIdSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("planted separable languages: the model discriminates and argmax predicts held-out docs") {
    // two 'languages' with disjoint character inventories; doc_ids chosen
    // so each lang has train (%10<8) and held-out (%10>=8) docs
    val d = docs(Seq(
      (0L, "aa", "aaaa aaab aaba abaa"), (1L, "aa", "aaab aabb aaaa"),
      (8L, "aa", "aaba abab"),
      (2L, "bb", "bbbb bbba bbab babb"), (3L, "bb", "bbba bbaa bbbb"),
      (9L, "bb", "bbab baba")))
    val m = LangId.model(d.filter(col("doc_id") % 10 < 8), n = 3, minCount = 1)
    val pred = LangId.predict(d.filter(col("doc_id") % 10 >= 8), m, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(pred === Map(8L -> "aa", 9L -> "bb"),
      s"separable languages misclassified: $pred")
  }

  test("model and prediction equal a driver-side recompute (fixture corpus)") {
    val sf = "/root/testdata/sf0.001"
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    val rows = d.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[String]("text")))
    // driver-side replay: trigram ppm model on %10<8, argmax on %10>=8
    def grams(t: String): Seq[String] =
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val train = rows.filter(_._1 % 10 < 8)
    val cnt = train.flatMap { case (_, l, t) => grams(t).map(l -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val w: Map[(String, String), Long] = cnt.collect {
      case ((l, g), c) if c >= 5 => (l, g) -> c * 1000000L / tot(l)
    }.toMap
    val langs = tot.keys.toSeq.sorted
    val expected = rows.filter(_._1 % 10 >= 8).map { case (id, _, t) =>
      val scores = langs.map(l =>
        l -> grams(t).map(g => w.getOrElse((l, g), 0L)).sum)
        .filter { case (l, s) =>
          grams(t).exists(g => w.contains((l, g))) }
      id -> (if (scores.isEmpty) "und"
             else scores.minBy { case (l, s) => (-s, l) }._1)
    }.toMap
    val m = LangId.model(d.filter(col("doc_id") % 10 < 8), n = 3, minCount = 5)
    val test = d.filter(col("doc_id") % 10 >= 8)
    val got = test.join(LangId.predict(test, m, n = 3), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("pred"), lit("und")).as("pred"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(got === expected, "operator diverged from the driver-side recompute")
    assert(got.nonEmpty)
  }
}
