package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** graft.operators.LinearScorer (SURVEY.md §2 B71): the scores must equal an
  * INDEPENDENT driver-side re-implementation (MessageDigest md5 + Scala
  * collections — no Spark expressions shared with the operator), OOV
  * handling must be explicit, and the model join must broadcast. */
class LinearScorerSpec extends SparkSpecBase {
  import org.apache.spark.sql.DataFrame

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Independent weight reference: md5 hex via MessageDigest. */
  private def refWeight(term: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16) % 2001 - 1000
  }

  private val corpus = Seq(
    1L -> "alpha beta alpha gamma",
    2L -> "beta beta zzzuniq",
    3L -> "gamma alpha beta",
    4L -> "qqq www eee")

  /** Reference scorer over the same corpus in plain Scala. */
  private def refScores(minCount: Int): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val tf = toks.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val vocab = tf.filter(_._2 >= minCount).keySet
    toks.map { case (id, ts) =>
      id -> ts.filter(vocab).map(refWeight).sum
    }.toMap
  }

  test("scores equal the driver-side reference implementation") {
    val docs = docsDf(corpus)
    val scored = LinearScorer.score(docs, LinearScorer.model(docs, minCount = 2), 0L)
      .select("doc_id", "logit_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored === refScores(minCount = 2))
  }

  test("all-OOV doc scores exactly 0 and passes a 0 threshold") {
    val docs = docsDf(corpus)
    val scored = LinearScorer.score(docs, LinearScorer.model(docs, minCount = 2), 0L)
    val row = scored.filter(col("doc_id") === 4L).head()
    assert(row.getAs[Long]("logit_micro") === 0L)
    assert(row.getAs[Boolean]("keep"))
  }

  test("vocabulary threshold drops sub-minCount terms from the model") {
    val docs = docsDf(corpus)
    val terms = LinearScorer.model(docs, minCount = 2)
      .select("term").collect().map(_.getString(0)).toSet
    assert(terms === Set("alpha", "beta", "gamma"))
  }

  test("model join is broadcast (map-side scoring)") {
    val docs = docsDf(corpus)
    val plan = LinearScorer.score(docs, LinearScorer.model(docs, minCount = 2), 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "model join must broadcast")
  }

  test("scoreUdf scores null text as 0 — the all-OOV convention, not an NPE") {
    // r10 ADVICE: the first cut NPE'd on null text while the join+agg form
    // silently dropped the row; neither was a decision. The documented
    // contract is now logit 0 (no tokens matched) for null input.
    val docs = docsDf(corpus)
    val f = LinearScorer.scoreUdf(LinearScorer.model(docs, minCount = 2))
    val s = spark
    import s.implicits._
    val out = Seq((10L, null: String), (11L, "alpha beta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), f(col("text")).as("logit"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) === 0L)
    assert(out(11L) === refWeight("alpha") + refWeight("beta"))
  }
}
