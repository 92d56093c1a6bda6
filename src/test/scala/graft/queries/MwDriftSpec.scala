package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** B117 Mann-Whitney U drift: the catalog statistic against a brute-force
  * pair-counting recompute (the DEFINITION of U — #(b>a) + ½#(ties) —
  * rather than the midrank formula the entry uses), hand-derived doubled-U
  * values, and the no-drift calibration band.
  */
class MwDriftSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  /** Doubled U by definition: 2·#(b > a) + #(b = a). */
  private def u2Brute(old: Seq[Long], del: Seq[Long]): Long =
    (for (a <- old; b <- del) yield
      if (b > a) 2L else if (b == a) 1L else 0L).sum

  test("catalog u2/auc equal the pair-counting definition per source") {
    val logits = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docs = graft.Tables.documents(spark, sf)
    val model = graft.operators.LinearScorer.model(docs, minCount = 3)
    val scores = graft.operators.LinearScorer.score(docs, model, 0L)
      .select(col("doc_id"), col("logit_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bySrc = logits.groupBy(_._2)
    val got = SparkEntry.queries("q_score_mw_drift")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size === 20, "every source holds both snapshot halves")
    got.foreach { case (src, (nOld, nDel, u2, aucPpm)) =>
      val ids = bySrc(src).map(_._1)
      val old = ids.filter(id => (id / 20) % 2 == 0).map(scores)
      val del = ids.filter(id => (id / 20) % 2 == 1).map(scores)
      assert(old.length.toLong === nOld && del.length.toLong === nDel, src)
      val u2Want = u2Brute(old.toSeq, del.toSeq)
      assert(u2 === u2Want, s"$src: u2 $u2 vs brute $u2Want")
      assert(aucPpm === (BigInt(u2Want) * 1000000 /
        (2L * nOld * nDel)).toLong, s"$src auc")
    }
  }

  test("hand-derived: clean dominance, tie, and the no-drift point") {
    assert(u2Brute(Seq(1L, 2L), Seq(3L)) === 4L)       // all wins: auc 1.0
    assert(u2Brute(Seq(1L), Seq(1L)) === 1L)           // pure tie: auc 0.5
    assert(u2Brute(Seq(3L), Seq(1L, 2L)) === 0L)       // all losses: auc 0
    // symmetric samples: U2_del + U2_old = 2·n_old·n_del
    val (a, b) = (Seq(1L, 4L, 6L), Seq(2L, 4L, 7L))
    assert(u2Brute(a, b) + u2Brute(b, a) === 2L * a.length * b.length)
  }

  test("calibration: a parity split of one population stays near auc 0.5") {
    // both halves draw from the same fixture distribution, so every
    // source's AUC should sit inside a generous no-drift band
    val aucs = SparkEntry.queries("q_score_mw_drift")(spark, sf)
      .select(col("auc_ppm")).collect().map(_.getLong(0))
    aucs.foreach(a => assert(a > 200000 && a < 800000,
      s"auc $a outside the no-drift band — the split leaked signal"))
  }
}
