package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** B109 cluster-prototype pruning: the keep rule's tightness (exactly the
  * hardest ceil(n/2) per cell under the (proto_cos ASC, vec_id) order),
  * partitioning determinism, and non-vacuousness on the live fixture.
  */
class PrototypesSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def rows() =
    SparkEntry.queries("q_train_prototypes")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getLong(4), r.getBoolean(5)))

  test("keep rule: per cell, kept = the hardest ceil(n/2) under (proto_cos, id)") {
    val byCell = rows().groupBy(_._2)
    assert(byCell.size > 1, "fixture must spread over >1 cell")
    byCell.foreach { case (cell, rs) =>
      val n = rs.length
      assert(rs.forall(_._5 == n), s"n_cell mismatch in cell $cell")
      val sorted = rs.sortBy(r => (r._3, r._1)) // proto_cos ASC, id ASC
      val keepN = (n + 1) / 2
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r._4 === i + 1, s"rank disagrees with the order in cell $cell")
        assert(r._6 === (i < keepN), s"kept flag at rank ${i + 1} in cell $cell")
      }
    }
  }

  test("both sides non-vacuous: kept and dropped rows exist") {
    val rs = rows()
    val kept = rs.count(_._6)
    assert(kept > 0 && kept < rs.length,
      s"kept $kept of ${rs.length} must be strictly interior")
    // the pruning direction: kept rows are the LESS prototypical ones
    val keptMed = rs.filter(_._6).map(_._3).sorted.apply(kept / 2)
    val dropMed = {
      val d = rs.filterNot(_._6).map(_._3).sorted
      d(d.length / 2)
    }
    assert(keptMed < dropMed,
      s"kept median cos $keptMed must be below dropped median $dropMed")
  }

  test("every vector appears exactly once (a partition of the corpus)") {
    val ids = rows().map(_._1)
    assert(ids.length === ids.distinct.length)
    val corpusN = graft.Tables.embeddings(spark, sf).count()
    assert(ids.length.toLong === corpusN)
  }
}
