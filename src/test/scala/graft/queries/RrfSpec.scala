package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** B118 hybrid RRF fusion: the fused ranking against a driver-side
  * recompute from the two component rankings, the hand-derived constants,
  * and non-vacuousness (both signals actually shape the result).
  */
class RrfSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def fused() = SparkEntry.queries("q_hybrid_rrf")(spark, sf)
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  test("fusion equals a driver recompute from the component rankings") {
    import graft.operators.Ann
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val dense = Ann.exactTopK(emb, col("vec_id") < 10, k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")) ->
        r.getAs[Int]("rank")).toMap
    // independent lexical recompute: distinct shingle sets, exact Jaccard ppm
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      (0 to tk.length - 3).map(i => tk.slice(i, i + 3).mkString(" ")).toSet
    }
    val sh = docs.view.mapValues(shingles).toMap
    val lex = (0L until 10L).flatMap { q =>
      val cands = docs.keys.filter(c => c != q && (sh(q) & sh(c)).nonEmpty)
        .map { c =>
          val i = (sh(q) & sh(c)).size.toLong
          val u = sh(q).size + sh(c).size - i
          (c, i * 1000000L / u)
        }.toSeq.sortBy { case (c, j) => (-j, c) }.take(5)
      cands.zipWithIndex.map { case ((c, _), i) => (q, c) -> (i + 1) }
    }.toMap
    val want = (0L until 10L).flatMap { q =>
      val cids = (dense.keySet ++ lex.keySet).collect { case (`q`, c) => c }
      val scored = cids.toSeq.map { c =>
        val s = dense.get((q, c)).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
          lex.get((q, c)).map(r => 1000000000L / (60 + r)).getOrElse(0L)
        (c, s)
      }.sortBy { case (c, s) => (-s, c) }.take(3)
      scored.zipWithIndex.map { case ((c, s), i) => (q, i + 1, c, s) }
    }
    assert(fused().toSeq.sortBy(r => (r._1, r._2)) ===
      want.sortBy(r => (r._1, r._2)))
  }

  test("hand-derived constants: dual rank-1 and single-signal terms") {
    assert(1000000000L / 61 === 16393442L)
    assert(2 * (1000000000L / 61) === 32786884L) // rank 1 in both lists
    assert(1000000000L / 65 === 15384615L)       // rank 5, one list only
  }

  test("both signals shape the fixture result (non-vacuous fusion)") {
    val rows = fused()
    val dual = 2 * (1000000000L / 61)
    // at least one fused winner carries contributions from BOTH lists
    // (rrf > max single-list term), and at least one from a single list
    val maxSingle = 1000000000L / 61
    assert(rows.exists(_._4 > maxSingle), "no doc fused from both signals")
    assert(rows.exists(r => r._4 <= maxSingle && r._4 > 0),
      "no doc ranked by a single signal survived fusion")
    assert(rows.length === 30)
    assert(rows.forall(_._4 <= dual))
  }
}
