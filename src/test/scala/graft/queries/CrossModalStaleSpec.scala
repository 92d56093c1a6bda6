package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** B93 q_dedup_embed_stale (cross-modal staleness audit) and B94
  * q_train_curriculum (scalable global-rank phases): driver-side replays
  * plus the planted case the driver fixture cannot exercise — its
  * embeddings are INDEPENDENT of the text, so every text-dup pair flags
  * stale there; the discriminating stale=false side (true near-dups whose
  * embeddings agree) is planted here. */
class CrossModalStaleSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("q_dedup_embed_stale: cosines match a driver-side recomputation; flags follow the threshold") {
    val rows = graft.SparkEntry.queries("q_dedup_embed_stale")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "no text near-dup pairs at this sf — vacuous")
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / math.sqrt(na * nb)
    }
    rows.foreach { r =>
      val expect = BigDecimal(cos(vecs(r.getAs[Long]("doc_a")),
        vecs(r.getAs[Long]("doc_b"))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("cos6") - expect) < 2e-6,
        s"cos6 diverges for pair (${r.get(0)}, ${r.get(1)})")
      assert(r.getAs[Boolean]("stale") === (r.getAs[Double]("cos6") < 0.45))
    }
  }

  test("planted consistent pair flags stale=false; inconsistent pair flags stale=true") {
    // two near-identical TEXTS; one doc pair with near-identical vectors
    // (consistent → not stale), rebuilt with one side's vector orthogonal
    // (stale). Drives the same composition the entry runs.
    val s = spark
    import s.implicits._
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, base), (1L, base + " tail")).toDF("doc_id", "text")
    val pairs = graft.operators.NearDup
      .minhashPairs(docs, LlmOps.MinHashCfg)
      .select(col("doc_a"), col("doc_b"))
    assert(pairs.count() === 1L, "planted texts must confirm as near-dups")
    val vSame = Array.tabulate(64)(i => 0.1 + 0.01 * i)
    val vOrth = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    def staleOf(e1: Array[Double]): Boolean = {
      val vecs = Seq((0L, vSame.toSeq), (1L, e1.toSeq)).toDF("vec_id", "e")
      val n = vecs.select(col("vec_id"), col("e"),
        sqrt(call_function("vec_dot", col("e"), col("e"))).as("nrm"))
      val a = n.select(col("vec_id").as("doc_a"), col("e").as("ea"),
        col("nrm").as("na"))
      val b = n.select(col("vec_id").as("doc_b"), col("e").as("eb"),
        col("nrm").as("nb"))
      pairs.join(a, "doc_a").join(b, "doc_b")
        .withColumn("cos6",
          round(call_function("vec_dot", col("ea"), col("eb")) /
            (col("na") * col("nb")), 6))
        .select((col("cos6") < 0.45).as("stale"))
        .head().getBoolean(0)
    }
    assert(!staleOf(vSame.map(_ * 1.001)),
      "near-identical embeddings must NOT flag stale")
    assert(staleOf(vOrth), "orthogonal embeddings must flag stale")
  }

  test("q_train_curriculum: rank is a permutation ordered by quality; phases are exact quartiles") {
    val rows = graft.SparkEntry.queries("q_train_curriculum")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("logit_micro"),
        r.getAs[Long]("rank"), r.getAs[Long]("phase")))
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq === (1L to n).toSeq,
      "rank is not a permutation of 1..n")
    // rank order respects (logit desc, doc_id asc)
    val byRank = rows.sortBy(_._3)
    byRank.sliding(2).foreach { case Array(x, y) =>
      assert(x._2 > y._2 || (x._2 == y._2 && x._1 < y._1),
        s"rank order violated between ${x._1} and ${y._1}")
    }
    // exact quartile phases
    rows.foreach { case (_, _, r, p) =>
      assert(p === (r - 1) * 4 / n + 1, s"phase wrong at rank $r")
    }
    assert(rows.map(_._4).distinct.sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}
