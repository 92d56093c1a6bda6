package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** B99 distributed PCA (normalized matrix squaring over one-pass covariance
  * sufficient statistics — [[Pca]]).
  *
  * What is pinned, and why it is sufficient:
  *  - the ONE-PASS AGGREGATOR is exact: its collected statistics equal a
  *    driver-side recount over the same rows (forced through multiple
  *    partitions so the merge path runs) — this is the only distributed
  *    piece, everything downstream is deterministic driver arithmetic;
  *  - CONVERGENCE is measured, not assumed: the catalog's squaring count is
  *    pinned by |cos(w_k, w_{k+2})| on the fixture, and the curve improves
  *    in k — the analog of AnnRecallSpec's per-round recall (the probe run
  *    recorded at the constant showed LINEAR power iteration stuck at
  *    cos ≈ 0.82 after 100 steps on this near-isotropic covariance, which
  *    is why the solver squares);
  *  - the direction is NON-VACUOUS: variance captured along w beats the
  *    best single raw dimension (the trivial "PCA" a max-variance column
  *    pick would give), and matches the returned eigenvalue estimate;
  *  - PROJECTION is the model applied per-row: spot-checked against a
  *    driver-side (x − μ)·w recount at round-6.
  */
class PcaSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def vecs = {
    import graft.Tables
    Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
  }

  private def cosAbs(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    math.abs(dp / math.sqrt(na * nb))
  }

  test("one-pass sufficient statistics equal a driver recount across merges") {
    val v = vecs.repartition(7) // force non-trivial partial merges
    val m = Pca.fitPc1(v, dim = 64, squarings = 1)
    val rows = vecs.select(col("e")).collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length.toDouble
    // driver recount of mu through the SAME round-6 contract
    val muRef = Array.tabulate(64) { i =>
      Pca.round6(Pca.round6(rows.map(_(i)).sum) / n)
    }
    assert(m.n == rows.length)
    assert(m.mu.toSeq == muRef.toSeq,
      "aggregated means diverge from the driver recount")
  }

  test("squaring converges on the fixture; the catalog k is pinned by measurement") {
    val k = graft.queries.LlmOps.PcaSquarings
    val ws = Seq(4, 6, k, k + 2).map(t => t -> Pca.fitPc1(vecs, 64, t)).toMap
    val ref = ws(k + 2).w
    val curve = Seq(4, 6, k).map(t => cosAbs(ws(t).w, ref))
    // improving in rounds and effectively converged by the catalog's k
    assert(curve(0) <= curve(1) && curve(1) <= curve(2),
      s"convergence curve not improving: $curve")
    assert(curve(2) > 0.9999,
      s"|cos(w_$k, w_${k + 2})| = ${curve(2)} — catalog squarings too low")
    // eigenvalue estimate settles with the direction
    assert(math.abs(ws(k).eigenvalue - ws(k + 2).eigenvalue) <=
      0.001 * ws(k + 2).eigenvalue,
      s"Rayleigh estimate still moving: ${ws(k).eigenvalue} vs ${ws(k + 2).eigenvalue}")
  }

  test("PC1 captures more variance than any raw dimension, matching the eigenvalue") {
    val m = Pca.fitPc1(vecs, 64, graft.queries.LlmOps.PcaSquarings)
    val pc = Pca.projectPc1(vecs, m).select(col("pc1")).collect()
      .map(_.getDouble(0))
    val n = pc.length.toDouble
    val mean = pc.sum / n
    val varPc = pc.map(x => (x - mean) * (x - mean)).sum / n
    // variance along the (near-)eigenvector ≈ its eigenvalue
    assert(math.abs(varPc - m.eigenvalue) <= 0.01 * m.eigenvalue,
      s"var(pc1) = $varPc vs eigenvalue ${m.eigenvalue}")
    // and beats the best single axis — the non-vacuity claim
    val rows = vecs.select(col("e")).collect().map(_.getSeq[Double](0).toArray)
    val maxAxisVar = (0 until 64).map { i =>
      val xs = rows.map(_(i))
      val mu = xs.sum / n
      xs.map(x => (x - mu) * (x - mu)).sum / n
    }.max
    assert(varPc > maxAxisVar,
      s"PC1 variance $varPc does not beat best axis $maxAxisVar")
  }

  test("subspace: deflation yields a second component orthogonal to the first") {
    val m = Pca.fitSubspace(vecs, 64, graft.queries.LlmOps.PcaSquarings)
    // variance decomposition reads correctly
    assert(m.lambda1 >= m.lambda2 && m.lambda2 > 0,
      s"eigenvalue order broken: ${m.lambda1} vs ${m.lambda2}")
    // orthogonal to the rounding floor (round-6 components, 64 terms)
    val dot = m.w1.zip(m.w2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3, s"|w1·w2| = ${math.abs(dot)}")
    // both unit to the rounding floor
    for (w <- Seq(m.w1, m.w2)) {
      val nrm = math.sqrt(w.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, s"|w| = $nrm")
    }
    // sample variance along w2 matches lambda2; cross-covariance ~ 0
    val pts = Pca.projectSubspace(vecs, m).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val n = pts.length.toDouble
    val (m1, m2) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val v2 = pts.map(p => (p._2 - m2) * (p._2 - m2)).sum / n
    val c12 = pts.map(p => (p._1 - m1) * (p._2 - m2)).sum / n
    assert(math.abs(v2 - m.lambda2) <= 0.01 * m.lambda2,
      s"var(pc2) = $v2 vs lambda2 ${m.lambda2}")
    assert(math.abs(c12) < 1e-3 * m.lambda1,
      s"pc1/pc2 sample covariance not ~0: $c12")
  }

  test("fitK: reproduces fitSubspace at k=2; 4-component orthogonality and variance decomposition") {
    // r14 verdict #9 — the generalized loop must be a strict extension:
    // identical directions/eigenvalues at k=2 (for j=1 the 'current
    // matrix' Rayleigh IS the fitSubspace arithmetic)…
    val sq = graft.queries.LlmOps.PcaSquarings
    val m2 = Pca.fitSubspace(vecs, 64, sq)
    val mk = Pca.fitK(vecs, 64, sq, k = 4)
    assert(mk.ws(0).toSeq === m2.w1.toSeq, "fitK w1 != fitSubspace w1")
    assert(mk.ws(1).toSeq === m2.w2.toSeq, "fitK w2 != fitSubspace w2")
    assert(mk.lambdas(0) === m2.lambda1 && mk.lambdas(1) === m2.lambda2)
    // …and the B102 asserts extended to all four components:
    // non-increasing positive eigenvalues (variance decomposition)…
    mk.lambdas.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b, s"eigenvalue order broken: ${mk.lambdas}") }
    assert(mk.lambdas.last > 0, s"lambda4 not positive: ${mk.lambdas}")
    // …pairwise orthogonality and unit norms to the rounding floor…
    for (i <- 0 until 4; j <- (i + 1) until 4) {
      val dot = mk.ws(i).zip(mk.ws(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 2e-3, s"|w${i + 1}·w${j + 1}| = ${math.abs(dot)}")
    }
    for (w <- mk.ws) {
      val nrm = math.sqrt(w.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, s"|w| = $nrm")
    }
    // …and per-component sample variance matching its ORIGINAL-covariance
    // Rayleigh eigenvalue (the decomposition is real, not nominal)
    val pts = Pca.projectK(vecs, mk).collect()
      .map(r => Array(r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val n = pts.length.toDouble
    for (j <- 0 until 4) {
      val mean = pts.map(_(j)).sum / n
      val v = pts.map(p => (p(j) - mean) * (p(j) - mean)).sum / n
      assert(math.abs(v - mk.lambdas(j)) <= 0.02 * mk.lambdas(j),
        s"var(pc${j + 1}) = $v vs lambda ${mk.lambdas(j)}")
    }
  }

  test("projection equals the driver-side (x − mu)·w recount at round-6") {
    val m = Pca.fitPc1(vecs, 64, graft.queries.LlmOps.PcaSquarings)
    val got = Pca.projectPc1(vecs, m).orderBy(col("vec_id"))
      .limit(25).collect().map { case Row(id: Long, p: Double) => id -> p }
    val raw = vecs.orderBy(col("vec_id")).limit(25).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    raw.zip(got).foreach { case ((idR, x), (idG, p)) =>
      assert(idR == idG)
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += (x(i) - m.mu(i)) * m.w(i); i += 1 }
      assert(math.abs(Pca.round6(acc) - p) < 1e-12,
        s"vec $idR: engine $p vs recount ${Pca.round6(acc)}")
    }
  }
}
