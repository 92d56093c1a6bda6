package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA, first principal component by power iteration
  * (SURVEY.md §2 B99).
  *
  * The scale-defining choice is WHERE the O(d²) work happens: the corpus is
  * touched exactly ONCE by a single partial+final aggregate whose buffer is
  * the d(d+1)/2 + d + 1 sufficient statistics of the covariance matrix
  * (count, per-dim sums, upper-triangular raw second moments) — the map side
  * pre-reduces every partition to one 2 145-double buffer (d = 64), so the
  * shuffle carries `numPartitions × 17 KB` regardless of corpus size, and
  * the only collect is that one O(d²) row (same budget class as the k-means
  * / PQ model collects, see the VERDICT collect-site audit). Everything
  * after — covariance assembly, power iteration, eigenvalue — is O(d²)
  * DRIVER arithmetic on the collected statistics; the projection pass back
  * over the corpus is a per-row broadcast-literal `vec_dot`, zero shuffle.
  *
  * The naive alternative (explode to (vec_id, i, x), self-join on vec_id,
  * groupBy (i, j)) shuffles n·d² rows — a 4 096× blow-up of the corpus at
  * d = 64 that ScaleSoak measures against this one-pass shape; the oracle
  * SQL deliberately replays THAT form because DuckDB has no mergeable
  * vector aggregate, which makes the oracle an independent derivation
  * rather than a re-execution.
  *
  * Cross-engine float discipline (the repo's round-6 convention): every
  * aggregate that a distributed sum could reorder is rounded tie-safe
  * (`floor(x·1e6 + 0.5)/1e6`) BEFORE it feeds downstream arithmetic — the
  * raw sums, each covariance entry, each matvec component, each norm, each
  * normalized eigenvector component. Both engines then run identical scalar
  * expression trees on identical round-6 inputs, so the replay is exact.
  * Magnitudes are kept O(1) by building the COVARIANCE (moments divided by
  * n) rather than the scatter matrix, so a 0.5e-6 quantum is ~6 orders
  * above double noise at every rounding site.
  *
  * The eigensolver is NORMALIZED MATRIX SQUARING, not linear power
  * iteration: k squarings of the (driver-resident, d×d) covariance equal
  * 2^k power steps in log depth, so convergence is effectively
  * EIGENGAP-FREE — near-isotropic embedding corpora keep λ₂/λ₁ close to 1
  * (this fixture: ≈ 0.95, where 100 linear power steps still read
  * cos ≈ 0.82 against the converged direction; 8 squarings ≡ 256 steps
  * read ≥ 0.9999 at every fixture density). The direction is read off as
  * the squared matrix's largest-norm COLUMN (argmax on round-6 norms,
  * index tie-break) — deterministic, no seed, no sign ambiguity, and no
  * start vector: the textbook H·w0 application with dyadic w0 = 0.125
  * manufactures exact .5-quantum rounding ties at probability 1/8 per
  * component, which DuckDB's parallel aggregation then flips run-to-run
  * (see fitPc1's comment for the measured incident). `squarings` is the
  * replay-bounded convergence lever, the same role buildK plays for
  * NN-descent (see [[Ann.knnGraph]]); PcaSpec measures the curve before
  * the catalog pins it. λ₁ is recovered by one Rayleigh quotient against
  * the original covariance.
  */
object Pca {

  /** Fitted first-PC model: corpus size, round-6 per-dim means, round-6
    * unit(ish) principal direction, and the final iterate's ‖Gw‖ — the
    * power-iteration eigenvalue estimate of the covariance matrix. */
  final case class Pc1Model(
      n: Long, mu: Array[Double], w: Array[Double], eigenvalue: Double) {
    /** Driver-side μ·w (left fold), the constant the projection subtracts:
      * (x − μ)·w = x·w − μ·w. */
    def muDotW: Double = {
      var acc = 0.0
      var i = 0
      while (i < mu.length) { acc += mu(i) * w(i); i += 1 }
      acc
    }
  }

  /** Tie-safe 6-dp rounding, the scalar mirror of QUtil.round6Exact. */
  private[graft] def round6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  /** One-pass covariance sufficient statistics. Buffer layout:
    * [0] = count, [1..d] = Σxᵢ, then Σxᵢxⱼ for i ≤ j row-major. */
  private class SuffStats(dim: Int)(implicit bEnc: Encoder[Array[Double]],
      oEnc: Encoder[Seq[Double]])
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val len = 1 + dim + dim * (dim + 1) / 2
    def zero: Array[Double] = new Array[Double](len)
    def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
      val x = a.toArray
      require(x.length == dim, s"vector of dim ${x.length}, expected $dim")
      b(0) += 1.0
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        b(1 + i) += x(i)
        var j = i
        while (j < dim) { b(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = bEnc
    def outputEncoder: Encoder[Seq[Double]] = oEnc
  }

  /** round-6 matrix product H·H (both engines: round-6 entries of the
    * 64-term sums). */
  private def squareR6(h: Array[Array[Double]]): Array[Array[Double]] = {
    val d = h.length
    Array.tabulate(d, d) { (i, j) =>
      var acc = 0.0
      var k = 0
      while (k < d) { acc += h(i)(k) * h(k)(j); k += 1 }
      round6(acc)
    }
  }

  private def maxAbs(h: Array[Array[Double]]): Double =
    h.iterator.flatMap(_.iterator).map(math.abs).max

  /** Fit the first principal component of `vecs` (columns: vec_id,
    * e array<double> of length `dim`): one corpus pass for the covariance
    * sufficient statistics, then `squarings` rounds of normalized matrix
    * squaring — C^(2^squarings) applied to the fixed start vector, i.e.
    * 2^squarings power-method steps in log depth. The covariance is PSD, so
    * repeated squaring always amplifies the TOP eigenvector, and the
    * convergence ratio (λ₂/λ₁)^(2^k) is driven to 0 quadratically — the
    * eigengap, which near-isotropic embedding corpora keep small (this
    * fixture: λ₂/λ₁ ≈ 0.95, where LINEAR power iteration still reads
    * cos ≈ 0.82 after 100 steps), stops mattering. Each squaring
    * renormalizes by the max |entry| (order-independent, hence replayable)
    * to keep magnitudes O(1) for the round-6 contract. */
  /** The one-pass statistics collect (also measured standalone by the
    * ScaleSoak PCA leg): [count, Σxᵢ…, upper-tri Σxᵢxⱼ…]. */
  private[operators] def collectStats(vecs: DataFrame, dim: Int): Seq[Double] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val stats = udaf(new SuffStats(dim))
    vecs.agg(stats(col("e")).as("st")).head().getSeq[Double](0)
  }

  def fitPc1(vecs: DataFrame, dim: Int, squarings: Int): Pc1Model = {
    require(squarings >= 1, "at least one squaring round")
    val st = collectStats(vecs, dim)
    val n = st(0)
    require(n > 0, "PCA over an empty corpus")

    // round-6 raw sums, then covariance entries from the SAME scalar
    // expression tree the oracle uses: Sij/n − (si/n)(sj/n), re-rounded
    val s = Array.tabulate(dim)(i => round6(st(1 + i)))
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val sij = round6(st(t))
        val c = round6(sij / n - (s(i) / n) * (s(j) / n))
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }

    // normalized log-depth squaring: h ← round6((h·h) / maxabs(h·h))
    val m0 = maxAbs(cov)
    require(m0 > 0, "degenerate corpus: zero covariance")
    var h = cov.map(_.map(x => round6(x / m0)))
    var k = 0
    while (k < squarings) {
      val p = squareR6(h)
      val mp = maxAbs(p)
      require(mp > 0, s"squaring $k collapsed below the round-6 quantum")
      h = p.map(_.map(x => round6(x / mp)))
      k += 1
    }

    // Extract the dominant direction as H's largest-norm COLUMN (H ≈ λ·vvᵀ
    // after squaring, so every non-degenerate column is ∝ v; the largest
    // one has the best signal-to-rounding ratio). Deliberately NOT the
    // textbook "apply to a start vector": u = H·w0 with dyadic
    // w0 = round6(1/√64) = 0.125 puts u·1e6 EXACTLY on a .5 rounding tie
    // with probability 1/8 per component (6-dp entries × an exact eighth),
    // and a true tie is decided by summation-order ulps — DuckDB's
    // parallel aggregation then flips it RUN TO RUN (measured: 109/500
    // projections flapping between identical oracle invocations). Column
    // norms live on the 12-dp product grid where a .5e-6 tie is
    // measure-zero, and the argmax compares round-6 values with an index
    // tie-break, so both engines select identically.
    val colNorm = Array.tabulate(dim) { j =>
      var acc = 0.0
      var r = 0
      while (r < dim) { acc += h(r)(j) * h(r)(j); r += 1 }
      round6(acc)
    }
    var best = 0
    var bj = 1
    while (bj < dim) { if (colNorm(bj) > colNorm(best)) best = bj; bj += 1 }
    val u = Array.tabulate(dim)(r => h(r)(best))
    var ss = 0.0
    var r = 0
    while (r < dim) { ss += u(r) * u(r); r += 1 }
    val un = round6(math.sqrt(ss))
    require(un > 0, "selected column collapsed below the round-6 quantum")
    val w = u.map(x => round6(x / un))

    // Rayleigh quotient against the ORIGINAL covariance recovers λ₁
    // (squaring tracks only the direction; scales were renormalized away)
    val gv = Array.tabulate(dim) { rr =>
      var acc = 0.0
      var c = 0
      while (c < dim) { acc += cov(rr)(c) * w(c); c += 1 }
      round6(acc)
    }
    var lam = 0.0
    var q = 0
    while (q < dim) { lam += w(q) * gv(q); q += 1 }
    Pc1Model(n.toLong, Array.tabulate(dim)(i => round6(s(i) / n)), w,
      round6(lam))
  }

  /** Project every vector onto the fitted direction: round-6 (x − μ)·w,
    * computed as vec_dot(x, w) − μ·w — a per-row codegen map over broadcast
    * literals, zero shuffle at any corpus size. */
  def projectPc1(vecs: DataFrame, model: Pc1Model): DataFrame =
    vecs.select(col("vec_id"),
      (floor((call_function("vec_dot", col("e"), lit(model.w)) -
        lit(model.muDotW)) * 1e6 + 0.5) / 1e6).as("pc1"))
}
