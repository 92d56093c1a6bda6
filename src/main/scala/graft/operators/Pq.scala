package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization geometry (SURVEY.md §2 B79): the 64-dim vector is
  * cut into `m` subspaces of `dim/m` coordinates; each subspace gets its own
  * `k`-centroid codebook; a vector's code is its argmin-L2 centroid per
  * subspace — `m · log2(k)` bits per vector. Default 16 subspaces × 16
  * centroids = 8 bytes, a 32× compression of the float32 form. The default
  * was MEASURED, not guessed (PqSpec probe on the fixture corpus):
  * shortlist-50 recall of exact-top-3 is 28/30 at m=16 vs 25/30 at m=8 or
  * m=8/k=32 — finer subspaces beat more centroids or more Lloyd rounds at
  * comparable bits on these tightly-clustered embeddings. */
final case class PqConfig(m: Int = 16, k: Int = 16, dim: Int = 64, iters: Int = 2) {
  require(dim % m == 0, s"dim ($dim) must divide into $m subspaces")
  require(k >= 2 && iters >= 1, s"bad PQ config k=$k iters=$iters")
  val subDim: Int = dim / m
}

/** Product quantization + asymmetric-distance (ADC) search — the missing
  * half of the IVF story and the standard way ANN actually fits 100 TB of
  * embeddings in memory (Jégou et al., "Product quantization for nearest
  * neighbor search", TPAMI 2011): the corpus is stored as 2-byte codes, and
  * a query scans codes with per-subspace lookup tables instead of touching
  * any raw vector.
  *
  * Engine shape (all relational, no driver loops over data):
  *  - training = `iters` Lloyd rounds per subspace, ALL subspaces in one
  *    DataFrame keyed by (m, cent_id); seeds = the first k vectors'
  *    subvectors (deterministic, same rule as [[Ann.kmeansFit]]); the
  *    trained codebook (m·k·subDim rows ≈ 1024 doubles) is collected to
  *    the driver — the Ann-centroid O(model) collect — so downstream reuse
  *    never re-runs training through Spark's lazy DAG;
  *  - assignment = exploded coords ⋈ BROADCAST codebook → per-(vec, m,
  *    cent) L2 partial+final aggregate → argmin via lexicographic
  *    `min(struct(d, cent_id))` — a second partial+final aggregate, NO
  *    window and NO sort anywhere in the hot path;
  *  - ADC = the query's exact per-(subspace, centroid) distance table
  *    (n_q·m·k rows, broadcast) joined onto the corpus CODES — the scan
  *    touches 2-byte codes, never vectors, which is the whole point.
  *
  * Cross-engine float discipline (the q_embed_kmeans contract): distances
  * are rounded to 6 dp with the tie-safe floor(x·1e6+0.5)/1e6 before every
  * argmin (cent_id ascending breaks ties), and the trained codebook is
  * rounded to 6 dp before encoding/ADC, so the DuckDB oracle replays
  * training + encoding + search bit-for-bit.
  */
object Pq {
  private def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** (vec_id, e: array<double>) → exploded (vec_id, m, si, x). */
  private[operators] def exploded(vecs: DataFrame, cfg: PqConfig): DataFrame =
    vecs.select(col("vec_id"), posexplode(col("e")).as(Seq("gi", "x")))
      .select(col("vec_id"),
        expr(s"gi div ${cfg.subDim}").cast("long").as("m"),
        expr(s"gi % ${cfg.subDim}").cast("long").as("si"), col("x"))

  /** argmin-L2 codes per (vector, subspace) against `cents(m, cent_id, si,
    * c)`. Deterministic: d is round-6 and the struct-min tie-breaks on
    * cent_id ascending. */
  private[operators] def assign(ex: DataFrame, cents: DataFrame): DataFrame =
    ex.join(broadcast(cents), Seq("m", "si"))
      .groupBy(col("vec_id"), col("m"), col("cent_id"))
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d"))
      .select(col("vec_id"), col("m"),
        struct(round6(col("d")).as("d"), col("cent_id").as("cid")).as("dc"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("dc")).as("best"))
      .select(col("vec_id"), col("m"), col("best.cid").as("code"))

  /** Train the per-subspace codebooks; returns (m, cent_id, si, c) with c
    * rounded to 6 dp, materialized as driver model state. */
  def train(vecs: DataFrame, cfg: PqConfig): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val callerCached =
      vecs.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val v = if (callerCached) vecs
      else vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ex = exploded(v, cfg)
      var cents: DataFrame = ex.filter(col("vec_id") < cfg.k)
        .select(col("m"), col("vec_id").as("cent_id"), col("si"),
          col("x").as("c"))
      // seed-contract check (r10 ADVICE): the deterministic seed rule takes
      // the k vectors with vec_id 0..k−1 — on a corpus whose ids are sparse
      // or offset it would otherwise SILENTLY train fewer than k centroids
      // per subspace and codes would stop spanning [0, k). One cheap count
      // on the cached input turns that into a loud error naming the fix.
      val seedRows = cents.count()
      val wantRows = cfg.m.toLong * cfg.k * cfg.subDim
      require(seedRows == wantRows,
        s"Pq.train seeds codebooks from vec_id 0..${cfg.k - 1}: found " +
          s"$seedRows seed coord rows, need $wantRows — re-key the corpus " +
          "to dense 0-based vec_ids (or densify ids upstream) before training")
      for (_ <- 1 to cfg.iters) {
        val upd = assign(ex, cents)
          .join(ex, Seq("vec_id", "m"))
          .groupBy(col("m"), col("code").as("cent_id"), col("si"))
          .agg(avg(col("x")).as("cnew"))
        cents = cents.join(upd, Seq("m", "cent_id", "si"), "left")
          .select(col("m"), col("cent_id"), col("si"),
            coalesce(col("cnew"), col("c")).as("c"))
      }
      cents.select(col("m"), col("cent_id"), col("si"), round6(col("c")).as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.toDF("m", "cent_id", "si", "c")
    } finally if (!callerCached) v.unpersist(blocking = false)
  }

  /** Encode the corpus: (vec_id, m, code). */
  def encode(vecs: DataFrame, cfg: PqConfig, cents: DataFrame): DataFrame =
    assign(exploded(vecs, cfg), cents)

  /** IVF-PQ top-k (the FAISS IVFADC composition): coarse IVF cells bound
    * WHICH codes a query scans (nprobe cells ≈ nprobe/numCentroids of the
    * corpus), PQ bounds WHAT a scanned candidate costs (code-table lookups,
    * no raw vector) — together the two independent levers that make
    * billion-vector search tractable. Cell assignment is the
    * q_embed_ann_ivf baseline (deterministic first-`numCentroids` init,
    * cosine argmax via a map-side-combined max_by — ~n rows shuffled);
    * candidates = codes in probed cells joined to the broadcast query
    * distance tables. Returns (qid, rank, vec_id, adc). */
  def ivfAdcTopK(vecs: DataFrame, isQuery: Column, k: Int, nprobe: Int,
                 numCentroids: Int, cfg: PqConfig,
                 cents: DataFrame): DataFrame = {
    val n = vecs.select(col("vec_id"), col("e"),
      sqrt(Ann.vdot(col("e"), col("e"))).as("nrm"))
    val ivfCents = n.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"),
        col("nrm").as("cnrm"))
    val scored = n.crossJoin(broadcast(ivfCents))
      .withColumn("cent_cos",
        round(Ann.vdot(col("e"), col("ce")) / (col("nrm") * col("cnrm")), 9))
    val assigned = scored.groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("cent_cos"), (-col("cent_id")).as("neg"))).as("cell"))
    val probeW = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val probes = scored.filter(isQuery)
      .withColumn("arn", row_number().over(probeW))
      .filter(col("arn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cent_id").as("qcell"))
    val codes = codesWide(vecs, cfg, cents).join(assigned, "vec_id")
    val dt = dtState(vecs, isQuery, cfg, cents)
    val cand = codes
      .join(broadcast(probes),
        codes("cell") === probes("qcell") && probes("qid") =!= codes("vec_id"))
      .select(col("qid"), col("vec_id"), col("codes"))
    adcRank(cand, k, dt)
  }

  /** Corpus codes pivoted wide: (vec_id, codes array<long> in subspace
    * order) — the 8-byte row the PQ index actually stores. */
  private[operators] def codesWide(vecs: DataFrame, cfg: PqConfig,
                                   cents: DataFrame): DataFrame =
    encode(vecs, cfg, cents)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** The per-query ADC lookup tables as broadcast driver state:
    * qid → (m → cent → round-6 distance). Queries are a SMALL set by
    * contract (n_q·m·k entries — the Ann-centroid O(model) collect), which
    * is what lets the corpus-side scan run map-side with zero shuffle. */
  private def dtState(vecs: DataFrame, isQuery: Column, cfg: PqConfig,
                      cents: DataFrame): Map[Long, Array[Array[Double]]] = {
    val qex = exploded(vecs.filter(isQuery), cfg)
      .select(col("vec_id").as("qid"), col("m"), col("si"), col("x").as("qx"))
    qex.join(broadcast(cents), Seq("m", "si"))
      .groupBy(col("qid"), col("m"), col("cent_id"))
      .agg(round6(sum((col("qx") - col("c")) * (col("qx") - col("c"))))
        .as("d"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        val t = Array.fill(cfg.m)(new Array[Double](cfg.k))
        rows.foreach(r => t(r.getLong(1).toInt)(r.getLong(2).toInt) =
          r.getDouble(3))
        qid -> t
      }
  }

  /** Map-side ADC scan + bounded top-k: `scored` = (qid, vec_id, codes)
    * candidate rows; the UDF sums the m table lookups per row (the
    * broadcast-model-UDF pattern — one cheap call per candidate row,
    * never under an explode), and [[graft.functions.TopKAgg]] reduces each
    * query's candidates to ≤ k rows PER PARTITION before the only
    * shuffle — n_q·k rows move, no window, no sort of the candidates.
    * (The first cut was a relational m-way explode join + window: measured
    * 37 s / 1.7 GB shuffle on the 22k-vector soak vs ~2 s here — the scan
    * must stay map-side for PQ to beat the raw-vector kernel.) */
  private def adcRank(scored: DataFrame, k: Int,
                      dt: Map[Long, Array[Array[Double]]]): DataFrame = {
    val spark = scored.sparkSession
    val bc = spark.sparkContext.broadcast(dt)
    val adcUdf = udf { (qid: Long, codes: Seq[Long]) =>
      val t = bc.value(qid)
      var s = 0.0
      var m = 0
      while (m < codes.length) { s += t(m)(codes(m).toInt); m += 1 }
      math.floor(s * 1e6 + 0.5) / 1e6
    }
    val topk = graft.functions.TopKAgg.topK(spark, k)
    scored
      .select(col("qid"), (-adcUdf(col("qid"), col("codes"))).as("score"),
        col("vec_id"))
      .groupBy(col("qid"))
      .agg(topk(col("score"), col("vec_id")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("qid"), (col("i") + 1).as("rank"),
        col("p._2").as("vec_id"), (-col("p._1")).as("adc"))
  }

  /** ADC top-k: for each query vector (exact coordinates), rank the WHOLE
    * corpus by the codebook-approximated L2 distance — the scan side reads
    * 8-byte codes only. Returns (qid, rank, vec_id, adc). */
  def adcTopK(vecs: DataFrame, isQuery: Column, k: Int, cfg: PqConfig,
              cents: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dt = dtState(vecs, isQuery, cfg, cents)
    val qids = dt.keys.toSeq.sorted.toDF("qid")
    val scored = codesWide(vecs, cfg, cents).crossJoin(broadcast(qids))
    adcRank(scored.select(col("qid"), col("vec_id"), col("codes")), k, dt)
  }
}
