package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The README "Operator API quickstart" examples, compiled and RUN — the
  * README mirrors these snippets verbatim (modulo the fixture data), so the
  * public face of the operator API can never drift from code that works.
  * Each test uses deliberately tiny data; the operators' scale behavior is
  * ScaleSoakSpec's job.
  */
class ReadmeExamplesSpec extends SparkSpecBase {
  import graft.TestSession.spark.implicits._

  test("README: NearDup text near-dup pairs with derived config") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base),
      (1L, base.replace("tok15", "changed")), // one token of 30 differs
      (2L, "completely different text about spark query engines here")
    ).toDF("doc_id", "text")

    // derive the band split from the confirm threshold, find pairs, cluster
    val cfg = MinHashConfig.derive(jaccardConfirm = 0.8)
    val pairs = NearDup.minhashPairs(docs, cfg) // (doc_a, doc_b, jac >= 0.8)
    val labels = NearDup.clusters(pairs) // (cluster_rep, member)

    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
    assert(labels.count() === 2) // docs 0 and 1 under one rep
  }

  test("README: Ann similarity search — exact baseline, then derived IVF") {
    val emb = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), i =>
        conv(substring(md5(concat(col("id"), lit("_"), i)), 1, 7), 16, 10)
          .cast("double") / 134217728.0 - 1.0).as("e"))

    val exact = Ann.exactTopK(emb, isQuery = col("vec_id") < 3, k = 5)

    // IVF: size the coarse quantizer from the corpus, train it, query it
    val ivfCfg = IvfConfig.forCorpus(emb, recallTarget = 0.8, minCell = 10)
    val cents = Ann.kmeansFit(emb, k = ivfCfg.numCentroids, iters = 2)
      .groupBy(col("cent_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("c_val")))),
        x => x.getField("c_val")).as("ce"))
    val ann = Ann.ivfTopK(emb, col("vec_id") < 3, k = 5, ivfCfg, cents)

    assert(exact.count() === 15 && ann.count() === 15) // 3 queries x top-5
    assert(ivfCfg.nprobe >= 1 && ivfCfg.numCentroids >= ivfCfg.nprobe)
  }

  test("README: SemDeDup inside trained cells with the maxCell refusal") {
    // 100 base vectors + 10 near-copies of vector 0 (tiny perturbation)
    val base = spark.range(100).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), i =>
        conv(substring(md5(concat(col("id"), lit("_"), i)), 1, 7), 16, 10)
          .cast("double") / 134217728.0 - 1.0).as("e"))
    val dups = spark.range(100, 110).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), i =>
        conv(substring(md5(concat(lit(0L), lit("_"), i)), 1, 7), 16, 10)
          .cast("double") / 134217728.0 - 1.0 + lit(0.001)).as("e"))
    val emb = base.unionByName(dups)

    val semCfg = IvfConfig.forCorpus(emb, recallTarget = 0.8, minCell = 10)
    val keep = Ann.semDedup(emb, k = semCfg.numCentroids, iters = 2,
      cosineConfirm = 0.9, maxCell = 1000) // (vec_id, cell, keep)

    // the near-copies land in vector 0's cell and all drop; with an
    // absurdly small cap every cell is refused and everything is kept
    assert(keep.filter(col("vec_id") >= 100 && !col("keep")).count() === 10)
    val capped = Ann.semDedup(emb, k = semCfg.numCentroids, iters = 2,
      cosineConfirm = 0.9, maxCell = 1)
    assert(capped.filter(!col("keep")).count() === 0)
  }

  test("README: ConnectedComponents with the rounds receipt") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val cc = ConnectedComponents.run(edges) // fails loudly if unconverged
    assert(cc.rounds <= 4)
    val reps = cc.labels.groupBy(col("label")).count().collect()
    assert(reps.map(_.getLong(1)).sorted.toSeq === Seq(2L, 3L)) // {1,2,3}, {10,11}
  }

  test("README: PageRank in exact integer ppm") {
    val edges = Seq((2L, 1L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val scores = PageRank.run(edges, iterations = 10) // (node, score ppm)
    val top = scores.orderBy(col("score").desc).head()
    assert(top.getLong(0) === 1L) // node 1 has two in-links
  }

  test("README: ZOrder layout rewrite for 2-key pruning") {
    val df = spark.range(1000).select(col("id").as("x"), (col("id") * 7 % 1000).as("y"))
    val dir = scratch("readme_zorder")
    ZOrder.cluster(df, col("x"), col("y"), numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    // a 2-dim box predicate now touches few files (row-group stats are
    // tight on BOTH keys); ZOrderSpec measures the actual pruning
    val hits = spark.read.parquet(dir)
      .filter(col("x").between(100, 120) && col("y").between(700, 840))
    assert(hits.count() === 21) // x in [100,120] all have y = 7x in [700,840]
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) === 8)
  }

  test("README: Skew salting — hot-key join and aggregate") {
    val fact = spark.range(10000).select(
      when(col("id") % 10 < 9, lit(1L)).otherwise(col("id")).as("k"), // 90% on key 1
      col("id").as("v"))
    val dim = Seq((1L, "hot"), (42L, "cold")).toDF("k", "name")

    val joined = Skew.saltedJoin(fact, dim, key = "k", buckets = 8)
    assert(joined.count() === fact.join(dim, "k").count()) // semantics unchanged

    val agg = Skew.saltedAgg(fact, keys = Seq(col("k")), buckets = 8,
      partial = Seq(count(lit(1)).as("pn"), sum(col("v")).as("ps")),
      finalAgg = Seq(sum(col("pn")).as("n"), sum(col("ps")).as("total")))
    val hot = agg.filter(col("k") === 1).head()
    assert(hot.getAs[Long]("n") === 9000L)
  }

  test("README: HeavyHitters — exact frequent passages through the sketch") {
    val docs = (0L to 49L).map {
      case i if i < 4 => (i, "the same boilerplate footer text here " + i)
      case i          => (i, s"unique body $i with its own words ${i * 7}")
    }.toDF("doc_id", "text")

    // 5-gram passages appearing in >= 3 docs, exact doc-frequencies;
    // the CMS prefilter prunes the shuffle, never the answer
    val heavy = HeavyHitters.frequentValues(
      NearDup.shingles(docs, width = 5), "sh", minSupport = 3)

    val got = heavy.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("the same boilerplate footer text" -> 4L,
      "same boilerplate footer text here" -> 4L))
  }
}
