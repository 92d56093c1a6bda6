package graft.queries

import graft.SparkSpecBase

/** Physical-plan assertions: the catalog must not silently lose the plan
  * shapes the 100 TB posture depends on (scan-level filter pushdown, column
  * pruning, explicit broadcasts, no accidental cartesian products, codegen
  * in the hot paths). `.explain`-by-eyeball doesn't survive refactors;
  * these do. */
class PlanSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString()
  }

  test("q_filter_project pushes predicates into the parquet scan and prunes columns") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    // only the 6 needed columns reach the scan, not the full lineitem schema
    assert(!p.contains("l_comment") && !p.contains("l_tax"), p)
  }

  test("q_join_broadcast uses BroadcastHashJoin, q_join_sortmerge keeps a shuffle join") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
    val smj = plan("q_join_sortmerge")
    assert(smj.contains("SortMergeJoin") || smj.contains("ShuffledHashJoin"), smj)
  }

  test("anti/semi gates compile to the dedicated join types") {
    assert(plan("q_join_anti").contains("LeftAnti"))
    assert(plan("q_join_semi").contains("LeftSemi"))
  }

  test("scale-path dedup queries contain no cartesian product") {
    Seq("q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_exact",
      "q_embed_ann_lsh", "q_dedup_embed_cosine", "q_dedup_rows",
      "q_text_tfidf", "q_dedup_pipeline").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q_topk_agg keeps the bounded-aggregate shape: no window, no input sort") {
    // B65's contract is sort-free bounded aggregation: the window form
    // (even with Spark 4's WindowGroupLimit bounding its exchange) sorts
    // every input partition full-width first; a refactor that reintroduces
    // a Window or an input Sort silently loses the streaming-pass shape
    val p = plan("q_topk_agg")
    assert(!p.contains("Window ["), s"q_topk_agg regressed to a window plan:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
      s"expected partial+final ObjectHashAggregate pair:\n$p")
    // the single allowed Sort is the presentation orderBy ABOVE the final
    // aggregate; nothing may sort the raw customer rows below the exchange
    val aggIdx = p.indexOf("ObjectHashAggregate")
    assert(!p.substring(aggIdx).contains("Sort "),
      s"a sort appeared below the aggregate (input-sorting plan):\n$p")
  }

  test("q_topk_composed answers stats + top-k in one aggregate pass") {
    // the composability claim: count/sum/topk in ONE groupBy means one
    // scan and one exchange — no Window pass, no join back to the stats
    val p = plan("q_topk_composed")
    assert(!p.contains("Window ["), s"composed top-k regressed to a window:\n$p")
    assert(!p.toLowerCase.contains("join"), s"stats joined back instead of composed:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"expected exactly one customer scan:\n$p")
  }

  test("IVF cell assignment is a partial+final aggregate, not a full-data window") {
    // assigning each vector to its best of 16 centroid cells through a
    // row_number window would shuffle 16x the corpus. Since the r17 kernel
    // restructure the assignment is a zero-shuffle VecBestCell projection
    // (stronger still than the pre-r17 map-side max_by aggregate this test
    // used to pin). The window must survive ONLY on the filtered query side.
    val p = plan("q_embed_ann_ivf")
    assert(p.contains("vec_best_cell"),
      s"IVF assignment lost its kernel projection:\n$p")
    // "Window [" is the exact operator print form ("WindowGroupLimit [" has
    // no space before its bracket, so rank-pushdown nodes don't count)
    val windowCount = "Window \\[".r.findAllIn(p).size
    assert(windowCount >= 1 && windowCount <= 2, // probe rank + top-k rank,
      s"IVF plan window count $windowCount (expected 1-2, never a full-data assignment window):\n$p")
  }

  test("aggregations run as partial+final hash aggregates") {
    // (AQE prints the pre-execution plan without codegen markers; partial_
    // prefixes prove the map-side combine that bounds the shuffle)
    val p = plan("q_agg_pricing")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("top-k via sort+limit compiles to TakeOrderedAndProject") {
    assert(plan("q_sort_topk").contains("TakeOrderedAndProject"))
  }

  test("q_sorted_scan pushes the date-range filter to the sorted parquet scan") {
    // the pushed predicate is what parquet answers from row-group min/max
    // stats — with the sort-on-write layout, out-of-range groups are
    // discharged from the footer alone
    val p = plan("q_sorted_scan")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || p.contains("PushedFilters: [GreaterThanOrEqual(o_orderdate"), p)
  }

  test("q_multimodal_meta places no broadcast hint on the unbounded catalog side") {
    // the document catalog grows with the corpus: a hard-wired broadcast
    // hint would OOM the driver at 100 TB — join strategy is left to AQE
    val df = graft.SparkEntry.queries("q_multimodal_meta")(spark, sf)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"unexpected join hints: $hints")
  }

  test("banded LSH candidate generation bounds every bucket (MaxBucket cap in plan)") {
    // the size(ids) <= cap filter is what prevents a degenerate duplicate
    // family from materializing one giant collect_set row / quadratic pairs
    Seq("q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_embed_cosine").foreach { q =>
      val p = plan(q)
      assert(p.contains("size(ids") && p.contains("1000"), s"$q lost the bucket cap:\n$p")
    }
  }

  test("q_cdc_apply reduces the changelog with a partial max_by aggregate, not a window sort") {
    // latest-wins through row_number() would shuffle AND sort every key
    // group; max_by gets map-side combine, so the exchange carries one
    // struct per key per mapper
    val p = plan("q_cdc_apply")
    assert(p.contains("partial_max_by"), s"lost the map-side combine:\n$p")
    assert(!p.contains("Window ["), s"unexpected window sort:\n$p")
  }

  test("q_zorder_prune pushes both key filters to the clustered parquet scan") {
    // both dimensions must reach the footer-stats level — that is the whole
    // point of the z-order layout (the printed plan truncates PushedFilters
    // at 100 chars, so inspect the scan node's pushed predicates directly)
    val df = graft.SparkEntry.queries("q_zorder_prune")(spark, sf)
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides its children
    // from collect until execution
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no parquet scan in the plan")
    val pushed = scans.flatMap(_.dataFilters).map(_.toString).mkString("; ")
    assert(pushed.contains("l_partkey") && pushed.contains("l_suppkey"),
      s"z-order read lost two-dimension pushdown: $pushed")
  }

  test("q_bloom_join broadcasts the dim side after the bloom prefilter") {
    val p = plan("q_bloom_join")
    assert(p.contains("BroadcastHashJoin"), s"dim join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_graph_pagerank aggregates contributions partial+final each hop") {
    val p = plan("q_graph_pagerank")
    assert(p.contains("partial_sum"), s"contribution aggregate lost map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dpp_join prunes fact partitions with a runtime subquery") {
    val p = plan("q_dpp_join")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"fact scan lost dynamic partition pruning:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_data_mixture broadcasts the weight table ahead of the explode") {
    val p = plan("q_data_mixture")
    assert(p.contains("BroadcastHashJoin"), s"weight join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("incremental dedup queries contain no cartesian product") {
    Seq("q_dedup_incremental", "q_embed_incremental").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q_events_resample windows are user-partitioned, never global") {
    val p = plan("q_events_resample")
    // a Window with an empty partition spec would serialize the whole spine
    // through one task; the forward-fill must stay keyed on user_id
    assert(!p.contains("Window [last") || p.contains("windowspecdefinition(user_id"),
      s"forward-fill window lost its user partitioning:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dedup_semantic assigns cells in codegen and self-joins WITHIN cells only") {
    val p = plan("q_dedup_semantic")
    assert(p.contains("vec_best_cell"),
      s"cell assignment must be the codegen kernel, not a join:\n$p")
    // the within-cell pair join must be an equi-join on the cell key — a
    // cartesian here is the all-pairs blowup SemDeDup exists to avoid
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_text_bm25 broadcasts the corpus stats and takes top-k without a full sort") {
    val p = plan("q_text_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort + limit:\n$p")
    // the 1-row stat joins plan as BroadcastNestedLoopJoin; a shuffled
    // CartesianProduct must never appear (the r6 form of this assert was
    // vacuously true whenever BNLJ was present — r7 advice)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_text_lm_score contains no cartesian and reduces bigrams partial+final") {
    val p = plan("q_text_lm_score")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"bigram counting lost its map-side combine:\n$p")
  }

  test("q_dedup_bloom_gate probes the codegen kernel and routes certain-new rows past the join") {
    val p = plan("q_dedup_bloom_gate")
    assert(p.contains("bloom_might_contain"),
      s"the gate must be the codegen bloom kernel:\n$p")
    assert(!p.contains("ScalaUDF"), s"boxed probe crept back in:\n$p")
    // the certain-new branch unions with the confirmed branch; only the
    // confirmed branch may contain the anti-join
    assert(p.contains("Union"), s"lost the certain-new bypass branch:\n$p")
    assert(p.contains("LeftAnti"), s"lost the exact confirm join:\n$p")
  }

  test("q_dedup_containment generates candidates from capped rare shingles, never all-pairs") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("CartesianProduct"), p)
    // the df cap is a partial+final aggregate feeding the candidate join
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"shingle df cap lost its map-side combine:\n$p")
  }

  test("q_text_vocab is one partial+final aggregate with TakeOrdered top-k") {
    val p = plan("q_text_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be TakeOrdered, not a global sort + limit:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"token counting lost its map-side combine:\n$p")
  }

  test("q_embed_dim_stats reduces per-dimension stats partial+final with no join") {
    val p = plan("q_embed_dim_stats")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"dim profile lost its map-side combine:\n$p")
    assert(!p.contains("Join"), s"sufficient statistics must not join:\n$p")
  }

  test("q_sample_weighted decides the sample in the scan stage with no shuffle before the sort") {
    val p = plan("q_sample_weighted")
    // one Exchange allowed: the final orderBy; the keep decision itself is
    // a scan-stage filter (hash + integer compare, no join, no aggregate)
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"weighted sampling must be a pure scan-stage filter:\n$p")
  }

  test("q_embed_norm normalizes through the codegen kernel with no join and no shuffle before the sort") {
    val p = plan("q_embed_norm")
    assert(p.contains("vec_dot"),
      s"the norm must come from the codegen kernel:\n$p")
    assert(!p.contains("Join"), s"per-row normalization must not join:\n$p")
  }

  test("q_heavy_hitters probes the sketch below every exchange (map-side prune)") {
    val p = plan("q_heavy_hitters")
    val iProbe = p.indexOf("UDF")
    assert(iProbe >= 0, s"the sketch-probe filter is missing:\n$p")
    // the probe's whole point is pruning BEFORE the shuffle: everything
    // upstream of it (textually below in the plan) must be the shingle
    // generator + scan, never an exchange
    assert(p.indexOf("Exchange", iProbe) < 0,
      s"the probe must sit below every exchange:\n$p")
    assert(p.contains("HashAggregate"),
      s"pass 2 must exact-count via hash aggregate:\n$p")
  }

  test("IVFADC-R re-rank fetches the shortlist via broadcast joins and prunes the rank window") {
    // B87/B90: the raw-vector fetch must be a BROADCAST semi-join of the
    // n_q·S shortlist id set against the corpus scan — a shuffled join
    // there would move the corpus to fetch 50 rows per query — and the
    // rank <= k filter must push into the window as a group limit (no
    // full per-query sort survives it).
    def shuffledJoins(p: String): Int =
      p.linesIterator.count(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    // full-scan variant: NO shuffled join anywhere — shortlist and
    // re-rank are both broadcast-shaped
    val full = plan("q_embed_adc_rerank")
    assert(full.contains("BroadcastHashJoin"),
      s"q_embed_adc_rerank: shortlist fetch lost its broadcast:\n$full")
    assert(shuffledJoins(full) === 0,
      s"q_embed_adc_rerank: a shuffled join crept in:\n$full")
    assert(full.contains("WindowGroupLimit"),
      s"q_embed_adc_rerank: the rank<=k filter no longer prunes the window:\n$full")
    // IVF-bounded variant: since the r17 kernel restructure the shortlist
    // stage carries cell + codes in ONE VecBestCell/VecPqCodes projection
    // (the codes ⋈ cell-assignment shuffled join this test used to declare
    // is gone outright — guide §2.4), so here too NO shuffled join may
    // survive anywhere and the re-rank stays broadcast
    val ivf = plan("q_embed_ivfpq_rerank")
    assert(ivf.contains("BroadcastHashJoin"),
      s"q_embed_ivfpq_rerank: shortlist fetch lost its broadcast:\n$ivf")
    assert(shuffledJoins(ivf) === 0,
      s"q_embed_ivfpq_rerank: a shuffled join crept back in " +
        s"(${shuffledJoins(ivf)}):\n$ivf")
    assert(ivf.contains("vec_pq_codes"),
      s"q_embed_ivfpq_rerank: the codes must come from the kernel projection:\n$ivf")
    assert(ivf.contains("WindowGroupLimit"),
      s"q_embed_ivfpq_rerank: the rank<=k filter no longer prunes the window:\n$ivf")
  }
}
