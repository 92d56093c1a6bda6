package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QUtil._

/** Core relational surface (SURVEY.md §2 Part B: B7–B31).
  *
  * Each query is declared twice: as a DataFrame program (`defs`) and as the
  * equivalent ANSI SQL for the DuckDB oracle (`oracle`). Column names, row
  * order (explicit full-key ORDER BY), and double determinism (QUtil) are
  * pinned so the driver's hash compare is exact.
  *
  * Scale posture: every query is a straight Catalyst plan — filters/projects
  * push into the parquet scan, aggregates run partial+final, small dims are
  * broadcast explicitly, large joins stay shuffled (AQE handles skew).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // B18 hash aggregate (TPC-H Q1 shape): partial+final agg, no join.
    "q_agg_pricing" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice"), 2).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          moneyAvg(col("l_quantity"), 0).as("avg_qty"),
          moneyAvg(col("l_extendedprice"), 2).as("avg_price"),
          moneyAvg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // B7/B8 project + compound predicate (IN, LIKE, range) pushed to scan.
    "q_filter_project" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_linestatus") === "F" &&
          col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-03-01") &&
          col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // B9 CASE WHEN buckets.
    "q_case_when" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("price_band",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 200000, "mid")
            .otherwise("high"))
        .groupBy(col("o_orderstatus"), col("price_band"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus"), col("price_band"))
    },

    // B10 broadcast hash join: lineitem ⋈ part (small dim, explicit broadcast).
    "q_join_broadcast" -> { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("p_brand"))
    },

    // B11 shuffled sort-merge join: lineitem ⋈ orders (both sides large at
    // 100 TB — keep it a shuffle join, let AQE split skew).
    "q_join_sortmerge" -> { (s, d) =>
      Tables.lineitem(s, d).hint("merge")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          moneySum(col("l_extendedprice"), 2).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },

    // B12 left outer join with null-producing side aggregated.
    "q_join_left" -> { (s, d) =>
      val orderCnt = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice"), 2).as("spend"))
      Tables.customer(s, d)
        .join(orderCnt, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("spend"))
        .orderBy(col("c_custkey"))
    },

    // B12 full outer join across two aggregates keyed by nation.
    "q_join_full" -> { (s, d) =>
      val cust = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = Tables.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, col("c_nationkey") === col("s_nationkey"), "full")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },

    // B13 left semi join (EXISTS): orders having a high-discount line.
    "q_join_semi" -> { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_discount") >= 0.09),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // B14 left anti join (NOT EXISTS): customers with no very-large order.
    "q_join_anti" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // B15 non-equi (range) join: price-band dimension via inequality pair.
    "q_join_range" -> { (s, d) =>
      val bands = s.createDataFrame(Seq(
        ("band0", 0.0, 100000.0), ("band1", 100000.0, 250000.0),
        ("band2", 250000.0, 1e9))).toDF("band", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("band"))
    },

    // B16 cross join (small × small).
    "q_join_cross" -> { (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // B12 null-safe equality join (<=> ≙ IS NOT DISTINCT FROM): planted
    // nulls on both sides must pair up, where plain `=` drops them. Still a
    // hash join — null-safe keys hash like any value, no plan penalty.
    "q_join_nullsafe" -> { (s, d) =>
      val left = Tables.customer(s, d)
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 3, lit(null)).otherwise(col("c_custkey") % 7).as("k"))
      val right = Tables.nation(s, d)
        .select(when(col("n_nationkey") % 7 === 3, lit(null))
          .otherwise(col("n_nationkey") % 7).as("k"))
        .distinct()
        .withColumn("matched", lit(1L))
      left.join(right, left("k") <=> right("k"), "left")
        .groupBy(left("k").as("k"))
        .agg(count(lit(1)).as("n_rows"), count(col("matched")).as("n_matched"))
        .orderBy(col("k").asc_nulls_first)
    },

    // B19 exact distinct count + B18 multi-agg.
    "q_distinct_count" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))
    },

    // B21 rollup with grouping_id for deterministic null-group labeling.
    "q_rollup" -> { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    },

    // B21 cube.
    "q_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    },

    // B22 collect_list/collect_set, order-stabilized with sort_array. The
    // final projection serializes to strings: the driver's pandas compare
    // cannot hash array cells, so nested outputs stay scalar on both sides.
    "q_collect" -> { (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(
          concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
          concat_ws(",",
            transform(sort_array(collect_set(col("n_nationkey"))), k => k.cast("string"))).as("keys"))
        .orderBy(col("n_regionkey"))
    },

    // B23/B49 exact dedup by key, deterministic survivor via row_number.
    "q_dedup_rows" -> { (s, d) =>
      val w = Window.partitionBy(col("l_partkey"), col("l_suppkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_partkey"), col("l_suppkey"))
    },

    // B24 ranking window: top-3 orders per priority (row_number, rank, dense_rank).
    "q_window_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("rk"), col("drk"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    },

    // B25 lag/lead analytics over per-customer order history.
    "q_window_lag" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          coalesce(col("prev_price"), lit(-1.0)).as("prev_price"),
          coalesce(col("next_key"), lit(-1L)).as("next_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // B26 running aggregate over a frame (rowsBetween unbounded→current).
    "q_window_running" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("run_cnt", count(lit(1)).over(w))
        .withColumn("run_spend", round(sum(round(col("o_totalprice") * 100)).over(w) / 100, 2))
        .filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"), col("run_cnt"), col("run_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // B24 ranking windows, part 2: percent_rank, cume_dist, ntile, nth_value.
    "q_window_funcs2" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 400)
        .withColumn("pr", round(percent_rank().over(w), 9))
        .withColumn("cd", round(cume_dist().over(w), 9))
        .withColumn("nt", ntile(4).over(w))
        .withColumn("nth", nth_value(col("o_orderkey"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("o_orderpriority"), col("o_orderkey"), col("pr"), col("cd"),
          col("nt"), coalesce(col("nth"), lit(-1L)).as("nth"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },

    // B18 min_by/max_by (argmin/argmax) — unique price-key data keeps the
    // selection deterministic.
    "q_agg_minmax_by" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("key_of_max_price"),
          expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("key_of_min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("o_orderpriority"))
    },

    // B18 statistical aggregates computed from EXACT integer sums (cents
    // scaling): stddev/variance are order-dependent in floating point, so
    // the engine recipe is n·Σx²−(Σx)² over exact sums, identical in SQL.
    // Σx² runs in decimal(38,0) (DuckDB: HUGEINT) — as a double sum it
    // reaches ~4e19 per group at sf0.1, far past 2^53, so partial-sum order
    // would leak into the 4-decimal rounding. The single decimal→double cast
    // afterwards is one deterministic round-to-nearest in both engines.
    "q_stats_funcs" -> { (s, d) =>
      val cents = round(col("o_totalprice") * 100).cast("decimal(19,0)")
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents).cast("double").as("s1"),
          sum(cents * cents).cast("double").as("s2"))
        .select(col("o_orderstatus"), col("n"),
          round((col("s2") - col("s1") * col("s1") / col("n")) /
            (col("n") - 1) / 1e4, 4).as("var_samp"),
          round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
            (col("n") - 1)) / 1e2, 4).as("stddev_samp"))
        .orderBy(col("o_orderstatus"))
    },

    // B116 per-group OLS REGRESSION from mergeable sufficient statistics —
    // the "fit a trend per key" primitive (price-vs-quantity elasticity
    // here; quality-vs-length curves in a curation pipeline): slope and
    // intercept in closed form from (n, Σx, Σy, Σxy, Σx²), which is ONE
    // partial+final aggregate over the corpus — the regression never sees
    // a second pass, a sort, or a solver, and the statistics merge across
    // shards (the profiler convention). Arithmetic is exact integers end
    // to end: x = quantity (integer), y = price cents; slope_ppm =
    // (n·Σxy − Σx·Σy)·1e6 DIV (n·Σx² − Σx·Σx) in 128-bit (products of
    // int64 sums overflow int64 at sf0.1 — DECIMAL(38,0) here, HUGEINT in
    // the oracle), intercept from the already-floored slope so both
    // engines truncate at the SAME point. SIGN SEMANTICS (probed, not
    // assumed): Spark DIV and DuckDB // BOTH truncate toward zero
    // (−7 div 2 = −3 in each), so negative covariances are safe — and the
    // fixture exercises one (flag A's slope numerator is negative at
    // sf0.001; OlsSpec pins both the truncation semantics and the
    // negative-path witness). Spark's own regr_slope/regr_intercept are
    // float aggregates (order-dependent ulps); this shape is the
    // hash-stable equivalent.
    "q_stats_ols" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_ppm", expr(
          "CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy) " +
            "* 1000000 DIV (CAST(n AS DECIMAL(38,0)) * sxx " +
            "- CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)"))
        .withColumn("intercept_ppm", expr(
          "CAST((CAST(sy AS DECIMAL(38,0)) * 1000000 " +
            "- CAST(slope_ppm AS DECIMAL(38,0)) * sx) DIV n AS BIGINT)"))
        .select(col("flag"), col("n"), col("slope_ppm"), col("intercept_ppm"))
        .orderBy(col("flag"))
    },

    // B18/B21 pivot (wide conditional aggregation): status columns per
    // priority. Explicit value list keeps the schema static (no extra
    // distinct-values job — required at scale; .pivot(col) without values
    // runs a blocking distinct first).
    "q_pivot" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    },

    // B26 RANGE BETWEEN frame (the value-based frame the rowsBetween query
    // doesn't exercise): trailing-7-day spend per clerk ordered by date.
    "q_window_range" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("odate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400L, 0L)
      Tables.orders(s, d)
        .withColumn("odate", to_date(col("o_orderdate")))
        .filter(col("o_custkey") < 40)
        .withColumn("spend_7d",
          round(sum(round(col("o_totalprice") * 100)).over(w) / 100, 2))
        .withColumn("n_7d", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("odate"),
          col("n_7d"), col("spend_7d"))
        .orderBy(col("o_custkey"), col("odate"), col("o_orderkey"))
    },

    // B27 top-k per group (the similarity-search support primitive).
    "q_topk_group" -> { (s, d) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    // B65 the same top-k-per-group answer through a bounded typed
    // Aggregator (graft.functions.TopKAgg) instead of a window. Spark 4's
    // InferWindowGroupLimit already bounds the window form's exchange, but
    // only by first SORTING every input partition full-width; the partial
    // ObjectHashAggregate here streams once with a k-element buffer, no
    // Sort node anywhere below the presentation orderBy, and composes with
    // other aggregates in the same groupBy (see TopKAgg scaladoc). Same
    // oracle as q_topk_group: the aggregate must reproduce the window
    // answer exactly (the (acctbal DESC, custkey ASC) comparator is a
    // total order).
    "q_topk_agg" -> { (s, d) =>
      val topk = graft.functions.TopKAgg.topK(s, 5)
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(topk(col("c_acctbal"), col("c_custkey")).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("int").as("rn"),
          col("col._2").as("c_custkey"), col("col._1").as("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    // B65 composability: group stats AND the group's top examples in ONE
    // aggregate pass — count/sum/topk side by side in a single groupBy, so
    // one shuffle answers "how big is each segment, and who are its top-3
    // customers". The window form needs a second full pass + a join back
    // to the stats (exactly what the oracle SQL has to do); at 100 TB that
    // is a second scan and a second shuffle this plan never pays.
    "q_topk_composed" -> { (s, d) =>
      val topk = graft.functions.TopKAgg.topK(s, 3)
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          moneySum(col("c_acctbal"), 2).as("total_bal"),
          topk(col("c_acctbal"), col("c_custkey")).as("top"))
        .select(col("c_mktsegment"), col("n_cust"), col("total_bal"),
          posexplode(col("top")))
        .select(col("c_mktsegment"), col("n_cust"), col("total_bal"),
          (col("pos") + 1).cast("int").as("rn"),
          col("col._2").as("c_custkey"), col("col._1").as("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    // B28/B29 global multi-key sort + limit (TakeOrderedAndProject).
    "q_sort_topk" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    },

    // B30 union all + union distinct.
    "q_union" -> { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
      val b = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      a.unionByName(b).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"))
    },

    // B30 union DISTINCT (SQL UNION): set semantics, one dedup shuffle.
    "q_union_distinct" -> { (s, d) =>
      val a = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val b = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      a.union(b).distinct().orderBy(col("nationkey"))
    },

    // B31 intersect / except (distinct set semantics).
    "q_intersect" -> { (s, d) =>
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn).orderBy(col("nationkey"))
    },
    "q_except" -> { (s, d) =>
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sn = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      cn.except(sn).orderBy(col("nationkey"))
    },

    // Unpivot/melt (wide → long): the inverse of q_pivot. Zero shuffle past
    // the aggregate — melt is an Expand projection, each input row fans to
    // one row per measure. Measures ride the exact integer-cents rule so
    // the long `value` column is engine-exact.
    "q_unpivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"),
          sum(round(col("l_discount") * 100).cast("long")).as("disc_cents"),
          sum(round(col("l_quantity")).cast("long")).as("qty"))
        .unpivot(Array(col("flag")),
          Array(col("price_cents"), col("disc_cents"), col("qty")),
          "measure", "value")
        .orderBy(col("flag"), col("measure"))
    },

    // Salted skew join (graft.operators.Skew.saltedJoin): probe rows salted
    // into 8 buckets, dim side replicated 8x, join on (key, salt) — a hot
    // customer's orders spread over 8 reducers instead of funneling through
    // one. Semantics provably unchanged: the oracle is the PLAIN join. The
    // explicit sibling of AQE skew splitting, for build sides too large to
    // broadcast but cheap to replicate.
    "q_skew_salted_join" -> { (s, d) =>
      val dim = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"), col("c_nationkey"))
      val fact = Tables.orders(s, d)
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
      graft.operators.Skew.saltedJoin(fact, dim, "c_custkey", buckets = 8)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy(col("c_nationkey"))
    },

    // Runtime bloom-filter join reduction: build an exact-membership sketch
    // over the small side's keys (distributed aggregate, ~1.2 MB sketch to
    // the driver), ship it as a binary literal, and discard non-joining
    // fact rows BEFORE the join's shuffle. No false negatives, so prefilter
    // + join ≡ plain join (which is exactly what the oracle checks); false
    // positives are eliminated by the join itself. At 100 TB this is the
    // semi-join reduction that turns a 10%-selective dimension join from a
    // full fact shuffle into a tenth of one — what AQE's InjectRuntimeFilter
    // does automatically, made explicit and testable (BloomJoinSpec). The
    // probe is the codegen `bloom_might_contain` kernel, NOT a Scala UDF:
    // it runs once per fact row, and a UDF would box every key and split
    // the whole-stage-codegen span around the scan.
    "q_bloom_join" -> { (s, d) =>
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val bf = cust.stat.bloomFilter("c_custkey", 100000L, 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val mightContain = call_function("bloom_might_contain",
        col("o_custkey"), lit(bos.toByteArray))
      Tables.orders(s, d)
        .filter(col("o_custkey").isNotNull && mightContain)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy(col("status"))
    })

  val oracle: Map[String, String] = Map(
    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  ${moneySumSql("l_extendedprice", 2)} AS sum_base_price,
         |  ${moneySumSql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |  ${moneySumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
         |  ${moneyAvgSql("l_quantity", 0)} AS avg_qty,
         |  ${moneyAvgSql("l_extendedprice", 2)} AS avg_price,
         |  ${moneyAvgSql("l_discount", 2)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_linestatus = 'F'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-03-01'
        |  AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_case_when" ->
      s"""SELECT o_orderstatus,
         |  CASE WHEN o_totalprice < 50000 THEN 'low'
         |       WHEN o_totalprice < 200000 THEN 'mid'
         |       ELSE 'high' END AS price_band,
         |  count(*) AS n, ${moneySumSql("o_totalprice", 2)} AS total
         |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, price_band""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT p_brand, count(*) AS n_items,
         |  ${moneySumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_sortmerge" ->
      s"""SELECT o_orderpriority, count(*) AS n_lines,
         |  ${moneySumSql("l_extendedprice", 2)} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_left" ->
      s"""SELECT c_custkey, c_mktsegment,
         |  coalesce(n_orders, 0) AS n_orders, coalesce(spend, 0.0) AS spend
         |FROM customer LEFT JOIN (
         |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |    ${moneySumSql("o_totalprice", 2)} AS spend
         |  FROM orders GROUP BY o_custkey) agg ON c_custkey = o_custkey
         |ORDER BY c_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_range" ->
      s"""WITH bands(band, lo, hi) AS (VALUES
         |  ('band0', 0.0, 100000.0), ('band1', 100000.0, 250000.0), ('band2', 250000.0, 1e9))
         |SELECT band, count(*) AS n, ${moneySumSql("o_totalprice", 2)} AS total
         |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band ORDER BY band""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_nullsafe" ->
      """WITH l AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 3 THEN NULL ELSE c_custkey % 7 END AS k
        |  FROM customer),
        |r AS (
        |  SELECT DISTINCT
        |    CASE WHEN n_nationkey % 7 = 3 THEN NULL ELSE n_nationkey % 7 END AS k,
        |    1 AS matched
        |  FROM nation)
        |SELECT l.k, count(*) AS n_rows,
        |  CAST(count(r.matched) AS BIGINT) AS n_matched
        |FROM l LEFT JOIN r ON l.k IS NOT DISTINCT FROM r.k
        |GROUP BY l.k ORDER BY l.k NULLS FIRST""".stripMargin,

    "q_distinct_count" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT (l_partkey, l_suppkey)) AS BIGINT) AS n_part_supp,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_rollup" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS n, ${moneySumSql("o_totalprice", 2)} AS total
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_collect" ->
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  array_to_string(list_transform(list_sort(list(DISTINCT n_nationkey)),
        |    x -> CAST(x AS VARCHAR)), ',') AS keys
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_dedup_rows" ->
      """SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber FROM (
        |  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_partkey, l_suppkey
        |      ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t WHERE rn = 1
        |ORDER BY l_partkey, l_suppkey""".stripMargin,

    "q_window_rank" ->
      """SELECT o_orderpriority, rn, rk, drk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS INT) AS rn,
        |    CAST(rank() OVER w AS INT) AS rk,
        |    CAST(dense_rank() OVER w AS INT) AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  coalesce(prev_price, -1.0) AS prev_price,
        |  coalesce(next_key, -1) AS next_key FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    lag(o_totalprice, 1) OVER w AS prev_price,
        |    lead(o_orderkey, 1) OVER w AS next_key
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) t
        |WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, run_cnt, run_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    count(*) OVER w AS run_cnt,
        |    round(sum(round(o_totalprice * 100)) OVER w / 100, 2) AS run_spend
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t
        |WHERE o_custkey < 30 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_funcs2" ->
      """SELECT o_orderpriority, o_orderkey,
        |  round(percent_rank() OVER w, 9) AS pr,
        |  round(cume_dist() OVER w, 9) AS cd,
        |  CAST(ntile(4) OVER w AS INT) AS nt,
        |  coalesce(nth_value(o_orderkey, 2) OVER (
        |    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS nth
        |FROM orders WHERE o_orderkey < 400
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_agg_minmax_by" ->
      """SELECT DISTINCT o_orderpriority,
        |  first_value(o_orderkey) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey DESC) AS key_of_max_price,
        |  first_value(o_orderkey) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS key_of_min_price,
        |  max(o_totalprice) OVER (PARTITION BY o_orderpriority) AS max_price
        |FROM orders ORDER BY o_orderpriority""".stripMargin,

    "q_stats_funcs" ->
      """WITH s AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT)
        |           * CAST(round(o_totalprice * 100) AS HUGEINT)) AS DOUBLE) AS s2
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n,
        |  round((s2 - s1 * s1 / n) / (n - 1) / 1e4, 4) AS var_samp,
        |  round(sqrt((s2 - s1 * s1 / n) / (n - 1)) / 1e2, 4) AS stddev_samp
        |FROM s ORDER BY o_orderstatus""".stripMargin,

    // OLS: the same sufficient statistics in HUGEINT, slope floored first,
    // intercept from the floored slope — identical floor points
    "q_stats_ols" ->
      """WITH s AS (
        |  SELECT l_returnflag AS flag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(sum(CAST(l_quantity AS BIGINT) *
        |             CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy,
        |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx
        |  FROM lineitem GROUP BY l_returnflag),
        |sl AS (SELECT flag, n, sx, sy,
        |    CAST((n::HUGEINT * sxy - sx::HUGEINT * sy) * 1000000
        |         // (n::HUGEINT * sxx - sx::HUGEINT * sx) AS BIGINT) AS slope_ppm
        |  FROM s)
        |SELECT flag, n, slope_ppm,
        |  CAST((sy::HUGEINT * 1000000 - slope_ppm::HUGEINT * sx) // n AS BIGINT) AS intercept_ppm
        |FROM sl ORDER BY flag""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  count(*) OVER w AS n_7d,
        |  round(sum(round(o_totalprice * 100)) OVER w / 100, 2) AS spend_7d
        |FROM orders WHERE o_custkey < 40
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, odate, o_orderkey""".stripMargin,

    "q_topk_group" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        |  FROM customer) t
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    // Identical text to q_topk_group's oracle — the Aggregator plan must
    // reproduce the window-sort answer bit-for-bit.
    "q_topk_agg" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        |  FROM customer) t
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    // The oracle pays the two-pass price the composed aggregate avoids:
    // a window pass for the top-3 joined back onto the group stats.
    "q_topk_composed" ->
      s"""WITH g AS (
         |  SELECT c_mktsegment, count(*) AS n_cust,
         |    ${moneySumSql("c_acctbal", 2)} AS total_bal
         |  FROM customer GROUP BY 1),
         |t AS (
         |  SELECT c_mktsegment, c_custkey, c_acctbal,
         |    CAST(row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
         |  FROM customer)
         |SELECT t.c_mktsegment, g.n_cust, g.total_bal, t.rn, t.c_custkey,
         |  t.c_acctbal
         |FROM t JOIN g ON g.c_mktsegment = t.c_mktsegment
         |WHERE t.rn <= 3 ORDER BY t.c_mktsegment, t.rn""".stripMargin,

    "q_sort_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,

    "q_union" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000) t
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        |ORDER BY nationkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        |ORDER BY nationkey""".stripMargin,

    "q_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |    CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_cents,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT flag, 'price_cents' AS measure, price_cents AS value FROM w
        |UNION ALL SELECT flag, 'disc_cents', disc_cents FROM w
        |UNION ALL SELECT flag, 'qty', qty FROM w
        |ORDER BY flag, measure""".stripMargin,

    "q_skew_salted_join" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'MACHINERY'
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
