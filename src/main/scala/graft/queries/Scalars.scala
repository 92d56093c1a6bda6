package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function families (SURVEY.md §2 B32–B38) — every family exercised
  * in ≥1 oracle-checked query. Functions are all `org.apache.spark.sql
  * .functions` built-ins (codegen'd, whole-stage-friendly); no UDFs here.
  *
  * Oracle parity notes (DuckDB vs Spark):
  *  - DuckDB date-part fns return BIGINT, Spark INT → CAST in the SQL;
  *  - DuckDB `floor` returns DOUBLE, Spark LONG for integral input → pin;
  *  - libm fns (ln/exp/pow) can differ by 1 ulp → round(…, 9) both sides;
  *  - xxhash64/monotonically_increasing_id have no DuckDB counterpart →
  *    exercised via deterministic cardinality outputs in
  *    [[Sources]].q_misc_ids instead of raw values.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // B32 string family: regexp_extract/replace, lower/upper, lpad, concat_ws,
    // trim, length, split+element_at (split_part analog), substring.
    "q_str_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") < 200)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("id_digits"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
          lower(col("c_mktsegment")).as("seg_lower"),
          upper(substring(col("c_name"), 1, 4)).as("prefix_up"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          concat_ws("|", col("c_mktsegment"), col("c_nationkey").cast("string")).as("joined"),
          length(col("c_name")).as("name_len"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
          element_at(split(col("c_name"), "#"), 2).as("name_part"))
        .orderBy(col("c_custkey"))
    },

    // B33 date/time family: year/month/day, weekday, date_trunc, to_date,
    // datediff, date_add, last_day.
    "q_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          weekday(col("o_orderdate")).as("wd"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).as("days_to_2002"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          last_day(col("o_orderdate")).as("eom"))
        .orderBy(col("o_orderkey"))
    },

    // B34 math family: arithmetic, round/floor/ceil, abs, pow, sqrt, ln, exp.
    "q_math_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") < 300)
        .select(
          col("c_custkey"),
          round(col("c_acctbal") / 7, 3).as("div7"),
          floor(col("c_acctbal")).as("flr"),
          ceil(col("c_acctbal")).as("cl"),
          abs(col("c_acctbal") - 5000).as("dist5k"),
          round(pow(col("c_nationkey") + 1, 2), 9).as("nk_sq"),
          round(sqrt(abs(col("c_acctbal"))), 9).as("sq"),
          round(log(abs(col("c_acctbal")) + 1), 9).as("ln1p"),
          round(exp(col("c_nationkey") / 25.0), 9).as("expk"))
        .orderBy(col("c_custkey"))
    },

    // B35 array family incl. higher-order: split/size/contains/sort/slice,
    // transform+aggregate (sum of token lengths), filter (long tokens).
    // Array outputs are concat_ws-serialized: the driver's pandas compare
    // cannot hash array cells, so the final projection stays scalar.
    "q_array_funcs" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          array_contains(col("toks"), "spark").as("has_spark"),
          concat_ws(",", slice(sort_array(col("toks")), 1, 3)).as("first3"),
          aggregate(transform(col("toks"), t => length(t)), lit(0),
            (acc, x) => acc + x).as("char_sum"),
          size(filter(col("toks"), t => length(t) > 5)).as("n_long"))
        .orderBy(col("doc_id"))
    },

    // B9/B34 conditional + NaN family: greatest/least, isnan, nanvl, nvl2.
    "q_cond_funcs" -> { (s, d) =>
      val maybeNan = when(col("o_totalprice") < 150000, lit(Double.NaN))
        .otherwise(col("o_totalprice"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          greatest(col("o_totalprice"), lit(100000.0),
            col("o_custkey").cast("double")).as("g"),
          least(col("o_totalprice"), lit(100000.0),
            col("o_custkey").cast("double")).as("l"),
          isnan(maybeNan).as("is_nan"),
          round(nanvl(maybeNan, lit(-1.0)), 2).as("nan_fixed"),
          expr("nvl2(nullif(o_orderstatus, 'P'), 'notP', 'isP')").as("nv"))
        .orderBy(col("o_orderkey"))
    },

    // B35 array family, part 2: set algebra (union/intersect/except),
    // position, flatten — serialized sorted for the compare.
    "q_array_funcs2" -> { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .withColumn("a", slice(toks, 1, 6))
        .withColumn("b", slice(toks, 4, 6))
        .select(
          col("doc_id"),
          concat_ws(",", sort_array(array_union(col("a"), col("b")))).as("un"),
          concat_ws(",", sort_array(array_intersect(col("a"), col("b")))).as("inter"),
          concat_ws(",", sort_array(array_except(col("a"), col("b")))).as("exc"),
          // try_element_at: ANSI element_at(a, 2) throws INVALID_ARRAY_INDEX
          // for <2-token docs; DuckDB a[2] yields NULL (and list_position of
          // NULL is NULL in both engines), so null-propagation is the parity.
          array_position(col("a"), try_element_at(col("a"), lit(2))).cast("int").as("pos2"),
          size(flatten(array(col("a"), col("b")))).as("n_flat"))
        .orderBy(col("doc_id"))
    },

    // B36 map family: map construction, element_at, map_keys, str_to_map.
    // Oracle computes the same values directly (DuckDB MAP output types are
    // not parquet-comparable; the Spark side still exercises the map ops).
    "q_map_funcs" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("m", map(lit("len"), col("n_chars"), lit("id"), col("doc_id")))
        .withColumn("sm", str_to_map(
          concat(lit("lang:"), col("lang"), lit(",src:"), col("source")), lit(","), lit(":")))
        .select(
          col("doc_id"),
          element_at(col("m"), "len").as("len_val"),
          concat_ws(",", sort_array(map_keys(col("m")))).as("mkeys"),
          element_at(col("sm"), "lang").as("lang_val"),
          element_at(col("sm"), "src").as("src_val"))
        .orderBy(col("doc_id"))
    },

    // B37 JSON family: get_json_object + from_json(schema) on events.props.
    "q_json_funcs" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val parsed = ev.withColumn("k_str", get_json_object(col("props"), "$.k"))
        .withColumn("k2", from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
          .getField("k"))
      parsed.groupBy(col("event_type"))
        .agg(
          sum(col("k_str").cast("long")).as("sum_k_str"),
          sum(col("k2")).as("sum_k_json"),
          count(col("k2")).as("n"))
        .orderBy(col("event_type"))
    },

    // B34/B38 bitwise family: and/or/xor, shifts, bit_count.
    "q_bit_funcs" -> { (s, d) =>
      Tables.nation(s, d)
        .select(
          col("n_nationkey"),
          col("n_nationkey").bitwiseAND(lit(12)).as("band"),
          col("n_nationkey").bitwiseOR(lit(5)).as("bor"),
          col("n_nationkey").bitwiseXOR(col("n_regionkey")).as("bxor"),
          shiftleft(col("n_nationkey"), 3).as("shl"),
          shiftright(col("n_nationkey"), 1).as("shr"),
          expr("bit_count(n_nationkey)").as("bits"))
        .orderBy(col("n_nationkey"))
    },

    // B32 string family, part 2: translate/repeat/reverse/position/left/
    // right/contains-style predicates + regexp_count.
    "q_str_funcs2" -> { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") < 150)
        .select(
          col("c_custkey"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
          reverse(col("c_mktsegment")).as("rev"),
          repeat(col("c_mktsegment"), 2).as("rep"),
          instr(col("c_name"), "#").cast("int").as("hash_pos"),
          substring(col("c_name"), 1, 8).as("left8"),
          col("c_name").substr(length(col("c_name")) - 2, lit(3)).as("right3"),
          col("c_name").contains("Customer").as("has_word"),
          col("c_mktsegment").startsWith("B").as("starts_b"),
          col("c_name").endsWith("1").as("ends_1"),
          regexp_count(col("c_name"), lit("[0-9]")).cast("int").as("n_digits"))
        .orderBy(col("c_custkey"))
    },

    // B32/B49 fuzzy-matching primitives: levenshtein edit distance (the
    // classic blocking-free fuzzy-dedup confirm step) between derived name
    // variants — both engines implement the identical DP definition.
    "q_str_fuzzy" -> { (s, d) =>
      val mangled = regexp_replace(col("c_name"), "[0-9]", "")
      Tables.customer(s, d)
        .filter(col("c_custkey") < 100)
        .select(
          col("c_custkey"),
          levenshtein(col("c_name"), mangled).as("lev_digits"),
          levenshtein(col("c_mktsegment"), reverse(col("c_mktsegment"))).as("lev_rev"),
          levenshtein(col("c_name"),
            concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")))
            .as("lev_cross"))
        .orderBy(col("c_custkey"))
    },

    // B37 JSON family, part 2: to_json over named_struct (serialization
    // direction; integer/string fields keep the text form engine-stable).
    "q_json_funcs2" -> { (s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"),
          to_json(struct(col("n_nationkey").as("k"), col("n_name").as("name")))
            .as("js"),
          get_json_object(
            to_json(struct(col("n_regionkey").as("r"))), "$.r").as("r_back"))
        .orderBy(col("n_nationkey"))
    },

    // B30 unionByName with missing columns (schema-evolution union).
    "q_union_byname" -> { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_custkey") < 50)
        .select(col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      val b = Tables.supplier(s, d).filter(col("s_suppkey") < 30)
        .select(col("s_suppkey").as("id"), col("s_acctbal").as("bal"))
      a.unionByName(b, allowMissingColumns = true)
        .select(col("id"), coalesce(col("seg"), lit("(supplier)")).as("seg"), col("bal"))
        .orderBy(col("seg"), col("id"))
    },

    // B35/B47 posexplode: generator with element position.
    "q_posexplode" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(col("pos") < 5)
        .orderBy(col("doc_id"), col("pos"))
    },

    // B38 hash/misc family: sha2-256, md5, coalesce, nullif.
    "q_hash_funcs" -> { (s, d) =>
      Tables.nation(s, d)
        .select(
          col("n_nationkey"),
          sha2(col("n_name"), 256).as("sha"),
          md5(concat(col("n_name"), lit("|"), col("n_regionkey").cast("string"))).as("m5"),
          coalesce(nullif(col("n_name"), lit("NATION_0")), lit("ZERO")).as("nn"))
        .orderBy(col("n_nationkey"))
    },

    // B28 null ordering pinned: nulls sort first ascending in both engines.
    "q_sort_nulls" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 300)
        .withColumn("st", nullif(col("o_orderstatus"), lit("P")))
        .select(col("o_orderkey"), col("st"))
        .orderBy(col("st").asc_nulls_first, col("o_orderkey"))
    },

    // B18 exact percentiles (linear interpolation — same definition as
    // DuckDB's quantile_cont).
    "q_percentiles" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"),
          round(expr("percentile(l_discount, array(0.25, 0.75))[0]"), 6).as("p25_disc"),
          round(expr("percentile(l_discount, array(0.25, 0.75))[1]"), 6).as("p75_disc"))
        .orderBy(col("l_returnflag"))
    },

    // B72 mergeable quantile sketch (graft.functions.QuantileSketch): the
    // bounded-memory single-pass discrete quantiles a 100 TB scan needs —
    // exact `percentile` buffers every value per group; the sketch holds ≤
    // capacity per level and compacts deterministically. At test scale the
    // capacity (2^19) exceeds every group, so no compaction fires and the
    // answer is the exact rank-ceil(p·n) order statistic — which is
    // DuckDB's quantile_disc rule, so the oracle is the plain exact query
    // (the CMS/HLL convention: the sketch is invisible in the answer until
    // the memory bound binds). Only binary-exact p values (1/4, 1/2, 3/4,
    // 7/8) so ceil(p·n) never sits on a float boundary in either engine.
    // QuantileSketchSpec measures the compacted regime's rank error.
    // requireExact (r10 ADVICE): the exact-regime assumption is CHECKED —
    // a group outgrowing the capacity fails loudly instead of silently
    // diverging from the exact oracle at a larger sf.
    "q_quantile_sketch" -> { (s, d) =>
      val qs = graft.functions.QuantileSketch.quantiles(
        s, capacity = 1 << 19, ps = Seq(0.25, 0.5, 0.75, 0.875),
        requireExact = true)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(qs(col("l_quantity")).as("q"))
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("q25"),
          element_at(col("q"), 2).as("q50"),
          element_at(col("q"), 3).as("q75"),
          element_at(col("q"), 4).as("q875"))
        .orderBy(col("l_returnflag"))
    },

    // B18 skewed-key aggregation via the two-phase salted rewrite
    // (graft.operators.Skew): values must equal the direct groupBy — the
    // oracle IS the direct aggregation.
    "q_skew_salted_agg" -> { (s, d) =>
      graft.operators.Skew.saltedAgg(
        Tables.lineitem(s, d), Seq(col("l_returnflag")), buckets = 16,
        partial = Seq(count(lit(1)).as("pc"),
          sum(round(col("l_extendedprice") * 100)).as("ps"),
          min(col("l_quantity")).as("pmn"), max(col("l_quantity")).as("pmx")),
        finalAgg = Seq(sum(col("pc")).as("n"),
          round(sum(col("ps")) / 100, 2).as("sum_price"),
          min(col("pmn")).as("min_qty"), max(col("pmx")).as("max_qty")))
        .orderBy(col("l_returnflag"))
    },

    // B20 approx distinct (HLL), DIFFERENTIAL form (r10 verdict #2): the
    // sketch estimate itself is engine-private (Spark's HLL++ and DuckDB's
    // HLL produce different numbers by design), so the hash-checkable row is
    // the BOUND CHECK — per group, `within_bound` = |approx − exact| ≤
    // 5·rsd·exact, which the oracle computes as a constant `true` from its
    // exact count. A broken HLL (or a broken bound) flips the boolean and
    // the hash catches it; ApproxSpec still pins the tighter empirical
    // error. 5·rsd, not 3·rsd: HLL++'s error is ~Gaussian with σ = rsd, so
    // 3σ fails one group in ~370 across rounds/sfs — a flake budget this
    // catalog doesn't carry; 5σ is ~1e-7 while still 25× tighter than a
    // trivial bound. The two aggregates run as SEPARATE scans joined on the
    // 3-row group key — NOT one groupBy: Spark's distinct-agg rewrite
    // groups by (flag, orderkey) first and drags the HLL partial through
    // that stage, materializing ONE SKETCH PER DISTINCT KEY (~150k HLL
    // buffers at sf0.1) before merging — measured 10.6 s vs 2.0 s for the
    // plain HLL shape, and caught by the r11 drift gate ON ITS FIRST RUN.
    // Split, each aggregate keeps its natural partial+final plan (3
    // sketches total) and the join is 3 rows. (The exact countDistinct is
    // the test-scale oracle anchor; at 100 TB the sketch runs alone and
    // the bound is monitored on sampled partitions.)
    "q_approx_distinct" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val exact = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_orders"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx"))
      exact.join(approx, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders")).cast("double") <=
            lit(5 * 0.01) * col("exact_orders")).as("within_bound"))
        .orderBy(col("l_returnflag"))
    },

    // B107 KMV distinct sketch with SET ALGEBRA
    // (graft.functions.KmvSketch, scale posture + the full estimator
    // contract there): per SOURCE, the k = 256 smallest 60-bit md5 hashes
    // of the source's distinct word-3-gram SHINGLE set, then pairwise
    // union/intersection cardinality estimates computed sketch-to-sketch —
    // the question HLL structurally can't answer ("how much does source
    // X's content overlap source Y's", the sketch-sized counterpart of
    // q_dedup_source_matrix's exact provenance join), shipped as
    // exact-integer VALUES under the oracle because the k smallest hashes
    // of a set are deterministic in any engine. The corpus choice is
    // load-bearing for non-vacuousness: per-source shingle sets GENUINELY
    // partially overlap (measured Jaccard ~2–8% at sf0.01, ~25% at sf0.1
    // from planted cross-source duplication), so ρ sits strictly between
    // 0 and k — an id-keyed grouping (every group sees every key) would
    // make the intersection estimator trivially saturate. One shingle
    // scan (the shared typed-flatMap generator, partial+final aggregate,
    // ≤ k longs per source on the shuffle); the pair algebra runs on
    // |sources|² = 190 tiny arrays. The sketch crosses regimes across
    // fixtures: exact at sf0.001 (≈100 shingles/source < k), estimating
    // at sf0.01/0.1 — both estimator branches sit under the hash.
    // KmvSketchSpec pins the exact-regime theorem, merge-order
    // invariance, the measured estimation error, and intersection
    // calibration on planted-overlap sets.
    "q_sketch_kmv" -> { (s, d) =>
      val k = 256
      val kmvAgg = graft.functions.KmvSketch.kmv(s, k)
      val docs = Tables.documents(s, d)
      val sk = graft.operators.NearDup.shingles(docs.select(col("doc_id"), col("text")))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("source").as("grp"),
          conv(substring(md5(col("sh")), 1, 15), 16, 10)
            .cast("long").as("hv"))
        .groupBy(col("grp")).agg(kmvAgg(col("hv")).as("sk"))
      val est = (c: String) => expr(graft.functions.KmvSketch.estimateSql(c, k))
      sk.select(col("grp").as("grp_a"), col("sk").as("ska"))
        .join(sk.select(col("grp").as("grp_b"), col("sk").as("skb")),
          col("grp_a") < col("grp_b"))
        .withColumn("uni", expr(s"slice(array_sort(array_union(ska, skb)), 1, $k)"))
        .withColumn("est_union", est("uni"))
        .withColumn("rho",
          expr("CAST(size(array_intersect(uni, array_intersect(ska, skb))) AS BIGINT)"))
        .select(col("grp_a"), col("grp_b"),
          est("ska").as("est_a"), est("skb").as("est_b"),
          col("est_union"), col("rho"),
          expr("CAST(CAST(rho AS DECIMAL(38,0)) * est_union DIV size(uni) AS BIGINT)")
            .as("est_inter"))
        .orderBy(col("grp_a"), col("grp_b"))
    })

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)$', 1) AS id_digits,
        |  regexp_replace(c_name, 'Customer', 'Cust') AS short_name,
        |  lower(c_mktsegment) AS seg_lower,
        |  upper(substring(c_name, 1, 4)) AS prefix_up,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |  concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS joined,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  trim('  ' || c_mktsegment || '  ') AS trimmed,
        |  split_part(c_name, '#', 2) AS name_part
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT c_custkey,
        |  round(c_acctbal / 7, 3) AS div7,
        |  CAST(floor(c_acctbal) AS BIGINT) AS flr,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS cl,
        |  abs(c_acctbal - 5000) AS dist5k,
        |  round(pow(c_nationkey + 1, 2), 9) AS nk_sq,
        |  round(sqrt(abs(c_acctbal)), 9) AS sq,
        |  round(ln(abs(c_acctbal) + 1), 9) AS ln1p,
        |  round(exp(c_nationkey / 25.0), 9) AS expk
        |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3,
        |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS INT) AS char_sum,
        |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS INT) AS n_long
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_cond_funcs" ->
      """SELECT o_orderkey,
        |  greatest(o_totalprice, 100000.0, CAST(o_custkey AS DOUBLE)) AS g,
        |  least(o_totalprice, 100000.0, CAST(o_custkey AS DOUBLE)) AS l,
        |  isnan(CASE WHEN o_totalprice < 150000 THEN 'nan'::DOUBLE ELSE o_totalprice END) AS is_nan,
        |  round(CASE WHEN o_totalprice < 150000 THEN -1.0 ELSE o_totalprice END, 2) AS nan_fixed,
        |  CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL THEN 'notP' ELSE 'isP' END AS nv
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin,

    "q_array_funcs2" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(text, ' ')[1:6] AS a,
        |    string_split(text, ' ')[4:9] AS b
        |  FROM documents)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS un,
        |  coalesce(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ','), '') AS inter,
        |  coalesce(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS exc,
        |  CAST(list_position(a, a[2]) AS INT) AS pos2,
        |  CAST(len(flatten([a, b])) AS INT) AS n_flat
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_map_funcs" ->
      """SELECT doc_id,
        |  n_chars AS len_val,
        |  'id,len' AS mkeys,
        |  lang AS lang_val,
        |  source AS src_val
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_type,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k_str,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k_json,
        |  count(props->>'$.k') AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_str_fuzzy" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, regexp_replace(c_name, '[0-9]', '', 'g')) AS INT) AS lev_digits,
        |  CAST(levenshtein(c_mktsegment, reverse(c_mktsegment)) AS INT) AS lev_rev,
        |  CAST(levenshtein(c_name, c_mktsegment || '#' || CAST(c_custkey AS VARCHAR)) AS INT) AS lev_cross
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,

    "q_json_funcs2" ->
      """SELECT n_nationkey,
        |  '{"k":' || n_nationkey || ',"name":"' || n_name || '"}' AS js,
        |  CAST(n_regionkey AS VARCHAR) AS r_back
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_union_byname" ->
      """SELECT id, coalesce(seg, '(supplier)') AS seg, bal FROM (
        |  SELECT c_custkey AS id, c_mktsegment AS seg, c_acctbal AS bal
        |  FROM customer WHERE c_custkey < 50
        |  UNION ALL
        |  SELECT s_suppkey AS id, NULL AS seg, s_acctbal AS bal
        |  FROM supplier WHERE s_suppkey < 30) t
        |ORDER BY seg, id""".stripMargin,

    "q_posexplode" ->
      """SELECT doc_id, CAST(i AS INT) AS pos, string_split(text, ' ')[CAST(i + 1 AS INT)] AS tok
        |FROM documents, unnest(range(len(string_split(text, ' ')))) u(i)
        |WHERE doc_id < 20 AND i < 5
        |ORDER BY doc_id, pos""".stripMargin,

    "q_bit_funcs" ->
      """SELECT n_nationkey,
        |  n_nationkey & 12 AS band,
        |  n_nationkey | 5 AS bor,
        |  xor(n_nationkey, n_regionkey) AS bxor,
        |  n_nationkey << 3 AS shl,
        |  n_nationkey >> 1 AS shr,
        |  CAST(bit_count(n_nationkey) AS INT) AS bits
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_str_funcs2" ->
      """SELECT c_custkey,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
        |  reverse(c_mktsegment) AS rev,
        |  repeat(c_mktsegment, 2) AS rep,
        |  CAST(instr(c_name, '#') AS INT) AS hash_pos,
        |  substring(c_name, 1, 8) AS left8,
        |  right(c_name, 3) AS right3,
        |  contains(c_name, 'Customer') AS has_word,
        |  starts_with(c_mktsegment, 'B') AS starts_b,
        |  ends_with(c_name, '1') AS ends_1,
        |  CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digits
        |FROM customer WHERE c_custkey < 150 ORDER BY c_custkey""".stripMargin,

    "q_hash_funcs" ->
      """SELECT n_nationkey,
        |  sha256(n_name) AS sha,
        |  md5(n_name || '|' || CAST(n_regionkey AS VARCHAR)) AS m5,
        |  coalesce(nullif(n_name, 'NATION_0'), 'ZERO') AS nn
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // the bound check is the hash-checkable claim (see the query comment):
    // the oracle's exact count must equal Spark's countDistinct, and the
    // oracle asserts the 5·rsd envelope holds by emitting the constant it
    // predicts — a Spark-side HLL drifting outside the envelope flips
    // within_bound and the hash mismatches.
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  true AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // full KMV replay: the k smallest hashes per group ARE deterministic,
    // so the sketch build, both marginal estimates, the union sketch, and
    // the ρ-rescaled intersection estimate all replay as windows + HUGEINT
    // arithmetic (the engine's DECIMAL(38,0) ≡ HUGEINT convention)
    "q_sketch_kmv" ->
      """WITH shs AS (SELECT source, doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |ex AS (SELECT DISTINCT source AS grp, u.s AS sh
        |  FROM shs, unnest(list_transform(range(len(toks) - 2),
        |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) u(s)
        |  WHERE len(toks) >= 3),
        |h AS (SELECT DISTINCT grp,
        |    CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS hv
        |  FROM ex),
        |r AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT grp, hv, rn FROM r WHERE rn <= 256),
        |est AS (SELECT grp, count(*) AS kk,
        |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS BIGINT)
        |         ELSE CAST(255::HUGEINT * 1152921504606846976::HUGEINT
        |                   // max(CASE WHEN rn = 256 THEN hv END) AS BIGINT) END AS est
        |  FROM sk GROUP BY grp),
        |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b, a.est AS est_a, b.est AS est_b
        |  FROM est a JOIN est b ON a.grp < b.grp),
        |uh AS (SELECT grp_a, grp_b, hv,
        |    row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY hv) AS rn
        |  FROM (SELECT DISTINCT p.grp_a, p.grp_b, s.hv
        |        FROM pairs p JOIN sk s ON s.grp = p.grp_a OR s.grp = p.grp_b)),
        |uk AS (SELECT grp_a, grp_b, hv, rn FROM uh WHERE rn <= 256),
        |ucard AS (SELECT grp_a, grp_b, count(*) AS ku,
        |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS BIGINT)
        |         ELSE CAST(255::HUGEINT * 1152921504606846976::HUGEINT
        |                   // max(CASE WHEN rn = 256 THEN hv END) AS BIGINT) END AS est_union
        |  FROM uk GROUP BY grp_a, grp_b),
        |rho AS (SELECT u.grp_a, u.grp_b, count(*) AS rho
        |  FROM uk u
        |  JOIN sk sa ON sa.grp = u.grp_a AND sa.hv = u.hv
        |  JOIN sk sb ON sb.grp = u.grp_b AND sb.hv = u.hv
        |  GROUP BY u.grp_a, u.grp_b)
        |SELECT p.grp_a, p.grp_b, p.est_a, p.est_b, uc.est_union,
        |  coalesce(r.rho, 0) AS rho,
        |  CAST(coalesce(r.rho, 0)::HUGEINT * uc.est_union::HUGEINT // uc.ku AS BIGINT) AS est_inter
        |FROM pairs p
        |JOIN ucard uc ON uc.grp_a = p.grp_a AND uc.grp_b = p.grp_b
        |LEFT JOIN rho r ON r.grp_a = p.grp_a AND r.grp_b = p.grp_b
        |ORDER BY p.grp_a, p.grp_b""".stripMargin,

    "q_quantile_sketch" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.25) AS q25,
        |  quantile_disc(l_quantity, 0.5) AS q50,
        |  quantile_disc(l_quantity, 0.75) AS q75,
        |  quantile_disc(l_quantity, 0.875) AS q875
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
        |  round(quantile_cont(l_discount, 0.25), 6) AS p25_disc,
        |  round(quantile_cont(l_discount, 0.75), 6) AS p75_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_skew_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(round(l_extendedprice * 100)) / 100, 2) AS sum_price,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_sort_nulls" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
        |FROM orders WHERE o_orderkey < 300
        |ORDER BY st ASC NULLS FIRST, o_orderkey""".stripMargin)
}
