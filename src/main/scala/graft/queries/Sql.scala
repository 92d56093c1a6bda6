package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL-frontend parity (`spark.sql` passthrough over registered views):
  * each query here is ONE ANSI SQL string executed verbatim by BOTH engines
  * — Spark runs it through `spark.sql(...)`, the driver runs the identical
  * text in DuckDB. Any divergence in parsing, name resolution, type
  * coercion, or evaluation between the two SQL frontends breaks the hash.
  *
  * Doubles use the integer-scaling determinism recipe (QUtil) written
  * directly in the shared SQL; timestamps are cast to DATE.
  */
object Sql {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q3 shape: segment filter, 3-way join, grouped revenue, top 10. */
  private val tpch3 =
    """SELECT l_orderkey,
      |  round(sum(round((l_extendedprice * (1 - l_discount)) * 1e4)) / 1e4, 4) AS revenue,
      |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      |  AND CAST(l_shipdate AS DATE) > DATE '1997-03-15'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: region-restricted supplier/customer revenue by nation. */
  private val tpch5 =
    """SELECT n_name,
      |  round(sum(round((l_extendedprice * (1 - l_discount)) * 1e4)) / 1e4, 4) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q1 shape: the agg-heavy pricing summary — 8 aggregates per
    * (returnflag, linestatus) group. Float discipline: quantities are
    * integer-valued (sums exact in any order); per-row products are
    * round-scaled to 1e4 BEFORE the sum (IEEE-identical both engines);
    * averages derive from the exact sums, never a distributed avg(). */
  private val tpch1 =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  round(sum(round(l_extendedprice * 1e4)) / 1e4, 4) AS sum_base_price,
      |  round(sum(round((l_extendedprice * (1 - l_discount)) * 1e4)) / 1e4, 4) AS sum_disc_price,
      |  round(sum(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1e4)) / 1e4, 4) AS sum_charge,
      |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
      |  round(sum(round(l_extendedprice * 1e4)) / 1e4 / count(*), 4) AS avg_price,
      |  round(sum(round(l_discount * 1e4)) / 1e4 / count(*), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-01-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q9 shape (product-profit by nation and year): the 5-way join
    * chain part⋈lineitem⋈supplier⋈orders⋈nation with a part-name LIKE
    * filter. ADAPTED: the fixture has no partsupp table, so the profit
    * term drops ps_supplycost·l_quantity — the multi-join shape (what the
    * entry exercises) is unchanged. */
  private val tpch9 =
    """SELECT n_name AS nation, year(CAST(o_orderdate AS TIMESTAMP)) AS o_year,
      |  round(sum(round((l_extendedprice * (1 - l_discount)) * 1e4)) / 1e4, 4) AS sum_profit
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY n_name, year(CAST(o_orderdate AS TIMESTAMP))
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): HAVING-filtered IN
    * subquery over the fact table itself + 3-way join + top-100. The 200
    * threshold is probed non-vacuous at both SFs (874 / 9185 qualifying
    * orders at sf0.01 / sf0.1); quantity sums are integer-exact so the
    * HAVING boundary cannot float. */
  private val tpch18 =
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
      |  o_totalprice, sum(l_quantity) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
      |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q4 shape (order-priority checking): correlated EXISTS against
    * the fact table + date-range filter + interval arithmetic. ADAPTED:
    * the fixture has no commit/receipt dates, so "late line item" is
    * l_shipdate > o_orderdate + 60 days — the EXISTS decorrelation (what
    * the entry exercises) is unchanged. */
  private val tpch4 =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q14 shape (promotion effect): conditional aggregation ratio
    * over a fact⋈dim join. Both sums ship as exact scaled integers (the
    * ratio is the reader's division) — a floating ratio of two
    * distributed sums is the one thing the float discipline forbids. */
  private val tpch14 =
    """SELECT year(CAST(l_shipdate AS TIMESTAMP)) AS l_year,
      |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN round((l_extendedprice * (1 - l_discount)) * 1e4) ELSE 0 END) AS BIGINT) AS promo_rev4,
      |  CAST(sum(round((l_extendedprice * (1 - l_discount)) * 1e4)) AS BIGINT) AS total_rev4
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY year(CAST(l_shipdate AS TIMESTAMP))
      |ORDER BY l_year""".stripMargin

  /** TPC-H Q6 shape (forecasting revenue change): the pure filter-and-
    * aggregate scan — no join at all, the query whose whole cost is
    * pushdown quality. The revenue sum ships as an exact scaled integer. */
  private val tpch6 =
    """SELECT CAST(sum(round((l_extendedprice * l_discount) * 1e4)) AS BIGINT) AS revenue4,
      |  count(*) AS n
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 shape (returned-item reporting): 4-way join, returnflag
    * filter, top-20 customers by lost revenue. */
  private val tpch10 =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(round((l_extendedprice * (1 - l_discount)) * 1e4)) / 1e4, 4) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Correlated scalar subquery + HAVING — frontend features the DataFrame
    * catalog doesn't separately exercise. */
  private val subq =
    """SELECT c_mktsegment, count(*) AS n_above
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_nationkey = c.c_nationkey)
      |GROUP BY c_mktsegment
      |HAVING count(*) > 10
      |ORDER BY c_mktsegment""".stripMargin

  /** Candidate ISBN-13 strings derived deterministically from customer keys
    * (~10% carry a valid check digit). Shared SQL text. */
  private val isbnCands =
    """SELECT c_custkey,
      |  concat('978', lpad(CAST(c_custkey * 37 % 1000000000 AS STRING), 9, '0'),
      |         CAST(c_custkey % 10 AS STRING)) AS cand
      |FROM customer WHERE c_custkey < 500""".stripMargin

  /** B46 through the SQL surface: the registered isbn13_valid UDF vs the
    * checksum recomputed arithmetically by the oracle. */
  private val isbnSparkSql =
    s"""SELECT c_custkey, cand, isbn13_valid(cand) AS ok
       |FROM ($isbnCands) t ORDER BY c_custkey""".stripMargin

  private val isbnOracleSql =
    s"""SELECT c_custkey, cand,
       |  list_sum(list_transform(range(13),
       |    i -> CAST(substr(cand, CAST(i + 1 AS INT), 1) AS INT)
       |         * (CASE WHEN i % 2 = 0 THEN 1 ELSE 3 END))) % 10 = 0 AS ok
       |FROM ($isbnCands) t ORDER BY c_custkey""".stripMargin

  /** B21 GROUPING SETS + grouping_id() (the rollup/cube generalization —
    * the declared half the rollup/cube queries never exercised). Identical
    * text: both engines encode grouping_id as one bit per column, aggregated
    * column = 1. */
  private val groupingSets =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
      |  count(*) AS n,
      |  round(sum(round(o_totalprice * 100)) / 100, 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, status, priority""".stripMargin

  /** WITH RECURSIVE through both frontends (Spark 4 gained recursive CTEs;
    * DuckDB has always had them): a recursively generated month spine
    * LEFT-JOINed to real orders — the join direction every reporting query
    * needs when empty periods must still appear. Identical text. */
  private val recursive =
    """WITH RECURSIVE months(m) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT m + 1 FROM months WHERE m < 12)
      |SELECT m.m AS mo, count(o.o_orderkey) AS n,
      |  round(sum(round(o.o_totalprice * 100)) / 100, 2) AS total
      |FROM months m LEFT JOIN orders o
      |  ON month(CAST(o.o_orderdate AS TIMESTAMP)) = m.m
      | AND year(CAST(o.o_orderdate AS TIMESTAMP)) = 1996
      |GROUP BY m.m
      |ORDER BY mo""".stripMargin

  /** LATERAL correlated subquery (top-2-per-group through the SQL frontend
    * — the per-row-subquery form of q_topk_group's window). Identical text:
    * both engines support SQL:2016 LATERAL with correlated ORDER BY/LIMIT. */
  private val lateral =
    """SELECT n_name, t.c_name, t.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n_name, t.c_name""".stripMargin

  /** TPC-H q12 SHAPE (r14 verdict #3) — disjunctive CASE aggregation over
    * a fact-fact join: per line status (the fixture's stand-in for
    * l_shipmode, which the driver schema omits), split the joined orders
    * into high/low priority classes with IN / NOT IN CASE arms. The
    * optimizer shape under test: the date filter must push to the
    * lineitem scan BEFORE the join, and both CASE arms fold into one
    * aggregate pass. */
  private val tpch12 =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H q13 SHAPE — the left-outer count distribution: orders per
    * customer INCLUDING zero-order customers (count(o_orderkey) over the
    * outer join counts non-NULL only), then the histogram of those
    * counts. The join predicate lives in the OUTER join's ON clause (the
    * fixture's o_orderpriority filter standing in for the spec's
    * o_comment NOT LIKE) — pushing it to a WHERE would change the
    * semantics, the regression this entry pins. */
  private val tpch13 =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H q19 SHAPE — OR-of-ANDs pushdown over lineitem ⋈ part: three
    * disjoint (brand, size-range, quantity-range) branches OR'd together.
    * The optimizer shape under test: the common p_partkey = l_partkey
    * stays the join key while the disjunction splits into per-side
    * pushable conjuncts (p_brand/p_size to the part scan, l_quantity to
    * the lineitem scan) — the classic CNF-extraction case. Revenue in the
    * tpch6/tpch14 exact-integer convention (per-row round ×1e4, integer
    * sum). */
  private val tpch19 =
    """SELECT CAST(sum(round((l_extendedprice * (1 - l_discount)) * 1e4))
      |    AS BIGINT) AS revenue4,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  /** TPC-H q17 SHAPE — the correlated scalar AVG subquery (small-quantity
    * revenue): per Brand#23 lineitem, compare against 0.2 × that PART's
    * average quantity. The optimizer shape under test: decorrelation into
    * a per-part aggregate + join, not a per-row rescan. Float discipline:
    * l_quantity is integer-valued, so the distributed double sum is
    * order-free exact and avg = sum/count is the identical IEEE division
    * in both engines; revenue in the tpch6/14 exact-integer convention. */
  private val tpch17 =
    """SELECT CAST(sum(round(l_extendedprice * 1e4)) AS BIGINT)
      |    AS small_qty_rev4,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** TPC-H q22 SHAPE — NOT EXISTS anti-join + uncorrelated scalar AVG
    * threshold (global sales opportunity): above-average-balance
    * customers with no urgent orders, bucketed by the last digit of
    * c_name (the fixture's stand-in for the phone country code; the
    * spec's no-orders-at-all form is vacuous here — every fixture
    * customer has orders, PROBED). Float discipline: the threshold is an
    * INTEGER centi-balance floor-average — `avg(c_acctbal)` over
    * non-integer doubles would be order-dependent in the last ulp across
    * engines, exactly the boundary a hash compare cannot tolerate. */
  private val tpch22 =
    """SELECT right(c_name, 1) AS cntrycode, count(*) AS numcust,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS totacctbal_cents
      |FROM customer
      |WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
      |  (SELECT CAST(floor(sum(CAST(round(c_acctbal * 100) AS BIGINT))
      |       * 1.0 / count(*)) AS BIGINT)
      |   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY right(c_name, 1)
      |ORDER BY cntrycode""".stripMargin

  /** TPC-H q21 SHAPE — suppliers who kept orders waiting: the hardest
    * decorrelation shape in the suite, a correlated EXISTS *and* a
    * correlated NOT EXISTS against the same fact table, both keyed on the
    * outer lineitem's orderkey, the NOT EXISTS additionally referencing the
    * outer query's o_orderdate (the fixture has no commit/receipt dates, so
    * "late" is the q4 convention l_shipdate > o_orderdate + 60 days — the
    * lateness of a sibling line item is judged against the SAME order's
    * date, which is exactly what the extra outer correlation encodes). The
    * optimizer shape under test: both subqueries must decorrelate into one
    * semi- and one anti-join on l_orderkey, not per-row rescans. */
  private val tpch21 =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND n_name = 'NATION_7'
      |  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** TPC-H q20 SHAPE — potential part promotion: nested correlated IN
    * (an IN whose subquery itself carries an IN plus a correlated scalar
    * AVG). ADAPTED: the fixture has no partsupp, so the supplier-part
    * availability relation is lineitem itself and the spec's
    * ps_availqty > 0.5·sum(l_quantity) gate becomes
    * l_quantity > 0.5·avg over the same (part, supplier) pair — the
    * two-level decorrelation (what the entry exercises) is unchanged.
    * Non-vacuous at both SFs (3 / 37 suppliers pass at sf0.01 / sf0.1). */
  private val tpch20 =
    """SELECT s_name, s_suppkey
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |  AND s_suppkey IN (
      |    SELECT l1.l_suppkey FROM lineitem l1
      |    WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND CAST(l1.l_shipdate AS DATE) >= DATE '1997-01-01'
      |      AND CAST(l1.l_shipdate AS DATE) < DATE '1998-01-01'
      |      AND l1.l_quantity > (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |                           WHERE l2.l_partkey = l1.l_partkey AND l2.l_suppkey = l1.l_suppkey))
      |ORDER BY s_name""".stripMargin

  /** TPC-H q2 SHAPE — minimum-cost supplier: correlated scalar MIN whose
    * subquery is itself a 4-way join re-applying the outer region filter.
    * ADAPTED: no partsupp, so the part-supplier offer relation is lineitem
    * and "cost" is l_extendedprice (read verbatim from parquet — the MIN
    * and the equality compare involve no arithmetic, so doubles are exact
    * in both engines); DISTINCT collapses multiple line items at the same
    * minimum price to the one (part, supplier) offer row the spec's
    * partsupp would have had. */
  private val tpch2 =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      |  AND l_extendedprice = (
      |    SELECT min(l2.l_extendedprice)
      |    FROM lineitem l2
      |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H q11 SHAPE — important stock identification: GROUP BY + HAVING
    * against an uncorrelated scalar subquery that re-runs the same join.
    * ADAPTED: no partsupp, so "stock value" is the cent-exact lineitem
    * revenue per part for one nation's suppliers, and the spec's
    * SF-dependent fraction becomes a self-normalizing threshold (3× the
    * average per-part value) so the HAVING stays non-vacuous at every SF
    * (16 / 173 parts pass at sf0.01 / sf0.1, out of 2000 / 20000). The
    * per-part sums are integer cents — exact in any aggregation order. */
  private val tpch11 =
    """SELECT l_partkey, CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS value_cents
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7'
      |GROUP BY l_partkey
      |HAVING sum(round(l_extendedprice * 100)) > (
      |  SELECT 3.0 * sum(round(l_extendedprice * 100)) / count(DISTINCT l_partkey)
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7')
      |ORDER BY value_cents DESC, l_partkey""".stripMargin

  /** TPC-H q15 SHAPE — top supplier: a named CTE aggregated once, joined
    * back, and probed again by an uncorrelated scalar MAX over the same
    * CTE (the view-reuse shape; Spark must not recompute the CTE with a
    * different plan or the MAX comparison drifts). Revenue is the exact
    * scaled-integer convention, so the MAX boundary cannot float and ties
    * (all suppliers at the max) are returned identically by both engines. */
  private val tpch15 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(round((l_extendedprice * (1 - l_discount)) * 1e4)) AS BIGINT) AS total_rev4
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_rev4
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_rev4 = (SELECT max(total_rev4) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H q16 SHAPE — parts/supplier relationship: COUNT(DISTINCT) over
    * a NOT IN-filtered join with negated dim predicates (<>, NOT-prefix,
    * IN-list). ADAPTED: the supplier-part relation is lineitem (no
    * partsupp) and the spec's complaint-comment exclusion is the
    * s_acctbal < 0 suppliers (6 / 58 excluded at sf0.01 / sf0.1 — the NOT
    * IN is non-vacuous). The NOT IN subquery is non-nullable by schema,
    * so both engines agree on the anti-join semantics. */
  private val tpch16 =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#21'
      |  AND p_type <> 'MEDIUM'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H q7 SHAPE — volume shipping: the two-nation-pair disjunction
    * over a 6-way join with the nation dim joined TWICE under different
    * aliases (supplier's nation vs customer's nation — the classic
    * self-join-of-a-dim shape), grouped by the pair and ship year.
    * Revenue in the exact scaled-integer convention. */
  private val tpch7 =
    """SELECT supp_nation, cust_nation, l_year, CAST(sum(vol4) AS BIGINT) AS revenue4
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |        year(CAST(l_shipdate AS TIMESTAMP)) AS l_year,
      |        round((l_extendedprice * (1 - l_discount)) * 1e4) AS vol4
      |      FROM supplier
      |      JOIN lineitem ON s_suppkey = l_suppkey
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN customer ON c_custkey = o_custkey
      |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      |          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      |        AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H q8 SHAPE — national market share: the widest join in the suite
    * (7 relations, nation twice: customer side restricts the market via
    * region, supplier side names the competitor), with the share ratio
    * shipped as its two exact scaled-integer components (numerator =
    * conditional sum, denominator = total — the q14 convention; a
    * distributed double ratio is the one thing the float discipline
    * forbids). */
  private val tpch8 =
    """SELECT o_year,
      |  CAST(sum(CASE WHEN nation = 'NATION_1' THEN vol4 ELSE 0 END) AS BIGINT) AS nation_vol4,
      |  CAST(sum(vol4) AS BIGINT) AS total_vol4
      |FROM (SELECT year(CAST(o_orderdate AS TIMESTAMP)) AS o_year,
      |        round((l_extendedprice * (1 - l_discount)) * 1e4) AS vol4,
      |        n2.n_name AS nation
      |      FROM part
      |      JOIN lineitem ON p_partkey = l_partkey
      |      JOIN supplier ON s_suppkey = l_suppkey
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN customer ON c_custkey = o_custkey
      |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |      JOIN region ON n1.n_regionkey = r_regionkey
      |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') allnations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** Ordered string aggregation — the one place the two frontends need
    * different spellings for the same ANSI feature: Spark 4 ships
    * `listagg(x, sep) WITHIN GROUP (ORDER BY ...)`, DuckDB spells it
    * `string_agg(x, sep ORDER BY ...)`. The explicit order makes the
    * concatenation deterministic (unordered listagg is nondeterministic by
    * spec and would never hash-match). */
  private val listaggSpark =
    """SELECT n_regionkey,
      |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  private val listaggOracle =
    """SELECT n_regionkey,
      |  string_agg(n_name, ',' ORDER BY n_name) AS names,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** TPC-DS Q36 shape (r16 verdict #7): ROLLUP over a 2-level hierarchy
    * with a WINDOW over the grouping-sets output — rank-within-parent
    * partitions by the GROUPING() level and the parent key, the Expand +
    * Window composition DS queries exercise that plain TPC-H never does.
    * Revenue is exact-integer cents; every nullable sort key carries an
    * explicit NULLS FIRST (Spark ASC defaults NULLS FIRST, DuckDB NULLS
    * LAST — unpinned, the two engines order rollup rows differently). */
  private val ds36 =
    """SELECT CAST(grouping(p_brand) + grouping(p_type) AS INT) AS lochierarchy,
      |  p_brand, p_type,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  rank() OVER (
      |    PARTITION BY grouping(p_brand) + grouping(p_type),
      |      CASE WHEN grouping(p_type) = 0 THEN p_brand END
      |    ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)) DESC) AS rank_within_parent
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY ROLLUP(p_brand, p_type)
      |ORDER BY lochierarchy DESC, p_brand ASC NULLS FIRST,
      |  rank_within_parent, p_type ASC NULLS FIRST""".stripMargin

  /** TPC-DS Q67 shape: ROLLUP over THREE dims with a top-k window filter
    * over the mixed grouping levels — rank() partitions by the outer dim
    * only, so subtotal rows at every rollup depth compete in one ranking
    * (the DS q67 quirk), and the rk <= 3 filter is the window-pushdown
    * opportunity (Spark's LimitPushDownThroughWindow/rank pruning). Sales
    * are exact-integer cents. */
  private val ds67 =
    """WITH t AS (
      |  SELECT n_name, o_orderpriority,
      |    year(CAST(o_orderdate AS TIMESTAMP)) AS o_year,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |g AS (
      |  SELECT n_name, o_orderpriority, o_year,
      |    CAST(sum(cents) AS BIGINT) AS sales_cents,
      |    rank() OVER (PARTITION BY n_name ORDER BY sum(cents) DESC) AS rk
      |  FROM t GROUP BY ROLLUP(n_name, o_orderpriority, o_year))
      |SELECT n_name, o_orderpriority, o_year, sales_cents, rk
      |FROM g WHERE rk <= 3
      |ORDER BY n_name ASC NULLS FIRST, rk,
      |  o_orderpriority ASC NULLS FIRST, o_year ASC NULLS FIRST""".stripMargin

  /** TPC-DS Q49 shape: a correlated scalar subquery over a UNION ALL of
    * fact scans — the channelized-union CTE is probed twice by correlated
    * scalars (per-channel count and per-channel total), the decorrelation
    * + CTE-reuse composition the TPC-H suite's single-table subqueries
    * never combine. Threshold is the 1.1× channel mean via exact-integer
    * cross-multiplication (25 / 337 qualifying rows at sf0.01 / sf0.1,
    * all 3 channels represented — probed in DuckDB before landing). */
  private val ds49 =
    """WITH chan AS (
      |  SELECT 'returned' AS channel, l_suppkey AS k,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem WHERE l_returnflag = 'R'
      |  UNION ALL
      |  SELECT 'accepted', l_suppkey, CAST(round(l_extendedprice * 100) AS BIGINT)
      |  FROM lineitem WHERE l_returnflag = 'A'
      |  UNION ALL
      |  SELECT 'neutral', l_suppkey, CAST(round(l_extendedprice * 100) AS BIGINT)
      |  FROM lineitem WHERE l_returnflag = 'N'),
      |agg AS (SELECT channel, k, CAST(sum(cents) AS BIGINT) AS sum_cents FROM chan GROUP BY channel, k)
      |SELECT channel, k, sum_cents FROM agg a
      |WHERE sum_cents * (SELECT count(*) FROM agg b WHERE b.channel = a.channel) * 10
      |      > 11 * (SELECT sum(sum_cents) FROM agg b WHERE b.channel = a.channel)
      |ORDER BY channel, k""".stripMargin

  /** TPC-DS Q51 shape (the 4th DS-composition entry): two independently
    * windowed cumulative series FULL OUTER JOINed on (key, month), then a
    * SECOND window layer (max-so-far) over the join's nullable columns —
    * the window-over-outer-join composition none of the other DS shapes
    * reach. Per-month pre-aggregation makes the running sum's frame
    * deterministic (no within-month tie order); window sums are CAST
    * (DuckDB HUGEINT rule); the NULL-comparison filter (`ret_best >
    * acc_best` drops rows where either series hasn't started) is identical
    * three-valued logic in both engines, and surviving per-month gaps are
    * coalesced to -1 so every output column is non-null BIGINT
    * (4169 / 39543 rows at sf0.01 / sf0.1, probed in DuckDB first). */
  private val ds51 =
    """WITH acc AS (
      |  SELECT l_suppkey AS k,
      |    year(CAST(l_shipdate AS TIMESTAMP))*100 + month(CAST(l_shipdate AS TIMESTAMP)) AS ym,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY k, ym),
      |ret AS (
      |  SELECT l_suppkey AS k,
      |    year(CAST(l_shipdate AS TIMESTAMP))*100 + month(CAST(l_shipdate AS TIMESTAMP)) AS ym,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY k, ym),
      |acc_c AS (
      |  SELECT k, ym, CAST(sum(cents) OVER (PARTITION BY k ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM acc),
      |ret_c AS (
      |  SELECT k, ym, CAST(sum(cents) OVER (PARTITION BY k ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM ret),
      |j AS (
      |  SELECT coalesce(a.k, r.k) AS k, coalesce(a.ym, r.ym) AS ym,
      |    a.cum AS acc_cum, r.cum AS ret_cum
      |  FROM acc_c a FULL OUTER JOIN ret_c r ON a.k = r.k AND a.ym = r.ym),
      |x AS (
      |  SELECT k, ym, acc_cum, ret_cum,
      |    max(acc_cum) OVER (PARTITION BY k ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc_best,
      |    max(ret_cum) OVER (PARTITION BY k ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ret_best
      |  FROM j)
      |SELECT k, ym,
      |  coalesce(acc_cum, CAST(-1 AS BIGINT)) AS acc_cents,
      |  coalesce(ret_cum, CAST(-1 AS BIGINT)) AS ret_cents,
      |  acc_best, ret_best
      |FROM x WHERE ret_best > acc_best
      |ORDER BY k, ym""".stripMargin

  private def run(sql: String): Q = { (s, d) =>
    Tables.registerAll(s, d)
    graft.functions.udfs.registerAll(s)
    s.sql(sql)
  }

  val defs: Map[String, Q] = Map(
    "q_sql_tpch1" -> run(tpch1),
    "q_sql_tpch3" -> run(tpch3),
    "q_sql_tpch4" -> run(tpch4),
    "q_sql_tpch5" -> run(tpch5),
    "q_sql_tpch6" -> run(tpch6),
    "q_sql_tpch9" -> run(tpch9),
    "q_sql_tpch10" -> run(tpch10),
    "q_sql_tpch12" -> run(tpch12),
    "q_sql_tpch13" -> run(tpch13),
    "q_sql_tpch14" -> run(tpch14),
    "q_sql_tpch17" -> run(tpch17),
    "q_sql_tpch18" -> run(tpch18),
    "q_sql_tpch19" -> run(tpch19),
    "q_sql_tpch22" -> run(tpch22),
    "q_sql_tpch2" -> run(tpch2),
    "q_sql_tpch7" -> run(tpch7),
    "q_sql_tpch8" -> run(tpch8),
    "q_sql_tpch11" -> run(tpch11),
    "q_sql_tpch15" -> run(tpch15),
    "q_sql_tpch16" -> run(tpch16),
    "q_sql_tpch20" -> run(tpch20),
    "q_sql_tpch21" -> run(tpch21),
    "q_sql_ds36" -> run(ds36),
    "q_sql_ds67" -> run(ds67),
    "q_sql_ds49" -> run(ds49),
    "q_sql_ds51" -> run(ds51),
    "q_sql_subquery" -> run(subq),
    "q_grouping_sets" -> run(groupingSets),
    "q_sql_recursive" -> run(recursive),
    "q_sql_lateral" -> run(lateral),
    "q_sql_udf_isbn" -> run(isbnSparkSql),
    "q_sql_listagg" -> run(listaggSpark))

  val oracle: Map[String, String] = Map(
    "q_sql_tpch1" -> tpch1,
    "q_sql_tpch3" -> tpch3,
    "q_sql_tpch4" -> tpch4,
    "q_sql_tpch5" -> tpch5,
    "q_sql_tpch6" -> tpch6,
    "q_sql_tpch9" -> tpch9,
    "q_sql_tpch10" -> tpch10,
    "q_sql_tpch12" -> tpch12,
    "q_sql_tpch13" -> tpch13,
    "q_sql_tpch14" -> tpch14,
    "q_sql_tpch17" -> tpch17,
    "q_sql_tpch18" -> tpch18,
    "q_sql_tpch19" -> tpch19,
    "q_sql_tpch22" -> tpch22,
    "q_sql_tpch2" -> tpch2,
    "q_sql_tpch7" -> tpch7,
    "q_sql_tpch8" -> tpch8,
    "q_sql_tpch11" -> tpch11,
    "q_sql_tpch15" -> tpch15,
    "q_sql_tpch16" -> tpch16,
    "q_sql_tpch20" -> tpch20,
    "q_sql_tpch21" -> tpch21,
    "q_sql_ds36" -> ds36,
    "q_sql_ds67" -> ds67,
    "q_sql_ds49" -> ds49,
    "q_sql_ds51" -> ds51,
    "q_sql_subquery" -> subq,
    "q_grouping_sets" -> groupingSets,
    "q_sql_recursive" -> recursive,
    "q_sql_lateral" -> lateral,
    "q_sql_udf_isbn" -> isbnOracleSql,
    "q_sql_listagg" -> listaggOracle)
}
