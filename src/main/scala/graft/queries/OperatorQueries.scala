package graft.queries

import Registry._
import org.apache.spark.sql.functions._

/**
 * Per-operator battery covering the shipped-plan surface of the reference
 * (reference: ballista/core/proto/datafusion.proto:961-984 — hash join
 * with 8 join types + null-safe + residual filters, cross join, grouping
 * sets/rollup/cube, distinct + FILTER aggregates, sort/top-k,
 * limit/offset, window functions with ROWS/RANGE frames, union/intersect/
 * except, values, repartition). A mix of pure-SQL (shared verbatim with
 * the DuckDB oracle) and DataFrame-API implementations (to exercise the
 * Dataset path the reference's DataFrame client uses,
 * reference: ballista/client/src/context.rs:217-261).
 */
object OperatorQueries {

  // ---- joins ----------------------------------------------------------

  /** Inner join via the DataFrame API with explicit broadcast of the two
    * dimension tables — the COLLECT_LEFT analog (reference:
    * datafusion.proto:1299-1303; broadcast threshold
    * core/src/config.rs:203-205). */
  val joinInner = dfQ("join_inner",
    """SELECT r.r_name AS r_name, COUNT(*) AS n_customers
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name ORDER BY r_name""".stripMargin) { (s, dir) =>
    val c = s.table("customer")
    val n = s.table("nation")
    val r = s.table("region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name").as("r_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_name")
  }

  val joinLeft = sqlQ("join_left",
    """SELECT c.c_custkey AS c_custkey, COUNT(o.o_orderkey) AS n_orders
      |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey ORDER BY c_custkey""".stripMargin)

  val joinRight = sqlQ("join_right",
    """SELECT COUNT(*) AS n_custs_without_orders
      |FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o.o_orderkey IS NULL""".stripMargin)

  val joinFull = sqlQ("join_full",
    """SELECT COALESCE(a.k, b.k) AS k, a.n_cust AS n_cust, b.n_supp AS n_supp
      |FROM (SELECT CAST(c_nationkey AS BIGINT) AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
      |FULL JOIN (SELECT CAST(s_nationkey AS BIGINT) AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
      |  ON a.k = b.k
      |ORDER BY k""".stripMargin)

  /** LEFT SEMI via the DataFrame API ("left_semi" join type,
    * reference: datafusion.proto:242). */
  val joinSemi = dfQ("join_semi",
    """SELECT c_custkey FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, _) =>
    val c = s.table("customer")
    val o = s.table("orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(c("c_custkey").as("c_custkey")).orderBy("c_custkey")
  }

  /** LEFT ANTI via the DataFrame API (reference: datafusion.proto:243). */
  val joinAnti = dfQ("join_anti",
    """SELECT c_custkey FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, _) =>
    val c = s.table("customer")
    val o = s.table("orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(c("c_custkey").as("c_custkey")).orderBy("c_custkey")
  }

  /** RIGHT SEMI (reference: datafusion.proto:246 RIGHTSEMI) — Spark has
    * no right_semi join type; the exact equivalent is left_semi with the
    * build/probe sides swapped. */
  val joinRightSemi = dfQ("join_right_semi",
    """SELECT s_suppkey FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
      |ORDER BY s_suppkey""".stripMargin) { (s, _) =>
    val l = s.table("lineitem").filter(col("l_quantity") >= 49)
    val sup = s.table("supplier")
    sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_semi")
      .select(col("s_suppkey")).orderBy("s_suppkey")
  }

  /** RIGHT ANTI (reference: datafusion.proto:247 RIGHTANTI) — mirrored
    * left_anti. */
  val joinRightAnti = dfQ("join_right_anti",
    """SELECT s_suppkey FROM supplier s
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
      |ORDER BY s_suppkey""".stripMargin) { (s, _) =>
    val l = s.table("lineitem").filter(col("l_quantity") >= 49)
    val sup = s.table("supplier")
    sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_anti")
      .select(col("s_suppkey")).orderBy("s_suppkey")
  }

  val joinCross = sqlQ("join_cross",
    """SELECT r.r_name AS r_name, n.n_name AS n_name
      |FROM region r CROSS JOIN nation n
      |ORDER BY r_name, n_name""".stripMargin)

  /** Null-safe equality join (`null_equals_null`, reference:
    * datafusion.proto:1186) — Spark `<=>` vs DuckDB IS NOT DISTINCT FROM. */
  val joinNullSafe = sqlQ2("join_nullsafe",
    """SELECT COUNT(*) AS n FROM
      |(SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE CAST(n_nationkey AS BIGINT) END AS k FROM nation) a
      |JOIN
      |(SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE CAST(c_nationkey AS BIGINT) END AS k FROM customer) b
      |ON a.k <=> b.k""".stripMargin,
    """SELECT COUNT(*) AS n FROM
      |(SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE CAST(n_nationkey AS BIGINT) END AS k FROM nation) a
      |JOIN
      |(SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE CAST(c_nationkey AS BIGINT) END AS k FROM customer) b
      |ON a.k IS NOT DISTINCT FROM b.k""".stripMargin)

  /** Residual (theta) filter riding on an outer equi-join (`JoinFilter`,
    * reference: datafusion.proto:1299). */
  val joinResidual = sqlQ("join_residual",
    """SELECT s.s_suppkey AS s_suppkey, COUNT(l.l_orderkey) AS n
      |FROM supplier s LEFT JOIN lineitem l
      |  ON s.s_suppkey = l.l_suppkey AND l.l_quantity > s.s_acctbal / 250.0
      |GROUP BY s.s_suppkey ORDER BY s_suppkey""".stripMargin)

  // ---- aggregation variants ------------------------------------------

  val aggRollup = sqlQ("agg_rollup",
    """SELECT r.r_name AS r_name, n.n_name AS n_name, COUNT(*) AS n_supp,
      |  CAST(GROUPING(r.r_name) AS BIGINT) AS g_r, CAST(GROUPING(n.n_name) AS BIGINT) AS g_n
      |FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY ROLLUP(r.r_name, n.n_name)
      |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)

  val aggCube = sqlQ("agg_cube",
    """SELECT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_f, CAST(GROUPING(l_linestatus) AS BIGINT) AS g_s
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g_f, g_s, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)

  val aggGroupingSets = sqlQ("agg_groupingsets",
    """SELECT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)

  val aggDistinct = sqlQ("agg_distinct",
    """SELECT COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(DISTINCT l_partkey) AS n_part,
      |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dq
      |FROM lineitem""".stripMargin)

  val aggFilter = sqlQ("agg_filter",
    """SELECT l_returnflag AS l_returnflag,
      |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS sum_hi_disc
      |FROM lineitem
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

  val aggStats = sqlQ("agg_stats",
    """SELECT
      |  ROUND(VAR_SAMP(l_quantity), 4) AS var_s, ROUND(VAR_POP(l_quantity), 4) AS var_p,
      |  ROUND(STDDEV_SAMP(l_quantity), 6) AS std_s, ROUND(STDDEV_POP(l_quantity), 6) AS std_p,
      |  ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_s,
      |  ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS cov_p
      |FROM lineitem""".stripMargin)

  /** approx_distinct (reference: datafusion.proto:535) is approximate by
    * contract, so the pin is an error-bound check: the HLL estimate must
    * land within 5× its configured rsd of the exact count (comfortably
    * true when healthy, broken by any unit-scale bug), alongside exact
    * counts that the oracle reproduces directly. */
  val aggApproxDistinct = sqlQ2("agg_approx_distinct",
    """SELECT
      |  (ABS((SELECT approx_distinct(c_nationkey) FROM customer)
      |     - (SELECT COUNT(DISTINCT c_nationkey) FROM customer))
      |   <= GREATEST(2, CAST(CEIL(0.04 * (SELECT COUNT(DISTINCT c_nationkey) FROM customer)) AS BIGINT))) AS nat_within_rsd,
      |  (ABS((SELECT approx_distinct(l_partkey) FROM lineitem)
      |     - (SELECT COUNT(DISTINCT l_partkey) FROM lineitem))
      |   <= GREATEST(2, CAST(CEIL(0.04 * (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)) AS BIGINT))) AS part_within_rsd,
      |  (SELECT COUNT(DISTINCT c_nationkey) FROM customer) AS n_nat,
      |  (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS n_part""".stripMargin,
    """SELECT TRUE AS nat_within_rsd, TRUE AS part_within_rsd,
      |  (SELECT COUNT(DISTINCT c_nationkey) FROM customer) AS n_nat,
      |  (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS n_part""".stripMargin,
    bench = false)

  /** Exact interpolated percentiles agree bit-for-bit on integral data. */
  val aggPercentile = sqlQ2("agg_percentile",
    """SELECT CAST(PERCENTILE(l_quantity, 0.5) AS DOUBLE) AS p50,
      |  CAST(PERCENTILE(l_quantity, 0.25) AS DOUBLE) AS p25,
      |  CAST(PERCENTILE(l_quantity, 0.75) AS DOUBLE) AS p75,
      |  CAST(MEDIAN(l_quantity) AS DOUBLE) AS med
      |FROM lineitem""".stripMargin,
    """SELECT CAST(QUANTILE_CONT(l_quantity, 0.5) AS DOUBLE) AS p50,
      |  CAST(QUANTILE_CONT(l_quantity, 0.25) AS DOUBLE) AS p25,
      |  CAST(QUANTILE_CONT(l_quantity, 0.75) AS DOUBLE) AS p75,
      |  CAST(MEDIAN(l_quantity) AS DOUBLE) AS med
      |FROM lineitem""".stripMargin)

  /** array_agg → collect_list alias, order pinned by sort_array
    * (reference golden test: ballista/client/src/context.rs:873-906). */
  val aggArrayAgg = sqlQ2("agg_array_agg",
    """SELECT l_orderkey AS l_orderkey,
      |  ARRAY_JOIN(SORT_ARRAY(ARRAY_AGG(l_linenumber)), ',') AS lines
      |FROM lineitem WHERE l_orderkey <= 40
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    """SELECT l_orderkey AS l_orderkey,
      |  ARRAY_TO_STRING(LIST_SORT(LIST(l_linenumber)), ',') AS lines
      |FROM lineitem WHERE l_orderkey <= 40
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)

  // ---- window functions ----------------------------------------------

  val winRanks = sqlQ("win_ranks",
    """SELECT n.n_name AS n_name, s.s_suppkey AS s_suppkey,
      |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS prk, ROUND(CUME_DIST() OVER w, 6) AS cd,
      |  NTILE(4) OVER w AS nt
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WINDOW w AS (PARTITION BY n.n_name ORDER BY s.s_acctbal DESC, s.s_suppkey)
      |ORDER BY n_name, s_suppkey""".stripMargin)

  val winOffsets = sqlQ("win_offsets",
    """SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
      |  LAG(o_orderkey, 1) OVER wo AS prev_ok, LEAD(o_orderkey, 1) OVER wo AS next_ok,
      |  FIRST_VALUE(o_orderkey) OVER wf AS first_ok, LAST_VALUE(o_orderkey) OVER wf AS last_ok,
      |  NTH_VALUE(o_orderkey, 2) OVER wf AS second_ok
      |FROM orders
      |WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderkey),
      |       wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** ROWS frame running sum via the DataFrame Window API (reference frames:
    * datafusion.proto:651-676). */
  val winFrameRows = dfQ("win_frame_rows",
    """SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |  AS DOUBLE) AS run_sum
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, _) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    s.table("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").as("run_sum"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val winFrameRange = sqlQ("win_frame_range",
    """SELECT l_orderkey AS l_orderkey, l_linenumber AS l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
      |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
      |  AS DOUBLE) AS qsum
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)

  /** GROUPS frame emulation (reference frames include GROUPS,
    * datafusion.proto:651-676; Spark has no GROUPS unit): a GROUPS frame
    * over the ORDER BY peers equals a RANGE frame over their dense_rank.
    * (DuckDB 1.0 lacks GROUPS too, so the oracle runs the same
    * dense_rank formulation as an independent computation of the spec.) */
  val winFrameGroups = sqlQ2("win_frame_groups",
    """WITH d AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(o_orderdate AS DATE) AS od,
      |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS dr
      |  FROM orders
      |)
      |SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY dr RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
      |  AS DOUBLE) AS grp_sum
      |FROM d ORDER BY o_custkey, o_orderkey""".stripMargin,
    """WITH d AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS dr
      |  FROM orders
      |)
      |SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY dr RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
      |  AS DOUBLE) AS grp_sum
      |FROM d ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** GROUPS frame with a FOLLOWING bound (reference proto:651-676 allows
    * FOLLOWING window-frame bounds in GROUPS mode): `GROUPS BETWEEN 1
    * PRECEDING AND 2 FOLLOWING` ≡ RANGE [-1, +2] over the peers'
    * dense_rank — dense_rank is dense integers, so a RANGE offset of k
    * over it is exactly k peer-GROUPS. (DuckDB 1.0 in this environment
    * rejects native GROUPS mode — "not implemented yet", verified — so
    * the oracle independently computes the same dense-rank
    * reformulation.) */
  val winFrameGroupsFwd = sqlQ2("win_frame_groups_fwd",
    """WITH d AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS dr
      |  FROM orders
      |)
      |SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY dr RANGE BETWEEN 1 PRECEDING AND 2 FOLLOWING)
      |  AS DOUBLE) AS grp_sum,
      |  COUNT(*)
      |    OVER (PARTITION BY o_custkey ORDER BY dr RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING)
      |  AS grp_cnt
      |FROM d ORDER BY o_custkey, o_orderkey""".stripMargin,
    """WITH d AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS dr
      |  FROM orders
      |)
      |SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY dr RANGE BETWEEN 1 PRECEDING AND 2 FOLLOWING)
      |  AS DOUBLE) AS grp_sum,
      |  CAST(COUNT(*)
      |    OVER (PARTITION BY o_custkey ORDER BY dr RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING)
      |  AS BIGINT) AS grp_cnt
      |FROM d ORDER BY o_custkey, o_orderkey""".stripMargin)

  // ---- set operations -------------------------------------------------

  /** INTERSECT ALL / EXCEPT ALL multiplicity semantics. */
  val setOpsAll = sqlQ("setop_all",
    """SELECT k, COUNT(*) AS n FROM (
      |  SELECT CAST(l_suppkey % 20 AS BIGINT) AS k FROM lineitem WHERE l_orderkey <= 500
      |  INTERSECT ALL
      |  SELECT CAST(l_partkey % 20 AS BIGINT) AS k FROM lineitem WHERE l_orderkey <= 500) t
      |GROUP BY k
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT) AS k, COUNT(*) AS n FROM (
      |  SELECT CAST(l_suppkey % 20 AS BIGINT) AS k FROM lineitem WHERE l_orderkey <= 500
      |  EXCEPT ALL
      |  SELECT CAST(l_partkey % 20 AS BIGINT) AS k FROM lineitem WHERE l_orderkey <= 500) t2
      |ORDER BY k, n""".stripMargin)

  val setUnion = sqlQ("setop_union",
    """SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
      |UNION
      |SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier
      |ORDER BY k""".stripMargin)

  val setUnionAll = sqlQ("setop_unionall",
    """SELECT k, COUNT(*) AS n FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
      |  UNION ALL
      |  SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier) t
      |GROUP BY k ORDER BY k""".stripMargin)

  val setIntersect = sqlQ("setop_intersect",
    """SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
      |INTERSECT
      |SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier
      |ORDER BY k""".stripMargin)

  val setExcept = sqlQ("setop_except",
    """SELECT CAST(p_size AS BIGINT) AS v FROM part
      |EXCEPT
      |SELECT CAST(n_nationkey AS BIGINT) AS v FROM nation
      |ORDER BY v""".stripMargin)

  // ---- sort / limit / distinct / misc relational ----------------------

  /** Top-k: Spark plans this as TakeOrderedAndProject — the reference's
    * SortExec `fetch` (reference: datafusion.proto:1264-1269). */
  val sortTopK = sqlQ("sort_topk",
    """SELECT o_orderkey AS o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
      |FROM orders ORDER BY price DESC, o_orderkey LIMIT 15""".stripMargin)

  val limitOffset = sqlQ("limit_offset",
    """SELECT o_orderkey AS o_orderkey FROM orders
      |ORDER BY o_orderkey LIMIT 10 OFFSET 20""".stripMargin)

  val distinctRows = sqlQ("distinct_rows",
    """SELECT DISTINCT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus
      |FROM lineitem ORDER BY 1, 2""".stripMargin)

  val valuesInline = sqlQ2("values_inline",
    "SELECT a AS k, b AS v FROM VALUES (1,'x'),(2,'y'),(3,'z') AS t(a, b) ORDER BY k",
    "SELECT a AS k, b AS v FROM (VALUES (1,'x'),(2,'y'),(3,'z')) t(a, b) ORDER BY k",
    bench = false)

  /** EmptyRelation analog: projection with no FROM (reference:
    * ballista/client/src/context.rs:719-736). */
  val selectNoFrom = sqlQ("select_no_from",
    "SELECT 1 + 2 AS a, 'x' || 'y' AS b, CAST(NULL AS INT) AS c",
    bench = false)

  /** Explicit hash repartition before aggregation (reference:
    * datafusion.proto:1290-1297). */
  val repartitionAgg = dfQ("repartition_agg",
    """SELECT l_suppkey AS l_suppkey, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, _) =>
    s.table("lineitem")
      .repartition(8, col("l_suppkey"))
      .groupBy(col("l_suppkey").as("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .orderBy("l_suppkey")
  }

  /** Parameterized SQL — the reference's prepared-statement/placeholder
    * surface (reference: datafusion.proto:356,361-364) mapped to Spark 4's
    * named-parameter `sql(sqlText, args)`. */
  val preparedStmt = dfQ("prepared_stmt",
    """SELECT o_orderkey AS o_orderkey FROM orders
      |WHERE o_totalprice > 450000 ORDER BY o_orderkey""".stripMargin,
    bench = false) { (s, _) =>
    s.sql(
      "SELECT o_orderkey AS o_orderkey FROM orders WHERE o_totalprice > :minp ORDER BY o_orderkey",
      Map("minp" -> Int.box(450000)))
  }

  val all: Seq[Q] = Seq(
    joinInner, joinLeft, joinRight, joinFull, joinSemi, joinAnti,
    joinRightSemi, joinRightAnti, joinCross, joinNullSafe, joinResidual,
    aggRollup, aggCube, aggGroupingSets, aggDistinct, aggFilter, aggStats,
    aggApproxDistinct, aggPercentile, aggArrayAgg,
    winRanks, winOffsets, winFrameRows, winFrameRange, winFrameGroups,
    winFrameGroupsFwd,
    setUnion, setUnionAll, setIntersect, setExcept, setOpsAll,
    sortTopK, limitOffset, distinctRows, valuesInline, selectNoFrom,
    repartitionAgg, preparedStmt)
}
