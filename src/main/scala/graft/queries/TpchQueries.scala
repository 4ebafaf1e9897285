package graft.queries

import Registry._

/**
 * TPC-H-shaped queries over the driver testdata star schema (no
 * `partsupp` — q2/q11/q16/q20 shapes are adapted). The reference verifies
 * all 22 TPC-H queries row-exact (reference:
 * benchmarks/src/bin/tpch.rs:1295-1415); these reproduce the same operator
 * shapes: scan→filter→two-phase agg→sort (q1), multi-way joins (q3/q5/q10),
 * filter-agg (q6), CASE aggregation (q12/q14), scalar subqueries (q17),
 * IN-subquery + HAVING (q18), NOT EXISTS + top-level agg (q22), and the
 * q15 view lifecycle.
 *
 * Numeric idiom: the driver hash-compares against DuckDB, so every SUM/AVG
 * over a double column goes through an exact DECIMAL cast (the data is
 * 2-decimal money / integral quantities) and back to DOUBLE — identical
 * bits in both engines regardless of accumulation order. Plain double
 * passthrough columns are bit-identical by construction (same parquet).
 */
object TpchQueries {

  /** l_extendedprice * (1 - l_discount), exactly, as DECIMAL(17,4). */
  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  val q1 = sqlQ("tpch_q1",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM($discPrice * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  val q3 = sqlQ("tpch_q3",
    s"""SELECT o.o_orderkey AS o_orderkey,
       |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
       |  CAST(o.o_orderdate AS DATE) AS o_orderdate
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
       |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       |GROUP BY o.o_orderkey, o.o_orderdate
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin)

  val q5 = sqlQ("tpch_q5",
    s"""SELECT n.n_name AS n_name,
       |  CAST(SUM($discPrice) AS DOUBLE) AS revenue
       |FROM region r
       |JOIN nation n ON n.n_regionkey = r.r_regionkey
       |JOIN customer c ON c.c_nationkey = n.n_nationkey
       |JOIN orders o ON o.o_custkey = c.c_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n.n_name
       |ORDER BY revenue DESC, n_name""".stripMargin)

  val q6 = sqlQ("tpch_q6",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin)

  val q10 = sqlQ("tpch_q10",
    s"""SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
       |  CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, n.n_name AS n_name
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
       |  AND l.l_returnflag = 'R'
       |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin)

  val q12 = sqlQ("tpch_q12",
    """SELECT l.l_returnflag AS l_returnflag,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l.l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  val q14 = sqlQ("tpch_q14",
    s"""SELECT CAST(100.00 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN $discPrice ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       |     / CAST(SUM($discPrice) AS DOUBLE) AS DOUBLE) AS promo_revenue
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
       |  AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""".stripMargin)

  /** q15 shape: CREATE VIEW → query via the view → MAX scalar subquery.
    * The DataFrame is analyzed eagerly at `sql()`, so dropping the view
    * afterwards exercises the full lifecycle (reference:
    * benchmarks/queries/q15.sql:1-11) without breaking execution. */
  val q15 = dfQ("tpch_q15",
    s"""WITH revenue_v AS (
       |  SELECT l_suppkey AS supplier_no, CAST(SUM($discPrice) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
       |FROM supplier s JOIN revenue_v r ON s.s_suppkey = r.supplier_no
       |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue_v)
       |ORDER BY s_suppkey""".stripMargin) { (spark, _) =>
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW revenue_v AS
         |SELECT l_suppkey AS supplier_no, CAST(SUM($discPrice) AS DOUBLE) AS total_revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY l_suppkey""".stripMargin)
    val out = spark.sql(
      """SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
        |FROM supplier s JOIN revenue_v r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue_v)
        |ORDER BY s_suppkey""".stripMargin)
    spark.sql("DROP VIEW IF EXISTS revenue_v")
    out
  }

  /** q17 shape: correlated scalar subquery. AVG over integral-valued
    * doubles is order-independent (exact in IEEE double), so no decimal
    * dance is needed for the threshold. */
  val q17 = sqlQ("tpch_q17",
    """SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#1'
      |  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)

  val q18 = sqlQ("tpch_q18",
    """SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey,
      |  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120)
      |GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin)

  /** q22 shape: top-level agg over NOT EXISTS anti-join with a scalar
    * average threshold (exact via decimal). */
  val q22 = sqlQ("tpch_q22",
    """SELECT cntrycode,
      |  COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
      |  FROM customer c
      |  WHERE c_acctbal > (
      |      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |      FROM customer WHERE c_acctbal > 0.0)
      |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |) t
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin)

  /** q4 shape: EXISTS semi-join into a priority histogram. */
  val q4 = sqlQ("tpch_q4",
    """SELECT o_orderpriority AS o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  /** q7 shape: bidirectional nation-pair volume by year (double nation
    * join + disjunctive pair filter). */
  val q7 = sqlQ("tpch_q7",
    s"""SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year, $discPrice AS volume
       |  FROM supplier s
       |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
       |  JOIN orders o ON o.o_orderkey = l.l_orderkey
       |  JOIN customer c ON c.c_custkey = o.o_custkey
       |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
       |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
       |) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)

  /** q8 shape: market-share ratio via conditional aggregation per year. */
  val q8 = sqlQ("tpch_q8",
    s"""SELECT o_year,
       |  CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       |    / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year, $discPrice AS volume,
       |    n1.n_name AS nation
       |  FROM part p
       |  JOIN lineitem l ON p.p_partkey = l.l_partkey
       |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |  JOIN orders o ON o.o_orderkey = l.l_orderkey
       |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
       |  WHERE p.p_type = 'ECONOMY'
       |) all_nations
       |GROUP BY o_year ORDER BY o_year""".stripMargin)

  /** q9 shape: profit by nation and year (p_retailprice standing in for
    * ps_supplycost — no partsupp in the testdata schema). */
  val q9 = sqlQ("tpch_q9",
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l.l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
      |      - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
      |  FROM part p
      |  JOIN lineitem l ON p.p_partkey = l.l_partkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE p.p_name LIKE '%a%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin)

  /** q13 shape: customer order-count distribution via outer join with an
    * ON-clause residual filter. */
  val q13 = sqlQ("tpch_q13",
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey AS c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin)

  /** q19 shape: disjunction of conjunctive band predicates across the
    * join (pushdown + residual OR filter). */
  val q19 = sqlQ("tpch_q19",
    s"""SELECT CAST(SUM($discPrice) AS DOUBLE) AS revenue
       |FROM lineitem l
       |JOIN part p ON p.p_partkey = l.l_partkey
       |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
       |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 40 AND l.l_quantity BETWEEN 20 AND 50)""".stripMargin)

  /** q2 shape: correlated scalar MIN subquery selecting the cheapest
    * offer per part (partsupp stood in by lineitem prices). */
  val q2 = sqlQ("tpch_q2",
    """SELECT s.s_name AS s_name, p.p_partkey AS p_partkey,
      |  CAST(l.l_extendedprice AS DOUBLE) AS min_price
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |WHERE p.p_size = 10
      |  AND l.l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
      |    WHERE l2.l_partkey = p.p_partkey)
      |ORDER BY min_price DESC, p_partkey, s_name
      |LIMIT 25""".stripMargin)

  /** q11 shape: group-by with a HAVING threshold derived from a scalar
    * subquery over the whole relation (partsupp value → supplier-side
    * lineitem value). */
  val q11 = sqlQ("tpch_q11",
    """SELECT l_suppkey AS l_suppkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS value
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) > (
      |  SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) * 0.011
      |  FROM lineitem)
      |ORDER BY value DESC, l_suppkey""".stripMargin)

  /** q16 shape: NOT IN anti-subquery + COUNT(DISTINCT) histogram. */
  val q16 = sqlQ("tpch_q16",
    """SELECT p.p_brand AS p_brand, p.p_type AS p_type,
      |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |WHERE p.p_size IN (5, 10, 15, 20)
      |  AND l.l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin)

  /** q20 shape: nested IN chains with a grouped HAVING threshold. */
  val q20 = sqlQ("tpch_q20",
    """SELECT s_name AS s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'p%')
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100)
      |ORDER BY s_name""".stripMargin)

  /** q21 shape: EXISTS + NOT EXISTS against the same fact table. */
  val q21 = sqlQ("tpch_q21",
    """SELECT s.s_name AS s_name, COUNT(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_quantity > 45)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin)

  val all: Seq[Q] =
    Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15,
      q16, q17, q18, q19, q20, q21, q22)
}
