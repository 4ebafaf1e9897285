package graft.queries

import Registry._

/**
 * h2o db-benchmark groupby suite, adapted to the testdata (the reference
 * ships and runs this suite: benchmarks/db-benchmark/groupby-datafusion.py,
 * q1-q10). The h2o synthetic table `x(id1..id6, v1..v3)` is derived from
 * `lineitem` in a shared CTE:
 *
 *  - id1/id2: low-cardinality strings (returnflag 3, linestatus 2)
 *  - id3:     mid-cardinality string (supplier bucket, ~100)
 *  - id4/id5: low-cardinality ints
 *  - id6:     high-cardinality int (orderkey) — the q8/q10 stress key
 *  - v1/v2:   small exact ints (SUMs stay integer-exact cross-engine)
 *  - v3:      double with 2-decimal lattice (l_discount*100) so the
 *             exact-DECIMAL reduction idiom applies and stddev/median stay
 *             on a small scale (cross-engine ROUND-stable)
 *
 * All SQL is dialect-portable (same text runs in Spark and DuckDB):
 * FLOOR before int casts (DuckDB rounds double→int, Spark truncates),
 * SUM(int) cast to BIGINT (DuckDB widens to HUGEINT), double reductions
 * through DECIMAL.
 */
object H2oQueries {

  private val xCte =
    """WITH x AS (
      |  SELECT l_returnflag AS id1, l_linestatus AS id2,
      |    CONCAT('g', CAST(l_suppkey % 100 AS STRING)) AS id3,
      |    l_linenumber AS id4,
      |    CAST(l_partkey % 10 AS INT) AS id5,
      |    l_orderkey AS id6,
      |    CAST(FLOOR(l_quantity) AS INT) % 5 + 1 AS v1,
      |    CAST(l_partkey % 15 AS INT) + 1 AS v2,
      |    l_discount * 100 AS v3
      |  FROM lineitem)""".stripMargin

  /** q1: sum v1 by a 3-value key — the map-side-combine showcase. */
  val q1 = sqlQ("h2o_q1",
    s"""$xCte
       |SELECT id1, CAST(SUM(v1) AS BIGINT) AS v1
       |FROM x GROUP BY id1 ORDER BY id1""".stripMargin)

  /** q2: sum v1 by two low-card keys. */
  val q2 = sqlQ("h2o_q2",
    s"""$xCte
       |SELECT id1, id2, CAST(SUM(v1) AS BIGINT) AS v1
       |FROM x GROUP BY id1, id2 ORDER BY id1, id2""".stripMargin)

  /** q3: sum + mean by a mid-card key. Mean = exact-int SUM over COUNT —
    * one double division of identical exact operands, bit-stable. */
  val q3 = sqlQ("h2o_q3",
    s"""$xCte
       |SELECT id3, CAST(SUM(v1) AS BIGINT) AS v1,
       |  CAST(SUM(CAST(v3 AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v3
       |FROM x GROUP BY id3 ORDER BY id3""".stripMargin)

  /** q4: three means by a low-card int key. */
  val q4 = sqlQ("h2o_q4",
    s"""$xCte
       |SELECT id4,
       |  CAST(SUM(v1) AS DOUBLE) / COUNT(*) AS mean_v1,
       |  CAST(SUM(v2) AS DOUBLE) / COUNT(*) AS mean_v2,
       |  CAST(SUM(CAST(v3 AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v3
       |FROM x GROUP BY id4 ORDER BY id4""".stripMargin)

  /** q5: three sums by the high-card key — the partial-agg stress shape. */
  val q5 = sqlQ("h2o_q5",
    s"""$xCte
       |SELECT id6, CAST(SUM(v1) AS BIGINT) AS v1, CAST(SUM(v2) AS BIGINT) AS v2,
       |  CAST(SUM(CAST(v3 AS DECIMAL(12,2))) AS DOUBLE) AS v3
       |FROM x GROUP BY id6 ORDER BY id6""".stripMargin)

  /** q6: median + stddev by two keys (v3 scale ~0-10 keeps ROUND stable). */
  val q6 = sqlQ("h2o_q6",
    s"""$xCte
       |SELECT id4, id5, CAST(MEDIAN(v3) AS DOUBLE) AS median_v3,
       |  ROUND(STDDEV(v3), 6) AS stddev_v3
       |FROM x GROUP BY id4, id5 ORDER BY id4, id5""".stripMargin)

  /** q7: range (max-min) by a mid-card key — exact ints. */
  val q7 = sqlQ("h2o_q7",
    s"""$xCte
       |SELECT id3, MAX(v1) - MIN(v2) AS range_v1_v2
       |FROM x GROUP BY id3 ORDER BY id3""".stripMargin)

  /** q8: largest two v3 per high-card group. Output is (id6, v3) only, so
    * the multiset is tie-permutation-invariant; DISTINCT ON is avoided for
    * portability. */
  val q8 = sqlQ("h2o_q8",
    s"""$xCte
       |SELECT id6, v3 FROM (
       |  SELECT id6, v3,
       |    ROW_NUMBER() OVER (PARTITION BY id6 ORDER BY v3 DESC) AS rn
       |  FROM x) t
       |WHERE rn <= 2 ORDER BY id6, v3 DESC""".stripMargin)

  /** q9: r² of v1 vs v2 by two keys (reference groups without selecting the
    * keys; keys are selected here so rows are identifiable). */
  val q9 = sqlQ("h2o_q9",
    s"""$xCte
       |SELECT id2, id4, ROUND(POW(CORR(v1, v2), 2), 4) AS r2
       |FROM x GROUP BY id2, id4 ORDER BY id2, id4""".stripMargin)

  /** q10: sum + count by ALL six keys — the widest-key high-card agg. */
  val q10 = sqlQ("h2o_q10",
    s"""$xCte
       |SELECT id1, id2, id3, id4, id5, id6,
       |  CAST(SUM(CAST(v3 AS DECIMAL(12,2))) AS DOUBLE) AS v3,
       |  COUNT(*) AS cnt
       |FROM x GROUP BY id1, id2, id3, id4, id5, id6
       |ORDER BY id1, id2, id3, id4, id5, id6""".stripMargin)

  // ---- h2o db-benchmark JOIN suite (reference:
  // benchmarks/db-benchmark/join-datafusion.py q1-q5) adapted to the
  // testdata's natural size ladder: supplier(small, 100) / part(medium,
  // 2k) / orders(large, 15k) against lineitem(x, 60k). Output is the
  // h2o-style checksum row (COUNT + value sums) so the oracle hash stays
  // cheap while the join itself fully materializes. Joins on the
  // dimension keys broadcast the small side; the large-side left join
  // shuffles once on the key.

  /** join q1: big INNER JOIN small on an int key. */
  val jq1 = sqlQ("h2o_join_q1",
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_v1,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_v2
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""".stripMargin)

  /** join q2: big INNER JOIN medium on an int key. */
  val jq2 = sqlQ("h2o_join_q2",
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_v1,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_v2
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin)

  /** join q3: big LEFT JOIN medium on an int key (null-preserving). */
  val jq3 = sqlQ("h2o_join_q3",
    """SELECT COUNT(*) AS n, COUNT(*) - COUNT(p_partkey) AS n_unmatched,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_v1,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_v2
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey""".stripMargin)

  /** join q4: big LEFT JOIN small on a STRING (factor) key — weights from
    * an inline VALUES dim; weights are exact binary fractions so the
    * per-row product is exact before the DECIMAL reduction. */
  val jq4 = sqlQ("h2o_join_q4",
    """SELECT COUNT(*) AS n, COUNT(*) - COUNT(wt) AS n_unmatched,
      |  CAST(SUM(CAST(value * wt AS DECIMAL(14,4))) AS DOUBLE) AS sum_wv
      |FROM events LEFT JOIN (
      |  VALUES ('click', 1.5), ('view', 0.5), ('purchase', 2.5),
      |         ('signup', 1.25)) d(etype, wt)
      |  ON event_type = etype""".stripMargin)

  /** join q5: big LEFT JOIN large on the high-card key. */
  val jq5 = sqlQ("h2o_join_q5",
    """SELECT COUNT(*) AS n, COUNT(*) - COUNT(o_orderkey) AS n_unmatched,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_v1,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_v2
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey""".stripMargin)

  val all: Seq[Q] = Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10,
    jq1, jq2, jq3, jq4, jq5)
}
