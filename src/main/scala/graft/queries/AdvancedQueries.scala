package graft.queries

import Registry._
import graft.operators.{RangeJoin, TemporalJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Advanced relational operators a training-data pipeline needs beyond the
 * reference's own surface: as-of (temporal) joins, point-in-interval
 * range joins, deterministic sampling / train-test splits, explode with
 * ordinality, and pivot/unpivot reshaping. Spark implementations live in
 * graft.operators (scale-shaped: no pair explosion, no cartesian); every
 * query is pinned to a DuckDB oracle (DuckDB's native ASOF JOIN and plain
 * theta joins replay the semantics independently).
 */
object AdvancedQueries {

  // ---- as-of joins ----------------------------------------------------

  /** Left side: purchases. Right side: clicks, pre-aggregated to one row
    * per (user, time) — the as-of tie contract (TemporalJoin scaladoc). */
  private def purchasesClicks(s: SparkSession): (DataFrame, DataFrame) = {
    val ev = s.table("events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr(Registry.EventsTsUs).as("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"),
        expr(Registry.EventsTsUs).as("click_ts_us"))
      .agg(max("event_id").as("click_id"))
    (p, c)
  }

  private val asofBackOracle =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS click_ts_us,
      |             MAX(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id AS event_id, p.user_id AS user_id,
      |  p.ts_us AS ts_us, c.click_ts_us AS click_ts_us,
      |  c.click_id AS click_id, p.ts_us - c.click_ts_us AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.click_ts_us <= p.ts_us
      |ORDER BY event_id""".stripMargin

  /** For each purchase, the user's most recent click at-or-before it. */
  val joinAsof = dfQ("join_asof", asofBackOracle) { (s, _) =>
    val (p, c) = purchasesClicks(s)
    TemporalJoin.asofJoin(p, c, Seq("user_id"), "ts_us", "click_ts_us")
      .withColumn("gap_us", col("ts_us") - col("click_ts_us"))
      .orderBy("event_id")
  }

  private val asofFwdOracle =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS click_ts_us,
      |             MAX(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id AS event_id, p.user_id AS user_id,
      |  p.ts_us AS ts_us, c.click_ts_us AS click_ts_us,
      |  c.click_id AS click_id, c.click_ts_us - p.ts_us AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.click_ts_us >= p.ts_us
      |ORDER BY event_id""".stripMargin

  /** Forward direction: the next click at-or-after each purchase. */
  val joinAsofFwd = dfQ("join_asof_fwd", asofFwdOracle) { (s, _) =>
    val (p, c) = purchasesClicks(s)
    TemporalJoin.asofJoin(p, c, Seq("user_id"), "ts_us", "click_ts_us",
        direction = TemporalJoin.Forward)
      .withColumn("gap_us", col("click_ts_us") - col("ts_us"))
      .orderBy("event_id")
  }

  private val asofTolOracle =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS click_ts_us,
      |             MAX(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts_us AS ts_us,
      |  CASE WHEN p.ts_us - c.click_ts_us <= 3600000000 THEN c.click_ts_us END AS click_ts_us,
      |  CASE WHEN p.ts_us - c.click_ts_us <= 3600000000 THEN c.click_id END AS click_id
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.click_ts_us <= p.ts_us
      |ORDER BY event_id""".stripMargin

  /** Backward as-of with a 1-hour tolerance: older matches are nulled,
    * the left row kept (pandas merge_asof(tolerance=...) contract). */
  val joinAsofTol = dfQ("join_asof_tol", asofTolOracle) { (s, _) =>
    val (p, c) = purchasesClicks(s)
    TemporalJoin.asofJoin(p, c, Seq("user_id"), "ts_us", "click_ts_us",
        toleranceUs = Some(3600000000L))
      .orderBy("event_id")
  }

  // ---- range (point-in-interval) join ---------------------------------

  private val rangeOracle =
    """WITH iv AS (
      |  SELECT o_orderkey,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo_day,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 3 AS hi_day
      |  FROM orders WHERE o_orderkey < 100),
      |pt AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d
      |  FROM lineitem)
      |SELECT iv.o_orderkey AS o_orderkey, COUNT(*) AS n_pts,
      |  CAST(MIN(pt.d) AS BIGINT) AS min_day, CAST(MAX(pt.d) AS BIGINT) AS max_day
      |FROM pt JOIN iv ON pt.d BETWEEN iv.lo_day AND iv.hi_day
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Ship-date density inside each order's 4-day window — a keyless
    * interval join, planned as a binned equi-join (RangeJoin scaladoc),
    * NOT a nested-loop cartesian. */
  val joinRange = dfQ("join_range", rangeOracle) { (s, _) =>
    val iv = s.table("orders").filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("lo_day"))
      .withColumn("hi_day", col("lo_day") + 3)
    val pt = s.table("lineitem").select(
      datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    RangeJoin.pointInterval(pt, "d", iv, "lo_day", "hi_day", binWidth = 4)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_pts"),
        min("d").as("min_day"), max("d").as("max_day"))
      .orderBy("o_orderkey")
  }

  private val overlapOracle =
    """WITH a AS (
      |  SELECT o_orderkey AS a_key,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS a_lo,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 3 AS a_hi
      |  FROM orders WHERE o_orderkey < 60),
      |b AS (
      |  SELECT o_orderkey AS b_key,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS b_lo,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 5 AS b_hi
      |  FROM orders WHERE o_orderkey >= 60 AND o_orderkey < 160)
      |SELECT a.a_key AS a_key, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
      |  CAST(MIN(b.b_key) AS BIGINT) AS first_b
      |FROM a JOIN b ON a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Interval-OVERLAP join (both sides are ranges — the
    * genomics/temporal shape): binned equi-join with the
    * emit-once-from-the-overlap's-left-edge-bin rule, never a
    * nested-loop and never a dedup shuffle; the oracle is the plain
    * theta join. */
  val joinIntervalOverlap = dfQ("join_interval_overlap", overlapOracle,
    bench = false) { (s, _) =>
    def days(c: org.apache.spark.sql.Column) =
      datediff(c.cast("date"), lit("1970-01-01").cast("date")).cast("long")
    val a = s.table("orders").filter(col("o_orderkey") < 60)
      .select(col("o_orderkey").as("a_key"),
        days(col("o_orderdate")).as("a_lo"))
      .withColumn("a_hi", col("a_lo") + 3)
    val b = s.table("orders")
      .filter(col("o_orderkey") >= 60 && col("o_orderkey") < 160)
      .select(col("o_orderkey").as("b_key"),
        days(col("o_orderdate")).as("b_lo"))
      .withColumn("b_hi", col("b_lo") + 5)
    RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        binWidth = 4)
      .groupBy("a_key")
      .agg(count(lit(1)).as("n_overlaps"), min("b_key").as("first_b"))
      .orderBy("a_key")
  }

  // ---- deterministic sampling / splits --------------------------------

  /** Portable deterministic doc hash bucket ∈ [0, 10): md5 of the id's
    * decimal string, first 8 hex digits as an integer, mod 10. */
  private val sparkBucket =
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10"
  private val duckBucket =
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10"

  /** Deterministic 10% Bernoulli sample — same rows every run, every
    * engine, any partitioning (hash-of-key, not rand()). */
  val sampleHash = sqlQ2("sample_hash",
    s"SELECT doc_id, lang FROM documents WHERE $sparkBucket = 0 ORDER BY doc_id",
    s"SELECT doc_id, lang FROM documents WHERE $duckBucket = 0 ORDER BY doc_id")

  /** Deterministic 80/10/10 train/val/test split, counted per language —
    * the canonical dataset-split step of a training pipeline. */
  val sampleSplit = sqlQ2("sample_split",
    s"""SELECT lang, CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
       |  ELSE 'test' END AS split, COUNT(*) AS n
       |FROM (SELECT lang, $sparkBucket AS b FROM documents) t
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    s"""SELECT lang, CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
       |  ELSE 'test' END AS split, COUNT(*) AS n
       |FROM (SELECT lang, $duckBucket AS b FROM documents) t
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  private def stratifiedSql(castType: String): String =
    s"""WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS $castType)) AS hk
       |           FROM documents),
       |r AS (SELECT doc_id, lang,
       |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn,
       |        COUNT(*) OVER (PARTITION BY lang) AS n
       |      FROM h)
       |SELECT lang, doc_id FROM r WHERE rn * 10 <= n + 9
       |ORDER BY lang, doc_id""".stripMargin

  /** Stratified exact ceil(10%)-per-language sample: rank docs by a
    * deterministic hash inside each stratum, keep the top ceil(n/10)
    * (rn*10 <= n+9 ⇔ rn <= ceil(n/10), integer-exact in both engines). */
  val sampleStratified = sqlQ2("sample_stratified",
    stratifiedSql("STRING"), stratifiedSql("VARCHAR"))

  // ---- explode with ordinality / pivot / unpivot ----------------------

  /** posexplode (UNNEST WITH ORDINALITY): token stream with 0-based
    * position. */
  val fnExplode = sqlQ2("fn_explode",
    """SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok
      |FROM (SELECT doc_id, posexplode(split(lower(text), ' ')) AS (pos, tok)
      |      FROM documents WHERE doc_id < 5) t
      |ORDER BY doc_id, pos""".stripMargin,
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
      |           FROM documents WHERE doc_id < 5),
      |u AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM t)
      |SELECT doc_id, i - 1 AS pos, w[i] AS tok FROM u
      |ORDER BY doc_id, pos""".stripMargin)

  /** PIVOT: per-language character volume by source (4 pivoted columns).
    * Oracle replays it as conditional aggregation. */
  val aggPivot = sqlQ2("agg_pivot",
    """SELECT * FROM (SELECT lang, source, n_chars FROM documents
      |               WHERE source IN ('src0', 'src1', 'src2', 'src3'))
      |PIVOT (SUM(n_chars) FOR source IN
      |  ('src0' AS src0, 'src1' AS src1, 'src2' AS src2, 'src3' AS src3))
      |ORDER BY lang""".stripMargin,
    """SELECT lang,
      |  CAST(SUM(CASE WHEN source = 'src0' THEN n_chars END) AS BIGINT) AS src0,
      |  CAST(SUM(CASE WHEN source = 'src1' THEN n_chars END) AS BIGINT) AS src1,
      |  CAST(SUM(CASE WHEN source = 'src2' THEN n_chars END) AS BIGINT) AS src2,
      |  CAST(SUM(CASE WHEN source = 'src3' THEN n_chars END) AS BIGINT) AS src3
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)

  /** UNPIVOT: wide per-language stats back to (lang, metric, val) rows.
    * Oracle replays it as a UNION ALL. */
  val aggUnpivot = sqlQ2("agg_unpivot",
    """SELECT lang, metric, val FROM (
      |  SELECT lang, COUNT(*) AS n_docs,
      |         CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |  FROM documents GROUP BY lang)
      |UNPIVOT (val FOR metric IN (n_docs, total_chars))
      |ORDER BY lang, metric""".stripMargin,
    """WITH w AS (SELECT lang, COUNT(*) AS n_docs,
      |                  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |           FROM documents GROUP BY lang)
      |SELECT lang, 'n_docs' AS metric, n_docs AS val FROM w
      |UNION ALL
      |SELECT lang, 'total_chars', total_chars FROM w
      |ORDER BY lang, metric""".stripMargin)

  val all: Seq[Q] = Seq(
    joinAsof, joinAsofFwd, joinAsofTol, joinRange, joinIntervalOverlap,
    sampleHash, sampleSplit, sampleStratified,
    fnExplode, aggPivot, aggUnpivot)
}
