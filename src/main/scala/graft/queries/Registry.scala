package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One driver-checkable query: a Spark implementation plus (optionally) an
 * equivalent DuckDB oracle SQL over the same parquet tables (the driver's
 * correctness gate runs the oracle in DuckDB and hash-compares — see
 * BASELINE.md "t2 correctness").
 *
 * @param bench whether Bench should time this query at sf0.1 (DDL-ish or
 *              deliberately tiny demos are excluded).
 */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

/**
 * Shared query plumbing. Every query sees the testdata tables as temp
 * views (names mirror the reference's registered-table model,
 * reference: ballista/client/src/context.rs:53-62) and the graft function
 * parity layer.
 */
object Registry {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // Cache the LAST dir registered per session: registering 10 views per
  // query would re-read parquet footers hundreds of times per Verify/Bench
  // run. Temp views are session-global, so the key must be the session
  // alone — a per-(session, dir) key would skip re-registration when dirs
  // alternate and silently serve stale views. Weak keys: stopped sessions
  // must not be retained.
  private val preparedDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** `events.ts` as BIGINT microseconds since epoch — the ONE Spark-side
    * spelling of the testdata timestamp contract. The physical type has
    * moved between driver regenerations (TIMESTAMP(NANOS) through round
    * 10, TIMESTAMP_MICROS since round 11); it now reads as TIMESTAMP_NTZ,
    * and every session pins spark.sql.session.timeZone=UTC so the cast is
    * exact. DuckDB twin fragment: `epoch_us(ts)`. prepare() asserts the
    * contract loudly so the next testdata change fails here, not as six
    * scattered DATATYPE_MISMATCHes. */
  val EventsTsUs = "unix_micros(CAST(ts AS TIMESTAMP))"

  def prepare(spark: SparkSession, dir: String): SparkSession = {
    graft.functions.GraftFunctions.registerAll(spark)
    graft.GraftSession.enableAvroV2(spark)
    if (preparedDir.get(spark) != dir) {
      // Record the dir only AFTER every view registered: a partial failure
      // (one missing parquet) must not make the next prepare() skip
      // re-registration and serve a stale/partial view mix.
      try {
        tableNames.foreach { n =>
          val df = spark.read.parquet(s"$dir/$n.parquet")
          if (n == "events") {
            val t = df.schema("ts").dataType
            require(t.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType]
                || t.isInstanceOf[org.apache.spark.sql.types.TimestampType],
              s"testdata contract moved: events.ts reads as $t, expected a " +
                "timestamp type — update Registry.EventsTsUs and its " +
                "consumers (see CLAUDE.md round-12 notes)")
          }
          df.createOrReplaceTempView(n)
        }
        preparedDir.put(spark, dir)
      } catch {
        case e: Throwable => preparedDir.remove(spark); throw e
      }
    }
    spark
  }

  /** A query whose Spark SQL and DuckDB oracle SQL are the same text. */
  def sqlQ(name: String, sql: String, bench: Boolean = true): Q =
    Q(name, (s, dir) => prepare(s, dir).sql(sql), Some(sql), bench)

  /** Spark SQL and oracle SQL differ (dialect divergence). */
  def sqlQ2(name: String, sparkSql: String, oracleSql: String,
            bench: Boolean = true): Q =
    Q(name, (s, dir) => prepare(s, dir).sql(sparkSql), Some(oracleSql), bench)

  /** DataFrame-API implementation with a SQL oracle (or None → weak check). */
  def dfQ(name: String, oracleSql: String, bench: Boolean = true)(
      f: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => f(prepare(s, dir), dir), Option(oracleSql), bench)

  /** All queries, name-keyed. Later groups may not shadow earlier names. */
  lazy val all: Seq[Q] = {
    val groups =
      TpchQueries.all ++ OperatorQueries.all ++ FunctionQueries.all ++
        PipelineQueries.all ++ DdlQueries.all ++ H2oQueries.all ++
        AdvancedQueries.all ++ CurationQueries.all ++ IcebergQueries.all
    val dupes = groups.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    groups
  }
}
