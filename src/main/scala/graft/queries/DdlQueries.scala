package graft.queries

import Registry._
import graft.GraftSession

/**
 * DDL / catalog lifecycle demonstrations (reference:
 * ballista/client/src/context.rs:416-484 CREATE EXTERNAL TABLE handling,
 * context.rs:342-393 SHOW gating): an external CSV table is created from
 * reference-dialect DDL via [[graft.ExternalTableDdl]] and read back, an
 * external parquet table likewise, and SHOW TABLES / EXPLAIN run as
 * rows-only checks (no DuckDB-expressible oracle).
 */
object DdlQueries {

  /** Per-JVM scratch-path tag: two concurrent sessions (driver verify +
    * a local bench) must not race on a shared literal /tmp path. */
  private val tag: String = java.util.UUID.randomUUID().toString.take(8)

  /** Set a conf for the duration of `f`, restoring the prior value (or
    * unsetting) after — session state must not leak across queries. */
  private def withConf[T](s: org.apache.spark.sql.SparkSession,
                          k: String, v: String)(f: => T): T = {
    val prev = s.conf.getOption(k)
    s.conf.set(k, v)
    try f finally prev match {
      case Some(p) => s.conf.set(k, p)
      case None    => s.conf.unset(k)
    }
  }

  /** Reference-dialect CREATE EXTERNAL TABLE → CSV read-back, checked
    * against the same rows from the parquet oracle. The CSV is produced
    * from the registered `region` table first, so the content matches. */
  val ddlExternalCsv = dfQ("ddl_external_csv",
    """SELECT r_regionkey AS r_regionkey, r_name AS r_name
      |FROM region ORDER BY r_regionkey""".stripMargin,
    bench = false) { (s, _) =>
    val g = GraftSession.wrap(s)
    val dir = s"/tmp/graft_ext_region_csv_$tag"
    s.table("region").coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(dir)
    g.sql("DROP TABLE IF EXISTS ext_region")
    g.sql(s"CREATE EXTERNAL TABLE ext_region (r_regionkey INT, r_name STRING) " +
      s"STORED AS CSV WITH HEADER ROW LOCATION '$dir'")
    g.sql("""SELECT r_regionkey AS r_regionkey, r_name AS r_name
            |FROM ext_region ORDER BY r_regionkey""".stripMargin)
  }

  val ddlExternalParquet = dfQ("ddl_external_parquet",
    """SELECT n_nationkey AS n_nationkey, n_name AS n_name
      |FROM nation ORDER BY n_nationkey""".stripMargin,
    bench = false) { (s, dir) =>
    val g = GraftSession.wrap(s)
    g.sql("DROP TABLE IF EXISTS ext_nation")
    g.sql(s"CREATE EXTERNAL TABLE ext_nation STORED AS PARQUET " +
      s"LOCATION '$dir/nation.parquet'")
    g.sql("""SELECT n_nationkey AS n_nationkey, n_name AS n_name
            |FROM ext_nation ORDER BY n_nationkey""".stripMargin)
  }

  /** SHOW TABLES through the information-schema gate (enabled), pinned to
    * the registry table list (reference SHOW gating:
    * ballista/client/src/context.rs:342-371). Restricting to the known
    * registry views keeps the result independent of which other queries
    * (external-table DDL) ran first in the same session; the oracle is the
    * literal expected list. */
  val ddlShowTables = dfQ("ddl_show_tables",
    """SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),
      |  ('events'),('lineitem'),('nation'),('orders'),('part'),('region'),
      |  ('supplier')) t(table_name) ORDER BY table_name""".stripMargin,
    bench = false) { (s, _) =>
    import org.apache.spark.sql.functions.col
    withConf(s, GraftSession.InformationSchemaKey, "true") {
      val g = GraftSession.wrap(s)
      g.sql("SHOW TABLES").select(col("tableName").as("table_name"))
        .filter(col("table_name").isin(Registry.tableNames: _*))
        .orderBy("table_name")
    }
  }

  /** EXPLAIN surface (reference: datafusion.proto:981) — projected to a
    * deterministic signature: the plan text exists, contains the hash
    * aggregate, and reaches the lineitem scan. */
  val ddlExplain = dfQ("ddl_explain",
    "SELECT TRUE AS has_plan, TRUE AS has_agg, TRUE AS has_scan",
    bench = false) { (s, _) =>
    s.sql("EXPLAIN SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY l_returnflag")
      .selectExpr(
        "length(plan) > 0 AS has_plan",
        "plan LIKE '%HashAggregate%' AS has_agg",
        "plan LIKE '%lineitem%' AS has_scan")
  }

  /** EXPLAIN ANALYZE with REAL execution metrics
    * (GraftSession.explainAnalyze runs the plan and harvests per-operator
    * SQL metrics): the parquet scan's numOutputRows must equal the true
    * table row count, which the oracle computes independently — pins that
    * the metrics are genuinely collected from execution, not echoed from
    * the plan. (The aggregate nodes' metrics are AQE-stage-instance
    * dependent and not stable enough to hash-pin.) */
  val ddlExplainAnalyze = dfQ("ddl_explain_analyze",
    "SELECT CAST(COUNT(*) AS BIGINT) AS scan_rows FROM lineitem",
    bench = false) { (s, _) =>
    import org.apache.spark.sql.functions._
    GraftSession.wrap(s)
      .explainAnalyze(
        "SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY l_returnflag")
      .filter(col("operator").startsWith("Scan") &&
        col("metric") === "numOutputRows")
      .agg(max(col("value")).cast("bigint").as("scan_rows"))
  }

  /** Hive-style partitioned write + partition-pruned read-back: the
    * storage layout a 100 TB corpus ships with (per-language directories;
    * a lang-filtered scan touches only that partition's files —
    * plan-asserted in ScaleSpec). The oracle recomputes the same rows
    * from the unpartitioned source. */
  val ddlPartitioned = dfQ("ddl_partitioned",
    """SELECT doc_id, lang FROM documents WHERE lang = 'en' ORDER BY doc_id""",
    bench = false) { (s, _) =>
    import org.apache.spark.sql.functions.col
    val dir = s"/tmp/graft_part_docs_$tag"
    s.table("documents").write.mode("overwrite").partitionBy("lang").parquet(dir)
    s.read.parquet(dir).filter(col("lang") === "en")
      .select(col("doc_id"), col("lang")).orderBy("doc_id")
  }

  /** SHOW COLUMNS (reference information-schema surface,
    * ballista/client/src/context.rs:342-371), pinned to the literal
    * expected column list. */
  val ddlShowColumns = dfQ("ddl_show_columns",
    """SELECT * FROM (VALUES ('r_regionkey'), ('r_name')) t(col_name)
      |ORDER BY col_name""".stripMargin,
    bench = false) { (s, _) =>
    import org.apache.spark.sql.functions.col
    withConf(s, GraftSession.InformationSchemaKey, "true") {
      GraftSession.wrap(s).sql("SHOW COLUMNS FROM region")
        .select(col("col_name")).orderBy("col_name")
    }
  }

  /** Avro round-trip through the EXECUTABLE Avro path
    * ([[graft.sources.AvroIO]] on the Avro core library — reference
    * `read_avro`/`register_avro`, ballista/client/src/context.rs:227-234):
    * `region` is written as a real Avro object container file and read
    * back; the oracle recomputes the same rows from the parquet source
    * (DuckDB's avro extension is not installable offline). */
  /** NDJSON write/read round-trip through the session façade (reference
    * `read_json`, client/src/context.rs:217-224) — the same source-twin
    * oracle shape as `avro_read`: the oracle reads the original table,
    * so a value mangled by either JSON direction hash-mismatches. */
  val ddlNdjsonRead = dfQ("ndjson_read",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin,
    bench = false) { (s, _) =>
    val dir = s"/tmp/graft_ndjson_nation_$tag"
    val g = GraftSession.wrap(s)
    g.writeJson(s.table("nation")
      .select("n_nationkey", "n_name", "n_regionkey"), dir)
    g.readJson(dir)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  val ddlAvroRead = dfQ("avro_read",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin,
    bench = false) { (s, _) =>
    val dir = s"/tmp/graft_avro_nation_$tag"
    val g = GraftSession.wrap(s)
    g.writeAvro(s.table("nation"), dir)
    g.readAvro(dir)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  /** Bench-grain Avro scan: `orders` written ONCE per JVM per scale dir
    * as snappy Avro containers, then read back through the V2 connector
    * and forced through an exact aggregate — regression-protects the
    * Avro decode path (container split planning + per-record decode +
    * pruned conversion) at realistic row counts, which the 25-row
    * correctness fixtures cannot. */
  private val avroBenchDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val avroBenchScan = dfQ("avro_bench_scan",
    """SELECT COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
      |       COUNT(DISTINCT o_custkey) AS ncust
      |FROM orders""".stripMargin) { (s, sfDir) =>
    import org.apache.spark.sql.functions._
    val dir = avroBenchDirs.computeIfAbsent(sfDir, { _ =>
      val d = s"/tmp/graft_avro_bench_${tag}_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.AvroIO.write(
        s.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_custkey", "o_totalprice"), d)
      d
    })
    val g = GraftSession.wrap(s) // routes the avro short name through V2
    g.readAvro(dir).agg(
      count(lit(1)).as("n"),
      sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("total"),
      countDistinct(col("o_custkey")).as("ncust"))
  }

  /** Reference-dialect `CREATE EXTERNAL TABLE … STORED AS AVRO`
    * (reference: ballista/client/src/context.rs:416-484), translated to
    * `USING avro` and served by the V2 connector
    * ([[graft.sources.AvroDataSourceV2]]) as a real catalog table. */
  val ddlExternalAvro = dfQ("ddl_external_avro",
    """SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""",
    bench = false) { (s, _) =>
    val dir = s"/tmp/graft_extavro_nation_$tag"
    val g = GraftSession.wrap(s)
    g.writeAvro(s.table("nation"), dir)
    g.sql("DROP TABLE IF EXISTS ext_avro_nation")
    g.sql(s"CREATE EXTERNAL TABLE ext_avro_nation STORED AS AVRO LOCATION '$dir'")
    g.sql("""SELECT n_nationkey, n_name FROM ext_avro_nation
            |ORDER BY n_nationkey""".stripMargin)
  }

  /** `STORED AS ICEBERG` DDL: create the table with the native writer,
    * register it through the reference-dialect CREATE EXTERNAL TABLE
    * (live rule-based scan view), and query it with plain SQL — pruning
    * and all (the view shares readWhere's derivation). The oracle
    * recomputes from the parquet source. */
  val ddlExternalIceberg = dfQ("ddl_external_iceberg",
    """SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n
      |FROM nation WHERE n_nationkey >= 10
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    bench = false) { (s, _) =>
    val dir = s"/tmp/graft_exticeberg_nation_$tag"
    val g = GraftSession.wrap(s)
    graft.sources.IcebergFixture.deleteRecursively(dir)
    val src = s.table("nation").select("n_nationkey", "n_name", "n_regionkey")
    graft.sources.IcebergWrite.create(s, dir, src.schema)
    graft.sources.IcebergWrite.append(src, dir)
    g.sql("DROP VIEW IF EXISTS ext_ice_nation")
    g.sql(s"CREATE EXTERNAL TABLE ext_ice_nation STORED AS ICEBERG LOCATION '$dir'")
    g.sql("""SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n
            |FROM ext_ice_nation WHERE n_nationkey >= 10
            |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  /** Partitioned Avro corpus: hive-layout dynamic-partition write in ONE
    * distributed job (`AvroIO.writePartitioned` — single shuffle on the
    * partition column, no driver-side value enumeration), then a
    * partition-filtered read-back through the V2 source — the filter
    * prunes whole files at planning time (asserted in AvroIOSpec); the
    * oracle recomputes the same rows from the unpartitioned parquet. */
  val ddlAvroPartitioned = dfQ("avro_partitioned",
    """SELECT doc_id, n_chars, lang FROM documents WHERE lang = 'en'
      |ORDER BY doc_id""".stripMargin,
    bench = false) { (s, _) =>
    import org.apache.spark.sql.functions.col
    val root = s"/tmp/graft_avro_part_$tag"
    val g = GraftSession.wrap(s)
    graft.sources.AvroIO.writePartitioned(
      s.table("documents").select("doc_id", "n_chars", "lang"), root, "lang")
    g.readAvro(root)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(ddlExternalCsv, ddlExternalParquet, ddlShowTables,
    ddlExplain, ddlExplainAnalyze, ddlPartitioned, ddlShowColumns,
    ddlNdjsonRead, ddlAvroRead, ddlExternalAvro, ddlExternalIceberg,
    ddlAvroPartitioned, avroBenchScan)
}
