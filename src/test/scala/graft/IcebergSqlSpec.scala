package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergFixture, IcebergIO, IcebergTableScan}

/**
 * SQL-surface Iceberg scan ([[IcebergTableScan]] + `IcebergScanRule`):
 * live metadata re-resolution per query, and `WHERE`-driven partition +
 * manifest-stats pruning PLAN-ASSERTED (fewer parquet files reach the
 * materialized relation under a selective predicate).
 */
class IcebergSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val root = s"/tmp/graft_icesql_${java.util.UUID.randomUUID().toString.take(8)}"

  private val st = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType, nullable = true)))
  private def rows(xs: (Long, String)*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*)), st)

  /** Parquet files of every materialized relation in the optimized plan —
    * the pruning observable: fewer files == manifest pruning worked. */
  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.toSeq
        case _                   => Seq.empty[String]
      }
    }.flatten

  test("SQL WHERE drives partition pruning: fewer files scanned") {
    val dir = s"$root/part"
    val w = new IcebergFixture.Writer(spark, dir, st, partitionCols = Seq("grp"))
    w.append(rows(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "a"))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_part")
    val full = spark.sql("SELECT * FROM ice_sql_part")
    assert(scannedFiles(full).size === 3) // one file per grp
    val pruned = spark.sql("SELECT * FROM ice_sql_part WHERE grp = 'b'")
    assert(scannedFiles(pruned).size === 1)
    assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("SQL WHERE drives manifest-stats pruning across append snapshots") {
    val dir = s"$root/stats"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a", 2L -> "a"))   // bounds id in [1,2]
    w.append(rows(10L -> "b", 11L -> "b")) // bounds id in [10,11]
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_stats")
    val pruned = spark.sql("SELECT id FROM ice_sql_stats WHERE id >= 10")
    assert(scannedFiles(pruned).size === 1)
    assert(pruned.collect().map(_.getLong(0)).sorted === Array(10L, 11L))
  }

  test("registered view is LIVE: a later append is visible without re-register") {
    val dir = s"$root/live"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a"))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_live")
    assert(spark.sql("SELECT count(*) FROM ice_sql_live").head().getLong(0) === 1L)
    w.append(rows(2L -> "b"))
    assert(spark.sql("SELECT count(*) FROM ice_sql_live").head().getLong(0) === 2L)
  }

  test("snapshotId pin stays pinned across later commits") {
    val dir = s"$root/pin"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a"))
    IcebergTableScan.dataFrame(spark, dir, snapshotId = Some(1L))
      .createOrReplaceTempView("ice_sql_pin")
    w.append(rows(2L -> "b"))
    assert(spark.sql("SELECT count(*) FROM ice_sql_pin").head().getLong(0) === 1L)
  }

  test("SQL surface over a table with EQUALITY deletes (broadcast sub-plan)") {
    // regression: the materialized sub-plan embeds broadcast(seqDf); an
    // ANALYZED splice left its ResolvedHint alive into physical planning
    // ("should have been replaced by join hint") — the rule must splice
    // the OPTIMIZED sub-plan
    val dir = s"$root/eqdel_sql"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a", 2L -> "b", 3L -> "a"))
    w.deleteEquality(rows(1L -> "a").select("id"), Seq(1))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_eqd")
    assert(spark.sql("SELECT id FROM ice_sql_eqd")
      .collect().map(_.getLong(0)).sorted === Array(2L, 3L))
    // WHERE over the delete-bearing table: pruning + merge-on-read
    assert(spark.sql("SELECT id FROM ice_sql_eqd WHERE grp = 'a'")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("SQL surface over a table with POSITION deletes") {
    val dir = s"$root/posdel_sql"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a", 2L -> "b", 3L -> "c"))
    w.deletePositions(w.dataFilePaths.head, Seq(0L))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_pd")
    assert(spark.sql("SELECT id FROM ice_sql_pd")
      .collect().map(_.getLong(0)).sorted === Array(2L, 3L))
    assert(spark.sql("SELECT count(*) FROM ice_sql_pd WHERE id >= 2")
      .head.getLong(0) === 2L)
  }

  test("metadata views honor a ref pin") {
    val dir = s"$root/metaref"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a"))
    w.tag("v1")
    w.append(rows(2L -> "b"))
    val g = GraftSession.wrap(spark)
    g.registerIceberg("ice_sql_mref", dir, ref = Some("v1"),
      metadataTables = true)
    // the data view serves the tag's snapshot...
    assert(spark.sql("SELECT count(*) FROM ice_sql_mref").head.getLong(0) === 1L)
    // ...and _files describes THAT snapshot, not the current one
    assert(spark.sql("SELECT count(*) FROM ice_sql_mref_files")
      .head.getLong(0) === 1L)
    Seq("ice_sql_mref", "ice_sql_mref_history", "ice_sql_mref_files",
      "ice_sql_mref_partitions", "ice_sql_mref_manifests",
      "ice_sql_mref_snapshots", "ice_sql_mref_refs")
      .foreach(spark.catalog.dropTempView(_))
  }

  test("row_lineage live view: ids stable across an out-of-band compact") {
    import graft.sources.IcebergWrite
    val dir = s"$root/rowlin"
    IcebergWrite.create(spark, dir, st, formatVersion = 3)
    IcebergWrite.append(rows((1L, "a"), (2L, "b"), (3L, "a")).coalesce(1), dir)
    val g = GraftSession.wrap(spark)
    g.registerIceberg("lin3", dir, metadataTables = true)
    def got(): Seq[(Long, Long, Long)] = g.sql(
        "SELECT id, _row_id, _last_updated_sequence_number " +
          "FROM lin3_row_lineage ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got() === Seq((1L, 0L, 1L), (2L, 1L, 1L), (3L, 2L, 1L)))
    // out-of-band maintenance: the LIVE view re-resolves and the
    // materialized lineage keeps every id/seq stable
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.compact(spark, dir)
    assert(got() === Seq((1L, 0L, 1L), (3L, 2L, 1L)))
    // predicates + aggregates compose over the view
    assert(g.sql("SELECT COUNT(*) FROM lin3_row_lineage WHERE _row_id >= 2")
      .head().getLong(0) === 1L)
    // v2 tables don't get the view (and the scan refuses if forced)
    val v2 = s"$root/rowlin2"
    IcebergWrite.create(spark, v2, st)
    g.registerIceberg("lin2", v2, metadataTables = true)
    assert(!spark.catalog.tableExists("lin2_row_lineage"))
    val e = intercept[IllegalArgumentException](
      IcebergTableScan.dataFrame(spark, v2, rowLineage = true))
    assert(e.getMessage.contains("format v3"), e.getMessage)
  }

  test("SQL DML over a v3 VARIANT table: UPDATE rewrites semi-structured rows") {
    import graft.sources.IcebergWrite
    val dir = s"$root/variant_dml"
    val df = spark.range(3).selectExpr("id",
      "parse_json(concat('{\"k\":', id, '}')) as v")
    IcebergWrite.create(spark, dir, df.schema, formatVersion = 3)
    IcebergWrite.append(df, dir)
    val g = GraftSession.wrap(spark)
    g.registerIceberg("vart", dir)
    // UPDATE assigns a fresh variant value built by parse_json; the
    // rewrite stages the VariantType column (lineage carried) and the
    // typed read sees the new payload
    g.sql("UPDATE vart SET v = parse_json('{\"k\":99}') WHERE id = 1")
    val got = g.sql(
        "SELECT id, variant_get(v, '$.k', 'long') FROM vart ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 0L), (1L, 99L), (2L, 2L)))
    g.sql("DELETE FROM vart WHERE id = 0")
    assert(g.sql("SELECT COUNT(*) FROM vart").head().getLong(0) === 2L)
    // identity survived the UPDATE rewrite
    val lin = graft.sources.IcebergIO.readWithRowId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    assert(lin === Map(1L -> 1L, 2L -> 2L))
  }

  test("row_lineage view: WHERE drives partition pruning like the data view") {
    import graft.sources.IcebergWrite
    val dir = s"$root/rowlin_prune"
    IcebergWrite.create(spark, dir, st, partitionCols = Seq("grp"),
      formatVersion = 3)
    IcebergWrite.append(rows((1L, "a"), (2L, "b"), (3L, "c")), dir)
    val g = GraftSession.wrap(spark)
    g.registerIceberg("linp", dir, metadataTables = true)
    val all = g.sql("SELECT id, _row_id FROM linp_row_lineage")
    val pruned = g.sql(
      "SELECT id, _row_id FROM linp_row_lineage WHERE grp = 'b'")
    assert(scannedFiles(all).size === 3)
    assert(scannedFiles(pruned).size === 1,
      "the lineage view must prune files from WHERE like the data view")
    // content exact; the id VALUE depends on per-partition file
    // assignment order, so pin the row and id-range only
    val p = pruned.collect()
    assert(p.map(_.getLong(0)).toSeq === Seq(2L))
    assert(p.head.getLong(1) >= 0L && p.head.getLong(1) <= 2L)
    // a lineage-column predicate derives nothing (sound skip) but
    // filters exactly
    val byId = g.sql(
      "SELECT id FROM linp_row_lineage WHERE _row_id >= 2")
    assert(byId.collect().map(_.getLong(0)).toSeq.sorted.length === 1)
  }

  test("snapshot pin + WHERE: pruning derives against the pinned snapshot") {
    val dir = s"$root/pinwhere"
    val w = new IcebergFixture.Writer(spark, dir, st, partitionCols = Seq("grp"))
    w.append(rows(1L -> "a", 2L -> "b"))
    w.append(rows(3L -> "b"))
    IcebergTableScan.dataFrame(spark, dir, snapshotId = Some(1L))
      .createOrReplaceTempView("ice_sql_pw")
    val got = spark.sql("SELECT id FROM ice_sql_pw WHERE grp = 'b'")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L)) // snapshot 2's id=3 must not appear
  }

  test("asOfTimestampMs registration reads the snapshot current at that time") {
    val dir = s"$root/asof"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a"))
    w.append(rows(2L -> "b"))
    val t1 = IcebergIO.loadMetadata(dir).snapshots
      .find(_.snapshotId == 1L).get.timestampMs
    val g = GraftSession.wrap(spark)
    g.registerIceberg("ice_sql_asof", dir, asOfTimestampMs = Some(t1))
    assert(spark.sql("SELECT max(id) FROM ice_sql_asof").head.getLong(0) === 1L)
    spark.catalog.dropTempView("ice_sql_asof")
  }

  test("pruning soundness through SQL: OR / NOT / IN match full-scan + filter") {
    val dir = s"$root/sound"
    // unpartitioned, two append snapshots (distinct stats bounds), null
    // included — the fixture's identity-partition records are
    // non-nullable, so null-bearing soundness runs on the stats path
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a", 2L -> "b", 3L -> "c"))
    w.append(rows(4L -> "a", 5L -> null))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_sound")
    val full = IcebergIO.read(spark, dir)
    val preds = Seq(
      "grp = 'a' OR id >= 5",
      "NOT (grp = 'a')",
      "grp IN ('a', 'b')",
      // > 10 elements: the optimizer rewrites to InSet — the converter
      // must still derive the in-list
      "id IN (1,2,3,4,5,6,7,8,9,10,11,12)",
      "grp IS NULL",
      "grp IS NOT NULL AND id < 3")
    preds.foreach { p =>
      val viaSql = spark.sql(s"SELECT id FROM ice_sql_sound WHERE $p")
        .collect().map(_.getLong(0)).sorted.toSeq
      val viaFull = full.filter(p).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(viaSql === viaFull, s"predicate: $p")
    }
  }

  test("self-join of the registered view resolves (MultiInstanceRelation)") {
    val dir = s"$root/selfjoin"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a", 2L -> "b"))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_sj")
    val n = spark.sql(
      """SELECT a.id FROM ice_sql_sj a JOIN ice_sql_sj b ON a.id = b.id""")
      .count()
    assert(n === 2L)
  }

  test("projection + filter + aggregate over the view") {
    val dir = s"$root/agg"
    val w = new IcebergFixture.Writer(spark, dir, st, partitionCols = Seq("grp"))
    w.append(rows(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "b", 5L -> "b"))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_agg")
    val got = spark.sql(
      """SELECT grp, sum(id) AS s FROM ice_sql_agg
        |WHERE grp = 'b' GROUP BY grp""".stripMargin).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "b")
    assert(got.head.getLong(1) === 11L)
  }

  test("column pruning reaches the materialized parquet scan") {
    val dir = s"$root/colprune"
    val w = new IcebergFixture.Writer(spark, dir, st)
    w.append(rows(1L -> "a", 2L -> "b"))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_cp")
    val df = spark.sql("SELECT id FROM ice_sql_cp WHERE id > 0")
    // the parquet relation must read ONLY id: the rule's alias Project
    // collapses through PhysicalOperation, so Catalyst's column pruning
    // lands on the scan like any plain parquet read
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.requiredSchema.fieldNames.toSeq === Seq("id"),
      s"scan read schema: ${scans.head.requiredSchema.simpleString}")
    assert(df.collect().map(_.getLong(0)).sorted === Array(1L, 2L))
  }

  test("join of the iceberg view with a parquet table prunes + broadcasts") {
    val dir = s"$root/joinshape"
    val w = new IcebergFixture.Writer(spark, dir, st, partitionCols = Seq("grp"))
    w.append(rows(1L -> "a", 2L -> "b", 3L -> "c"))
    IcebergTableScan.dataFrame(spark, dir).createOrReplaceTempView("ice_sql_j")
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(
        Row(1L, 10L), Row(2L, 20L), Row(3L, 30L))),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("w", LongType, nullable = false))))
      .createOrReplaceTempView("dim_w")
    val df = spark.sql(
      """SELECT i.id, d.w FROM ice_sql_j i JOIN dim_w d ON i.id = d.id
        |WHERE i.grp = 'b'""".stripMargin)
    // partition pruning still applies under the join ...
    assert(scannedFiles(df).size === 1)
    // ... and the result is exact
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((2L, 20L)))
  }

  test("readIcebergLive DataFrame filter prunes like the SQL surface") {
    val dir = s"$root/livedf"
    val w = new IcebergFixture.Writer(spark, dir, st, partitionCols = Seq("grp"))
    w.append(rows(1L -> "a", 2L -> "b", 3L -> "c"))
    val g = GraftSession.wrap(spark)
    val df = g.readIcebergLive(dir).filter(col("grp") === "b")
    assert(scannedFiles(df).size === 1)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("SQL time travel: VERSION AS OF id / 'tag', TIMESTAMP AS OF") {
    import graft.sources.IcebergWrite
    val dir = s"$root/timetravel"
    IcebergWrite.create(spark, dir, st)
    val s1 = IcebergWrite.append(rows(1L -> "a", 2L -> "b"), dir)
    IcebergWrite.createTag(dir, "v1tag", s1)
    IcebergWrite.append(rows(3L -> "c"), dir)
    val g = GraftSession.wrap(spark)
    g.registerIceberg("tt_sql", dir)
    def ids(q: String): Seq[Long] =
      g.sql(q).collect().map(_.getLong(0)).toSeq.sorted
    // live view sees everything; pins see snapshot 1
    assert(ids("SELECT id FROM tt_sql") === Seq(1L, 2L, 3L))
    assert(ids(s"SELECT id FROM tt_sql FOR VERSION AS OF $s1") === Seq(1L, 2L))
    assert(ids("SELECT id FROM tt_sql FOR VERSION AS OF 'v1tag'") === Seq(1L, 2L))
    assert(ids("SELECT id FROM tt_sql FOR SYSTEM_VERSION AS OF 'v1tag'") ===
      Seq(1L, 2L))
    assert(ids("SELECT id FROM tt_sql FOR TIMESTAMP AS OF '2100-01-01'") ===
      Seq(1L, 2L, 3L))
    // qualified refs: no alias -> re-aliased to the original name;
    // a user alias binds as written
    assert(ids(s"SELECT tt_sql.id FROM tt_sql FOR VERSION AS OF $s1 " +
      "WHERE tt_sql.grp = 'a'") === Seq(1L))
    assert(ids(s"SELECT x.id FROM tt_sql FOR VERSION AS OF $s1 AS x") ===
      Seq(1L, 2L))
    assert(ids(s"SELECT x.id FROM tt_sql FOR VERSION AS OF $s1 x") ===
      Seq(1L, 2L))
    // two pins of the same table in one statement resolve independently
    val both = g.sql(
      s"""SELECT (SELECT count(*) FROM tt_sql FOR VERSION AS OF $s1) AS a,
         |       (SELECT count(*) FROM tt_sql FOR TIMESTAMP AS OF '2100-01-01') AS b
         |""".stripMargin).collect().head
    assert((both.getLong(0), both.getLong(1)) === ((2L, 3L)))
    // pinned views are transient: analysis inlines them, then they drop
    assert(!spark.catalog.listTables().collect().exists(_.name.contains("__asof_")))
    // unregistered names pass through untouched (Spark's own error)
    intercept[Exception](g.sql("SELECT * FROM no_such FOR VERSION AS OF 1"))
    // a pinned registration refuses a second, conflicting pin
    g.registerIceberg("tt_sql_pin", dir, snapshotId = Some(s1))
    intercept[IllegalArgumentException](
      g.sql("SELECT id FROM tt_sql_pin FOR VERSION AS OF 1"))
  }

  test("SQL over a hive-imported table: injected column queries + prunes") {
    import graft.sources.IcebergWrite
    val dir = s"$root/hivesql"
    val src = s"$root/hivesql_src"
    rows(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "c")
      .write.partitionBy("grp").parquet(src) // files physically lack grp
    IcebergWrite.create(spark, dir, st,
      partitionCols = Seq("grp"), fieldIds = false)
    IcebergWrite.addFiles(spark, dir, src)
    val g = GraftSession.wrap(spark)
    g.registerIceberg("hive_sql", dir)
    // injected values answer through plain SQL
    val got = g.sql("SELECT id, grp FROM hive_sql ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "c"))
    // WHERE on the injected column drives partition pruning through the
    // SQL rule: fewer source files in the materialized plan
    val all = scannedFiles(g.sql("SELECT id FROM hive_sql")).size
    val sel = g.sql("SELECT id FROM hive_sql WHERE grp = 'a' ORDER BY id")
    assert(scannedFiles(sel).size < all,
      s"expected pruning below $all files")
    assert(sel.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // aggregate over the injected column
    assert(g.sql(
        "SELECT grp, count(*) c FROM hive_sql GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq("a" -> 2L, "b" -> 2L, "c" -> 1L))
    // SQL DML routes to the merge-on-read verbs THROUGH the injection:
    // a DELETE predicated on the injected column, a partition-MOVING
    // UPDATE of it, and a whole-row MERGE all work over imported files
    g.sql("DELETE FROM hive_sql WHERE grp = 'c'")
    g.sql("UPDATE hive_sql SET grp = 'b' WHERE id = 1")
    rows(4L -> "z", 6L -> "d").createOrReplaceTempView("hive_sql_upd")
    g.sql("MERGE INTO hive_sql t USING hive_sql_upd s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(g.sql("SELECT id, grp FROM hive_sql ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq(1L -> "b", 2L -> "a", 3L -> "b", 4L -> "z", 6L -> "d"))
  }

  test("SQL whole-row MERGE on v3 preserves _row_id (both MERGE spellings agree)") {
    import graft.sources.IcebergWrite
    val dir = s"$root/mergelin"
    IcebergWrite.create(spark, dir, st, formatVersion = 3)
    IcebergWrite.append(rows(1L -> "a", 2L -> "b", 3L -> "c"), dir)
    def ids() = IcebergIO.readWithRowId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    val before = ids()
    val g = GraftSession.wrap(spark)
    g.registerIceberg("mergelin_sql", dir)
    rows(2L -> "B", 4L -> "d").createOrReplaceTempView("mergelin_src")
    // the canonical whole-row pair — ANSI MERGE UPDATE is in-place, so
    // on v3 the fast path must keep matched ids like the conditional
    // clause path does
    g.sql("MERGE INTO mergelin_sql t USING mergelin_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val after = ids()
    assert(after.view.filterKeys(_ != 4L).toMap === before)
    assert(!before.values.toSet.contains(after(4L)))
    assert(g.sql("SELECT grp FROM mergelin_sql WHERE id = 2").collect()
      .head.getString(0) === "B")
    // NOT MATCHED BY SOURCE parses via the BY TARGET spelling too and
    // sweeps rows absent from the source
    rows(1L -> "a", 2L -> "B").createOrReplaceTempView("mergelin_sync")
    g.sql("MERGE INTO mergelin_sql t USING mergelin_sync s ON t.id = s.id " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    assert(ids().keySet === Set(1L, 2L))
  }

  test("SHOW TBLPROPERTIES serves a registered table's metadata properties") {
    val dir = s"$root/tblprops"
    graft.sources.IcebergWrite.create(spark, dir, st)
    graft.sources.IcebergWrite.append(rows(1L -> "a"), dir)
    val g = GraftSession.wrap(spark)
    g.registerIceberg("props_sql", dir)
    val props = g.sql("SHOW TBLPROPERTIES props_sql").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // the writer's field-id discipline stamp is a table property
    assert(props.get("graft.write.field-ids").contains("true"), props)
    // unregistered names fall through to Spark (which has no such view)
    intercept[Exception](g.sql("SHOW TBLPROPERTIES no_such_table").collect())
  }

  test("INSERT into an `unknown` column: NULL passes, non-null raises " +
      "instead of silently discarding") {
    val dir = s"$root/unknown_insert"
    graft.sources.IcebergWrite.create(spark, dir, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("u", NullType, nullable = true))), formatVersion = 3)
    val g = graft.GraftSession.wrap(spark)
    g.registerIceberg("unk_ins", dir)
    g.sql("INSERT INTO unk_ins VALUES (1, NULL)")
    assert(g.sql("SELECT id FROM unk_ins").collect().map(_.getLong(0))
      .toSeq === Seq(1L))
    // a non-null value in the unknown slot would vanish (the writer
    // omits the column physically) — the alignment guard raises instead
    val e = intercept[Exception](
      g.sql("INSERT INTO unk_ins VALUES (2, 'oops')"))
    assert(e.getMessage.contains("unknown") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown")),
      e.getMessage)
    // nothing landed from the failed insert
    assert(g.sql("SELECT count(*) FROM unk_ins").collect().head.getLong(0)
      === 1L)
  }
}
