package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergFixture, IcebergIO, IcebergWrite}

/** v3 column default values ([[IcebergWrite.addColumnWithDefault]], spec
  * "Default values"): `initial-default` is served for every data file
  * whose sequence number predates the add (a per-file constant — no
  * footer probing, no rewrite), `write-default` fills appends that omit
  * the column, and the whole DML surface (equality deletes, updates,
  * compaction) composes with the injected values. */
class IcebergDefaultsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val root =
    s"/tmp/graft_iceberg_def_${java.util.UUID.randomUUID().toString.take(8)}"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def df(rows: (Long, String, Double)*) = {
    val list = new java.util.ArrayList[Row]()
    rows.foreach(r => list.add(Row(r._1, r._2, r._3)))
    spark.createDataFrame(list, schema)
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
    d.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def tierById(dir: String): Map[Long, Any] =
    IcebergIO.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getInt(3)))
      .toMap

  test("initial + write defaults; explicit null stays null; DML composes") {
    val dir = s"$root/basic"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType,
      default = 5, writeDefault = Some(9))

    // pre-add rows read initial-default, schema surfaces the column
    val r1 = IcebergIO.read(spark, dir)
    assert(r1.schema.fieldNames.toSeq === Seq("id", "name", "score", "tier"))
    assert(r1.schema("tier").nullable, "injected default must stay nullable")
    assert(tierById(dir) === Map(1L -> 5, 2L -> 5))

    // explicit post-add append, including an explicit NULL — null stays
    val s4 = StructType(schema.fields :+
      StructField("tier", IntegerType, nullable = true))
    val l = new java.util.ArrayList[Row]()
    l.add(Row(3L, "c", 3.0, Integer.valueOf(30)))
    l.add(Row(4L, "d", 4.0, null))
    IcebergWrite.append(spark.createDataFrame(l, s4), dir)
    // omitting append -> the writer fills write-default
    IcebergWrite.append(df((5L, "e", 5.0)), dir)
    assert(tierById(dir) ===
      Map(1L -> 5, 2L -> 5, 3L -> 30, 4L -> null, 5L -> 9))

    // a filter on the defaulted value selects injected rows
    assert(ids(IcebergIO.readWhere(spark, dir, col("tier") === 5)) ===
      Seq(1L, 2L))

    // equality delete keyed on the defaulted value hits pre-add rows
    import spark.implicits._
    IcebergWrite.deleteEquality(Seq(5).toDF("tier"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(3L, 4L, 5L))

    // updateWhere over a defaulted table (rows rewrite physically)
    IcebergWrite.updateWhere(spark, dir, col("id") === 5L,
      Map("tier" -> lit(77)))
    assert(tierById(dir) === Map(3L -> 30, 4L -> null, 5L -> 77))

    // compact materializes the (already physical) values; content stable
    IcebergWrite.compact(spark, dir)
    assert(tierById(dir) === Map(3L -> 30, 4L -> null, 5L -> 77))
  }

  test("guards: v2, name-resolution tables, null default, existing name") {
    val v2 = s"$root/v2"
    IcebergWrite.create(spark, v2, schema) // formatVersion = 2
    IcebergWrite.append(df((1L, "a", 1.0)), v2)
    val e1 = intercept[IllegalArgumentException](
      IcebergWrite.addColumnWithDefault(v2, "tier", IntegerType, 5))
    assert(e1.getMessage.contains("format v3"), e1.getMessage)

    val nameRes = s"$root/nameres"
    IcebergWrite.create(spark, nameRes, schema, formatVersion = 3,
      fieldIds = false)
    val e2 = intercept[IllegalArgumentException](
      IcebergWrite.addColumnWithDefault(nameRes, "tier", IntegerType, 5))
    assert(e2.getMessage.contains("field-id table"), e2.getMessage)

    val v3 = s"$root/guards3"
    IcebergWrite.create(spark, v3, schema, formatVersion = 3)
    intercept[IllegalArgumentException](
      IcebergWrite.addColumnWithDefault(v3, "tier", IntegerType, null))
    intercept[IllegalArgumentException](
      IcebergWrite.addColumnWithDefault(v3, "name", StringType, "x"))
    // type/value mismatch fails at serialization time, not at read time
    intercept[IllegalArgumentException](
      IcebergWrite.addColumnWithDefault(v3, "tier", IntegerType, "seven"))
  }

  test("SQL: ALTER TABLE ... ADD COLUMN ... DEFAULT routes to the writer") {
    val dir = s"$root/sql"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    val g = GraftSession.wrap(spark)
    g.registerIceberg("def_sql", dir)
    g.sql("ALTER TABLE def_sql ADD COLUMN tier INT DEFAULT 5")
    assert(tierById(dir) === Map(1L -> 5, 2L -> 5))
    // the re-registered live view surfaces the evolved schema + default
    assert(g.sql("SELECT id, tier FROM def_sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 5), (2L, 5)))
    // a DEFAULT-less add stays the plain (NULL-filled) addColumn
    g.sql("ALTER TABLE def_sql ADD COLUMN note STRING")
    assert(g.sql("SELECT note FROM def_sql").collect().forall(_.isNullAt(0)))
    // string default containing the word DEFAULT splits at the keyword
    g.sql("ALTER TABLE def_sql ADD COLUMN memo STRING DEFAULT 'the DEFAULT memo'")
    assert(g.sql("SELECT memo FROM def_sql").collect()
      .forall(_.getString(0) == "the DEFAULT memo"))
    // a NULL-evaluating default is refused loudly
    val e = intercept[IllegalArgumentException](
      g.sql("ALTER TABLE def_sql ADD COLUMN bad INT DEFAULT NULL"))
    assert(e.getMessage.contains("evaluated to NULL"), e.getMessage)
  }

  test("date-typed default round-trips through the spec's ISO form") {
    val dir = s"$root/date"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val d0 = java.time.LocalDate.of(2020, 6, 15)
    IcebergWrite.addColumnWithDefault(dir, "since", DateType, d0)
    val got = IcebergIO.read(spark, dir).select("since").collect().head
    assert(got.getDate(0).toLocalDate === d0)
    // write-default fill on an omitting append
    IcebergWrite.append(df((2L, "b", 2.0)), dir)
    val both = IcebergIO.read(spark, dir).select("since").collect()
    assert(both.forall(_.getDate(0).toLocalDate == d0))
  }

  test("legacy name-mapped files serve the default (not NULL)") {
    val dir = s"$root/legacy"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0))) // id-less external file
    IcebergWrite.addNameMapping(dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType, 5)
    // the legacy file resolves through the frozen mapping; the defaulted
    // field is absent from the mapping — it must read the default, not
    // the legacy branch's usual NULL fill
    assert(tierById(dir) === Map(1L -> 5))
    IcebergWrite.append(df((2L, "b", 2.0)), dir) // write-default, stamped
    assert(tierById(dir) === Map(1L -> 5, 2L -> 5))
  }

  test("widenColumn on a defaulted column: int default reads as long") {
    val dir = s"$root/widen"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType,
      default = 5, writeDefault = Some(9))
    IcebergWrite.widenColumn(dir, "tier", LongType)
    // the stored int JSON default re-parses through the widened type
    val r = IcebergIO.read(spark, dir)
    assert(r.schema("tier").dataType === LongType)
    assert(r.select("tier").collect().map(_.getLong(0)).toSeq === Seq(5L))
    // write-default fill also lands as the widened type
    IcebergWrite.append(df((2L, "b", 2.0)), dir)
    assert(IcebergIO.read(spark, dir).select("id", "tier").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq ===
      Seq((1L, 5L), (2L, 9L)))
  }

  test("cherry-pick refuses re-sequencing files past a defaulted column") {
    val dir = s"$root/pick"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.createBranch(dir, "dev", s1)
    // branch append predates the column (its files lack it physically)
    IcebergWrite.append(df((2L, "b", 2.0)), dir, branch = Some("dev"))
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType, 5)
    val devHead = IcebergIO.loadMetadata(dir).refs("dev")
    val e = intercept[IllegalArgumentException](
      IcebergWrite.cherrypickSnapshot(spark, dir, devHead))
    assert(e.getMessage.contains("re-sequence"), e.getMessage)
  }

  test("a foreign defaulted table without seq bookkeeping is refused") {
    val dir = s"$root/foreign"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType, 5)
    // simulate a foreign writer: strip the graft seq property from the
    // current metadata json (and its local-FS .crc sidecar)
    val mdFile = IcebergIO.resolveMetadataFile(dir)
    val p = java.nio.file.Paths.get(mdFile.stripPrefix("file:"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.readTree(java.nio.file.Files.readString(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val props = rootNode.get("properties")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val seqKeys = {
      val it = props.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) { val k = it.next(); if (k.startsWith("graft.default.seq.")) b += k }
      b.result()
    }
    assert(seqKeys.nonEmpty)
    seqKeys.foreach(props.remove)
    java.nio.file.Files.writeString(p, mapper.writeValueAsString(rootNode))
    val crc = p.getParent.resolve("." + p.getFileName.toString + ".crc")
    java.nio.file.Files.deleteIfExists(crc)
    val e = intercept[IllegalStateException](IcebergIO.loadMetadata(dir))
    assert(e.getMessage.contains("another engine"), e.getMessage)
  }

  test("CDC changelog over a defaulted table: injected values ride change rows") {
    val dir = s"$root/cdc"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType,
      default = 5, writeDefault = Some(9))
    IcebergWrite.append(df((3L, "c", 3.0)), dir)  // write-default 9
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L) // pre-add row
    val ch = IcebergIO.readChangelog(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(4),
        if (r.isNullAt(3)) -1 else r.getInt(3))).sorted.toSeq
    // snapshot-1 inserts read the injected initial-default; the omitted
    // append's insert reads write-default; the DELETE row of a PRE-ADD
    // file carries the injected default too (the before/after diff
    // routes through the same injecting read)
    assert(ch === Seq((1L, "delete", 5), (1L, "insert", 5),
      (2L, "insert", 5), (3L, "insert", 9)))
  }

  test("snapshot stream over a defaulted table: pre-add batches inject") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = s"$root/stream"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType,
      default = 5, writeDefault = Some(9))
    // stream starts AFTER the evolution — replays snapshot 1 (pre-add
    // file: initial-default injected) then the live append (writer-
    // filled write-default)
    val stream = graft.streaming.StreamingOps.icebergSnapshotStream(spark, dir)
    val q = stream.writeStream.format("memory").queryName("def_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      IcebergWrite.append(df((2L, "b", 2.0)), dir)
      q.processAllAvailable()
      val got = spark.table("def_stream").collect()
        .map(r => r.getLong(0) -> r.getInt(3)).sorted.toSeq
      assert(got === Seq(1L -> 5, 2L -> 9))
    } finally q.stop()
  }

  test("an omitting append with an unknown column is refused, not filled") {
    val dir = s"$root/extras"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType,
      default = 5, writeDefault = Some(9))
    // omits `tier` AND misspells `name` as `nmae` — the defaults fill
    // must NOT silently drop the unknown column; requireTableSchema's
    // loud mismatch fires instead
    val bad = df((2L, "b", 2.0)).withColumnRenamed("name", "nmae")
    val e = intercept[IllegalArgumentException](IcebergWrite.append(bad, dir))
    assert(e.getMessage.contains("nmae"), e.getMessage)
    assert(tierById(dir) === Map(1L -> 5)) // nothing committed
  }

  test("pruning stays sound: pre-add files have no bounds and are kept") {
    val dir = s"$root/prune"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.addColumnWithDefault(dir, "tier", IntegerType, 5)
    val s4 = StructType(schema.fields :+
      StructField("tier", IntegerType, nullable = true))
    val l = new java.util.ArrayList[Row]()
    l.add(Row(3L, "c", 3.0, Integer.valueOf(30)))
    IcebergWrite.append(spark.createDataFrame(l, s4), dir)
    // a range predicate that excludes the post-add file's bounds but
    // matches the injected default — pre-add files carry no tier bounds,
    // so stats pruning must keep them
    assert(ids(IcebergIO.readWhere(spark, dir, col("tier") < 10)) ===
      Seq(1L, 2L))
    assert(ids(IcebergIO.readWhere(spark, dir, col("tier") > 10)) === Seq(3L))
  }
}
