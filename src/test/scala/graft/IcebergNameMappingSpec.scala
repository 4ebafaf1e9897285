package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergFixture, IcebergIO, IcebergWrite}

/** Name-mapping upgrade path ([[IcebergWrite.addNameMapping]], spec
  * "Name Mapping Serialization"): an EXTERNAL table whose files carry no
  * parquet field ids gets the `schema.name-mapping.default` property
  * (freezing the current (id -> name) assignment) and flips to by-id
  * resolution — pre-upgrade files resolve through the frozen mapping,
  * post-upgrade files through stamped ids, and renameColumn unlocks.
  * The id-less fixture [[IcebergFixture.Writer]] plays the external
  * writer. */
class IcebergNameMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val root =
    s"/tmp/graft_iceberg_nm_${java.util.UUID.randomUUID().toString.take(8)}"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def df(rows: (Long, String, Double)*) = {
    val list = new java.util.ArrayList[Row]()
    rows.foreach(r => list.add(Row(r._1, r._2, r._3)))
    spark.createDataFrame(list, schema)
  }

  test("upgrade -> rename: pre-upgrade files resolve through the mapping") {
    val dir = s"$root/basic"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    // a property-less external table refuses rename outright
    intercept[IllegalArgumentException](
      IcebergWrite.renameColumn(dir, "name", "label"))
    IcebergWrite.addNameMapping(dir)
    // idempotent re-upgrade is refused (the table now resolves by id)
    intercept[IllegalArgumentException](IcebergWrite.addNameMapping(dir))
    IcebergWrite.renameColumn(dir, "name", "label")
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(IcebergIO.read(spark, dir).schema.fieldNames.toSeq
      === Seq("id", "label", "score"))
    assert(got === Seq((1L, "a", 1.0), (2L, "b", 2.0)),
      "pre-upgrade bytes must resolve under the renamed column, not null out")
    // post-rename append through the graft writer (id-stamped, new name)
    IcebergWrite.append(
      df((3L, "c", 3.0)).withColumnRenamed("name", "label"), dir)
    val all = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(all === Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }

  test("legacy bytes never resurrect into post-upgrade columns") {
    val dir = s"$root/resurrect"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0)))
    IcebergWrite.addNameMapping(dir)
    IcebergWrite.renameColumn(dir, "name", "label")
    // a FRESH column reusing the legacy file's literal column name: the
    // old bytes belong to field id 2 (now 'label'), so the new field
    // must surface NULL from legacy files — by-id semantics; a
    // name-based read would silently resurrect the old strings
    IcebergWrite.addColumn(dir, "name", StringType)
    val r = IcebergIO.read(spark, dir).orderBy("id").collect().head
    assert(r.getString(r.fieldIndex("label")) === "a")
    assert(r.isNullAt(r.fieldIndex("name")),
      "legacy 'name' bytes leaked into the post-upgrade column")
  }

  test("pre- and post-upgrade equality deletes both resolve") {
    val dir = s"$root/eqdel"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    // pre-upgrade delete: id-less delete file keyed on field 2 ('name')
    w.deleteEquality(df((2L, "b", 2.0)).select("name"), fieldIds = Seq(2))
    IcebergWrite.addNameMapping(dir)
    IcebergWrite.renameColumn(dir, "name", "label")
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L),
      "pre-upgrade equality delete must keep applying through the mapping")
    // post-upgrade delete keyed on the NEW name (id-stamped delete file)
    // removes a LEGACY row — the anti-join spans both branches
    IcebergWrite.deleteEquality(
      df((3L, "c", 3.0)).select(col("name").as("label")), dir)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 4L))
  }

  test("deleteWhere and updateWhere span legacy and stamped branches") {
    val dir = s"$root/dml"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    IcebergWrite.addNameMapping(dir)
    IcebergWrite.append(df((3L, "c", 3.0), (4L, "d", 4.0)), dir)
    // position delete hits one legacy row and one stamped row
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L || col("id") === 4L)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // update touches both branches; the rewritten rows are id-stamped
    IcebergWrite.updateWhere(spark, dir, lit(true),
      Map("score" -> (col("score") + 100.0)))
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 101.0), (3L, 103.0)))
  }

  test("compact retires the legacy branch") {
    val dir = s"$root/compact"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    IcebergWrite.addNameMapping(dir)
    IcebergWrite.renameColumn(dir, "name", "label")
    IcebergWrite.compact(spark, dir)
    // every live file now postdates the upgrade seq -> stamped branch only
    val meta = IcebergIO.loadMetadata(dir)
    val ms = meta.properties(IcebergIO.NameMappingSeqProp).toLong
    val minSeq = IcebergIO.files(spark, dir)
      .agg(org.apache.spark.sql.functions.min("sequence_number"))
      .collect().head.getLong(0)
    assert(minSeq > ms,
      "compact must rewrite legacy files at a fresh sequence number")
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "a", 1.0), (2L, "b", 2.0)))
  }

  test("v1 tables are refused (no sequence numbers to split on)") {
    val dir = s"$root/v1"
    val w = new IcebergFixture.Writer(spark, dir, schema, formatVersion = 1)
    w.append(df((1L, "a", 1.0)))
    intercept[IllegalArgumentException](IcebergWrite.addNameMapping(dir))
  }
}
