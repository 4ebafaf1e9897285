package graft

import java.io.File

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroIO, IcebergFixture, IcebergIO}

/**
 * Proof that the two in-repo sources resolve every open/list/create
 * through the Hadoop FileSystem scheme registry (reference analog: the
 * per-URI object-store registry, ballista/core/src/object_store_registry/
 * mod.rs:26-90) — by running full read/write round-trips over the
 * NON-default `grafttest://` scheme ([[GraftTestFileSystem]]) and over
 * explicit `file://` URIs. A surviving `java.io.File(path)` on any of
 * these paths would throw on the scheme-qualified URI.
 */
class ObjectStoreFsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftTestFileSystem.register(s)
    GraftSession.wrap(s) // route the avro short name through the V2 connector
    s
  }
  private val root = s"/tmp/graft_fs_spec_${java.util.UUID.randomUUID().toString.take(8)}"
  new File(root).mkdirs()

  private def gt(p: String): String = GraftTestFileSystem.uri(p)

  private val st = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))
  private def df = spark.createDataFrame(
    new java.util.ArrayList[Row](java.util.List.of(
      Row(1L, "a"), Row(2L, "b"), Row(3L, null))), st)

  test("createNew is atomic over the grafttest:// scheme") {
    spark // force scheme registration
    val dir = s"$root/createnew_race"
    new File(dir).mkdirs()
    val p = gt(s"$dir/v2.metadata.json")
    val out = graft.sources.GraftFs.createNew(p)
    out.write("{}".getBytes("UTF-8")); out.close()
    // the loser of a publish race must throw, never silently clobber —
    // the O_EXCL primitive applies to RawLocalFileSystem subclasses,
    // which is what the custom scheme maps to
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](
      graft.sources.GraftFs.createNew(p))
    // the winner's bytes survive
    assert(graft.sources.GraftFs.readUtf8(p) === "{}")
  }

  test("AvroIO write + read round-trip over the grafttest:// scheme") {
    val path = gt(s"$root/avro_rt")
    AvroIO.write(df, path)
    // files landed on local disk (the scheme maps there)...
    assert(new File(s"$root/avro_rt").listFiles().exists(_.getName.endsWith(".avro")))
    // ...and read back through the scheme, bit-equal
    val back = AvroIO.read(spark, path)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("Avro V2 connector reads and writes over the grafttest:// scheme") {
    val path = gt(s"$root/avro_v2")
    df.write.format("avro").mode("overwrite").save(path)
    val back = spark.read.format("avro").load(path)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    // append through the two-phase commit (temp dir + renames) too
    df.write.format("avro").mode("append").save(path)
    assert(spark.read.format("avro").load(path).count() === 6)
  }

  test("AvroIO read over an explicit file:// URI") {
    val local = s"$root/avro_file_uri"
    AvroIO.write(df, local)
    val back = AvroIO.read(spark, s"file://$local")
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("Iceberg scan resolves metadata, manifests and data via grafttest://") {
    val dir = s"$root/iceberg_fs"
    // recordScheme stamps EVERY recorded path (metadata location,
    // manifest list, manifests, data files) with grafttest:// — the
    // whole planning + scan chain must go through the scheme registry.
    val w = new IcebergFixture.Writer(spark, dir, st,
      recordScheme = Some(GraftTestFileSystem.Scheme))
    w.append(df)
    w.append(df.withColumn("id", org.apache.spark.sql.functions.col("id") + 10))
    val table = gt(dir)
    val got = IcebergIO.read(spark, table)
    assert(got.count() === 6)
    assert(got.select("id").collect().map(_.getLong(0)).sorted ===
      Array(1L, 2L, 3L, 11L, 12L, 13L))
    // metadata relations plan through the scheme too
    assert(IcebergIO.files(spark, table).count() === 2)
    assert(IcebergIO.manifests(spark, table).count() === 2)
    assert(IcebergIO.history(spark, table).count() === 2)
  }

  test("Iceberg position deletes apply across the grafttest:// scheme") {
    val dir = s"$root/iceberg_fs_del"
    val w = new IcebergFixture.Writer(spark, dir, st,
      recordScheme = Some(GraftTestFileSystem.Scheme))
    w.append(df) // ids 1,2,3
    // position-delete row 0 — the recorded path carries the grafttest://
    // scheme, so the delete-file scan and the anti-join's path
    // normalization both cross the scheme boundary
    val dataFile = w.dataFilePaths.head
    assert(dataFile.startsWith("grafttest://"),
      s"expected scheme-qualified path: $dataFile")
    w.deletePositions(dataFile, Seq(0L))
    val after = IcebergIO.read(spark, gt(dir))
    assert(after.select("id").collect().map(_.getLong(0)).sorted ===
      Array(2L, 3L))
  }

  test("IcebergWrite create/append/overwrite entirely over grafttest://") {
    val dir = s"$root/iceberg_fs_write"
    val table = gt(dir)
    // every metadata/manifest/data byte — including the distributed
    // data-file job's staging dir, the stats read-back, the renames and
    // the optimistic vN publish — must cross the scheme registry
    graft.sources.IcebergWrite.create(spark, table, st,
      partitionCols = Seq("name"))
    graft.sources.IcebergWrite.append(df, table)
    val got = IcebergIO.read(spark, table)
    assert(got.select("id").collect().map(_.getLong(0)).sorted ===
      Array(1L, 2L, 3L))
    // recorded data paths carry the scheme (read as recorded)
    val paths = IcebergIO.files(spark, table).collect()
      .map(_.getAs[String]("file_name"))
    assert(paths.nonEmpty)
    graft.sources.IcebergWrite.overwrite(
      df.filter(org.apache.spark.sql.functions.col("id") === 2L), table)
    assert(IcebergIO.read(spark, table).count() === 1L)
  }

  test("table + partition statistics verbs run entirely over grafttest://") {
    val dir = s"$root/iceberg_fs_stats"
    val table = gt(dir)
    graft.sources.IcebergWrite.create(spark, table, st,
      partitionCols = Seq("name"))
    graft.sources.IcebergWrite.append(df, table)
    // Puffin write + footer read-back + metadata publish all cross the
    // scheme registry; the registered statistics-path carries it
    val tstats = graft.sources.IcebergWrite.computeTableStats(spark, table)
    // Hadoop prints authority-less URIs with a single slash
    assert(tstats.startsWith(s"${GraftTestFileSystem.Scheme}:/"), tstats)
    assert(IcebergIO.tableStats(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
      === Map("id" -> 3L, "name" -> 2L))
    // partition stats: spark parquet write to a scheme'd tmp dir +
    // rename + registered read-back
    val pstats = graft.sources.IcebergWrite.computePartitionStats(spark, table)
    assert(pstats.startsWith(s"${GraftTestFileSystem.Scheme}:/"), pstats)
    assert(IcebergIO.partitionStats(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
      === Seq(("name=a", 1L), ("name=b", 1L), ("name=null", 1L)))
  }

  test("Iceberg partition pruning via readWhere over grafttest://") {
    val dir = s"$root/iceberg_fs_prune"
    val w = new IcebergFixture.Writer(spark, dir, st,
      partitionCols = Seq("name"),
      recordScheme = Some(GraftTestFileSystem.Scheme))
    w.append(spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(
        Row(1L, "a"), Row(2L, "b"), Row(3L, "a"))), st))
    val pruned = IcebergIO.readWhere(spark, gt(dir),
      org.apache.spark.sql.functions.col("name") === "b")
    assert(pruned.select("id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }
}
