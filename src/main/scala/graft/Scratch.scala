package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{IcebergIO, IcebergWrite}

/** Scratchpad main — overwrite freely. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = s"/tmp/graft_rename_${java.util.UUID.randomUUID}"

    // 1. unpartitioned: create, append, eq-delete, rename, append, read
    val t1 = s"$dir/t1"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    IcebergWrite.create(spark, t1, schema)
    IcebergWrite.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "v"), t1)
    IcebergWrite.deleteEquality(Seq(2L).toDF("id"), t1)
    IcebergWrite.renameColumn(t1, "name", "label")
    IcebergWrite.append(Seq((4L, "d", 4.0)).toDF("id", "label", "v"), t1)
    val r1 = IcebergIO.read(spark, t1).orderBy("id")
    r1.show()
    val rows = r1.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "a", 1.0), (3L, "c", 3.0), (4L, "d", 4.0)), rows)
    assert(r1.schema.fieldNames.toSeq == Seq("id", "label", "v"))
    // eq-delete AFTER rename on renamed column, hitting pre-rename rows
    IcebergWrite.deleteEquality(Seq("c").toDF("label"), t1)
    val rows2 = IcebergIO.read(spark, t1).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows2 == Seq(1L, 4L), rows2)
    println("t1 (unpartitioned rename + eq-deletes) OK")

    // 2. partitioned on the renamed column (identity): rename SOURCE
    val t2 = s"$dir/t2"
    IcebergWrite.create(spark, t2, schema, partitionCols = Seq("name"))
    IcebergWrite.append(Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "name", "v"), t2)
    IcebergWrite.renameColumn(t2, "name", "tag")
    IcebergWrite.append(Seq((3L, "x", 3.0)).toDF("id", "tag", "v"), t2)
    // pruning through the renamed source
    val pruned = IcebergIO.read(spark, t2, partitionFilter = Map("tag" -> "x"))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(pruned == Seq(1L, 3L), pruned)
    // deleteWhere on renamed column (predicate over pre-rename files)
    IcebergWrite.deleteWhere(spark, t2, col("tag") === "y")
    val left = IcebergIO.read(spark, t2).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(left == Seq(1L, 3L), left)
    println("t2 (partition-source rename + prune + deleteWhere) OK")

    // 3. upsert after rename
    IcebergWrite.upsert(Seq((1L, "x", 10.0), (9L, "z", 9.0)).toDF("id", "tag", "v"),
      t2, keyCols = Seq("id"))
    val up = IcebergIO.read(spark, t2).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(up == Seq((1L, 10.0), (3L, 3.0), (9L, 9.0)), up)
    println("t3 (upsert after rename) OK")

    // 4. refusal on a property-less (fixture/external) table
    val t4 = s"$dir/t4"
    IcebergWrite.create(spark, t4, schema)
    // simulate an external table: strip the property from metadata
    val meta = IcebergIO.loadMetadata(t4)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(new java.io.File(meta.metadataFile))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.putObject("properties")
    java.nio.file.Files.write(java.nio.file.Paths.get(meta.metadataFile),
      om.writeValueAsBytes(node))
    // drop the Hadoop local-FS checksum sidecar the out-of-band edit broke
    val p = java.nio.file.Paths.get(meta.metadataFile)
    java.nio.file.Files.deleteIfExists(p.getParent.resolve("." + p.getFileName + ".crc")): Unit
    val refused = try { IcebergWrite.renameColumn(t4, "name", "label"); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("field-id") }
    assert(refused, "rename on property-less table must be refused")
    println("t4 (external-table refusal) OK")

    // 5. time travel to a pre-rename snapshot still reads (old schema names
    // come from the CURRENT schema — Iceberg semantics: schema is table-
    // level, not snapshot-level)
    val snaps = IcebergIO.loadMetadata(t1).snapshots.map(_.snapshotId).sorted
    val tt = IcebergIO.read(spark, t1, snapshotId = Some(snaps.head))
    assert(tt.schema.fieldNames.toSeq == Seq("id", "label", "v"))
    assert(tt.count() == 3)
    println("t5 (time travel across rename) OK")

    println("ALL RENAME SMOKE TESTS PASSED")
    spark.stop()
  }
}
