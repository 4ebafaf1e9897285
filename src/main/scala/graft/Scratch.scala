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

    val dir = s"/tmp/graft_evolve_${java.util.UUID.randomUUID}"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("region", StringType),
      StructField("cat", LongType), StructField("v", DoubleType)))

    // 1. unpartitioned -> partition by region -> repartition by cat
    val t1 = s"$dir/t1"
    IcebergWrite.create(spark, t1, schema)
    IcebergWrite.append(Seq((1L, "eu", 1L, 1.0), (2L, "us", 2L, 2.0))
      .toDF("id", "region", "cat", "v"), t1)
    IcebergWrite.updatePartitionSpec(t1, Seq("region"))
    IcebergWrite.append(Seq((3L, "eu", 1L, 3.0), (4L, "us", 2L, 4.0))
      .toDF("id", "region", "cat", "v"), t1)
    IcebergWrite.updatePartitionSpec(t1, Seq("cat"),
      Map("cat" -> "bucket[4]"))
    IcebergWrite.append(Seq((5L, "eu", 3L, 5.0)).toDF("id", "region", "cat", "v"), t1)

    // full read sees all rows across all three specs
    val all = IcebergIO.read(spark, t1).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(all == Seq(1L, 2L, 3L, 4L, 5L), all)
    println("t1 full read across 3 specs OK")

    // pruning on region: files of spec0 (unpartitioned) + spec2 (cat) are
    // KEPT (their specs can't resolve the filter); spec1 files prune.
    // Results must still be exact — pruning is planning-level only, and
    // the caller applies the row filter.
    val eu = IcebergIO.read(spark, t1, partitionFilter = Map("region" -> "eu"))
      .filter(col("region") === "eu")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(eu == Seq(1L, 3L, 5L), eu)
    println("t1 partition filter across specs OK")

    // metadata sanity: three specs, default is the last
    val meta = IcebergIO.loadMetadata(t1)
    assert(meta.specsById.keySet == Set(0, 1, 2), meta.specsById.keySet)
    assert(meta.defaultSpecId == 2)
    assert(meta.partitionFields.map(_._2) == Seq("bucket[4]"))

    // 2. eq-delete across specs: delete by id (values join derives scope
    // per current spec; files under old specs handled by per-spec scoping)
    IcebergWrite.deleteEquality(Seq(1L, 4L).toDF("id"), t1)
    val left = IcebergIO.read(spark, t1).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(left == Seq(2L, 3L, 5L), left)
    println("t1 eq-delete across specs OK")

    // 3. deleteWhere (position) across specs
    IcebergWrite.deleteWhere(spark, t1, col("id") === 3L)
    val left2 = IcebergIO.read(spark, t1).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(left2 == Seq(2L, 5L), left2)
    println("t1 deleteWhere across specs OK")

    // 4. compact folds everything into the CURRENT spec
    IcebergWrite.compact(spark, t1)
    val left3 = IcebergIO.read(spark, t1).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(left3 == Seq(2L, 5L), left3)
    println("t1 compact after evolution OK")

    // 5. un-partition: Nil spec
    val t2 = s"$dir/t2"
    IcebergWrite.create(spark, t2, schema, partitionCols = Seq("region"))
    IcebergWrite.append(Seq((1L, "eu", 1L, 1.0)).toDF("id", "region", "cat", "v"), t2)
    IcebergWrite.updatePartitionSpec(t2, Nil)
    IcebergWrite.append(Seq((2L, "us", 2L, 2.0)).toDF("id", "region", "cat", "v"), t2)
    assert(IcebergIO.read(spark, t2).count() == 2)
    println("t2 un-partition OK")

    // 6. field-id reuse: re-partitioning by region again reuses its id
    IcebergWrite.updatePartitionSpec(t2, Seq("region"))
    val m2 = IcebergIO.loadMetadata(t2)
    assert(m2.partitionFieldIds == m2.specsById.keySet.toSeq.sorted.headOption
      .map(_ => m2.partitionFieldIds).getOrElse(Nil)) // shape check
    // spec0 and spec2 both partition by identity(region): same field id 1000
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(new java.io.File(m2.metadataFile))
    val specsNode = node.get("partition-specs")
    val fid0 = specsNode.get(0).get("fields").get(0).get("field-id").asInt
    val fid2 = specsNode.get(2).get("fields").get(0).get("field-id").asInt
    assert(fid0 == fid2, s"$fid0 != $fid2 — field id not reused")
    println("t2 field-id reuse OK")

    println("ALL PARTITION-EVOLUTION SMOKE TESTS PASSED")
    spark.stop()
  }
}
