package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{IcebergFixture, IcebergIO, IcebergWrite}

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_scratch_rpd1"
    IcebergFixture.deleteRecursively(dir)
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def rows(vals: (Int, String)*) = {
      val list = new java.util.ArrayList[Row]()
      vals.foreach(v => list.add(Row(v._1, v._2)))
      spark.createDataFrame(list, schema).coalesce(1)
    }
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(rows((1, "a"), (2, "b"), (3, "c"), (4, "d")), dir)
    IcebergWrite.append(rows((5, "e"), (6, "f")), dir)
    IcebergWrite.deleteWhere(spark, dir, col("k") === 2)
    IcebergWrite.deleteWhere(spark, dir, col("k") === 5)
    IcebergWrite.deleteEquality(rows((6, "f")).select("k"), dir)
    println("before: " + IcebergIO.read(spark, dir).orderBy("k").collect().map(_.getInt(0)).mkString(","))
    println("pos files before: " + IcebergIO.files(spark, dir).filter("content=1").count())
    val sid = IcebergWrite.rewritePositionDeletes(spark, dir)
    println("rewrite snapshot: " + sid)
    println("after:  " + IcebergIO.read(spark, dir).orderBy("k").collect().map(_.getInt(0)).mkString(","))
    println("pos files after: " + IcebergIO.files(spark, dir).filter("content=1").count())
    IcebergIO.files(spark, dir).show(false)
    IcebergIO.positionDeletes(spark, dir).show(false)
    // no-op path: second rewrite (already one file) still consolidates to same
    val sid2 = IcebergWrite.rewritePositionDeletes(spark, dir)
    println("second rewrite snapshot: " + sid2)
    println("after2: " + IcebergIO.read(spark, dir).orderBy("k").collect().map(_.getInt(0)).mkString(","))
    // time travel to pre-rewrite snapshot still sees the same rows
    println("travel: " + IcebergIO.read(spark, dir, snapshotId = Some(sid - 1)).orderBy("k").collect().map(_.getInt(0)).mkString(","))
    // changelog skips the rewrite snapshot
    val cl = IcebergIO.readChangelog(spark, dir)
    println("changelog rows: " + cl.count())
    cl.orderBy("_change_ordinal", "k").show(false)
    // CALL surface
    val gs = GraftSession.wrap(spark)
    gs.registerIceberg("t", dir)
    gs.sql("CALL system.rewrite_position_deletes('t')").show(false)
    spark.stop()
  }
}
