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
    val dir = "/tmp/graft_scratch_widen3"
    IcebergFixture.deleteRecursively(dir)
    val narrow = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("x", FloatType, nullable = true)))
    def rows(vals: (Int, Float)*) = {
      val list = new java.util.ArrayList[Row]()
      vals.foreach(v => list.add(Row(v._1, v._2)))
      spark.createDataFrame(list, narrow)
    }
    IcebergWrite.create(spark, dir, narrow)
    IcebergWrite.append(rows((-100, -1.5f), (-50, -0.5f)), dir)
    IcebergWrite.append(rows((50, 1.5f), (100, 2.5f)), dir)
    println("pre-widen files:")
    IcebergIO.files(spark, dir).show(false)
    println("pre-widen prune k < -40 (int): " +
      IcebergIO.readWhere(spark, dir, col("k") < -40).inputFiles.length)
    IcebergWrite.widenColumn(dir, "k", LongType)
    IcebergWrite.widenColumn(dir, "x", DoubleType)
    println("post-widen prune k < -40L: " +
      IcebergIO.readWhere(spark, dir, col("k") < -40L).inputFiles.length)
    println("post-widen prune x < -0.1: " +
      IcebergIO.readWhere(spark, dir, col("x") < -0.1).inputFiles.length)
    spark.stop()
  }
}
