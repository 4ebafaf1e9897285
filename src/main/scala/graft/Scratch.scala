package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{IcebergIO, IcebergWrite}

/** Scratchpad main — overwrite freely. Current: merge on a TRUNCATED
  * table (current snapshot, zero data files). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def rows(xs: (Long, String)*) = spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*)), st)
    val dir = s"/tmp/scratch_trunc_${java.util.UUID.randomUUID().toString.take(8)}"
    IcebergWrite.create(spark, dir, st)
    IcebergWrite.append(rows(1L -> "a"), dir)
    IcebergWrite.overwrite(rows(), dir) // truncate: zero live files
    println("live rows after truncate: " + IcebergIO.read(spark, dir).count())
    try {
      IcebergWrite.merge(spark, dir, rows(2L -> "b"), Seq("id"), Seq(
        IcebergWrite.WhenMatchedUpdate(Map("v" -> expr("s.v"))),
        IcebergWrite.WhenNotMatchedInsert(Map(
          "id" -> expr("s.id"), "v" -> expr("s.v")))))
      println("merge ok; rows=" + IcebergIO.read(spark, dir).count())
    } catch { case e: Throwable => println("MERGE FAILED: " + e) }
    spark.stop()
  }
}
