package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{GraftFs, IcebergFixture, IcebergIO, IcebergWrite}

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("scratch").getOrCreate()
    try {
      val dir = s"/tmp/graft_scr_unk2_${java.util.UUID.randomUUID().toString.take(8)}"
      val uSchema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("u", NullType, nullable = true),
        StructField("v", StringType, nullable = false)))
      IcebergWrite.create(spark, dir, uSchema, formatVersion = 3)
      val txt = GraftFs.readUtf8(IcebergIO.loadMetadata(dir).metadataFile)
      println("has unknown: " + txt.contains("\"type\":\"unknown\""))
      println(txt.take(1200))
    } finally spark.stop()
  }
}
