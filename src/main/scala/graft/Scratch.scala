package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{IcebergIO, IcebergWrite}

/** Scratchpad main — overwrite freely. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._

    val dir = "/tmp/graft_scratch_compact_eq"
    graft.sources.IcebergFixture.deleteRecursively(dir)
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](
      java.util.List.of(org.apache.spark.sql.Row(1L, "a", 1.0),
        org.apache.spark.sql.Row(2L, "b", 2.0)))
    IcebergWrite.create(spark, dir, st)
    IcebergWrite.append(spark.createDataFrame(rows, st), dir)
    IcebergWrite.deleteEquality(Seq("a").toDF("name"), dir)

    val live = IcebergIO.read(spark, dir)
    val tmp = s"$dir/_probe_tmp"
    live.write.mode("overwrite").parquet(tmp)
    val staged = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
    println("staged: " + staged.map(_.getPath).mkString(", "))
    val rb = spark.read.schema(st).parquet(staged.map(_.getPath): _*)
      .withColumn("__gf_f",
        regexp_replace(col("_metadata.file_path"), "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/"))
    println("read-back rows:")
    rb.select(col("__gf_f"), col("id")).collect().foreach(r =>
      println("  key=" + r.getString(0) + " id=" + r.getLong(1)))
    spark.stop()
  }
}
