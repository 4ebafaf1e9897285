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
    val dir = "/tmp/graft_scratch_meta1"
    IcebergFixture.deleteRecursively(dir)
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def rows(vals: (Int, String)*) = {
      val list = new java.util.ArrayList[Row]()
      vals.foreach(v => list.add(Row(v._1, v._2)))
      spark.createDataFrame(list, schema)
    }
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(rows((1, "a"), (2, "b"), (3, "c")), dir)
    IcebergWrite.append(rows((4, "d"), (5, "e")), dir)
    IcebergWrite.deleteWhere(spark, dir, col("k") === 2)
    println("=== files ===");        IcebergIO.files(spark, dir).show(false)
    println("=== all_files ===");    IcebergIO.allFiles(spark, dir).show(false)
    println("=== all_manifests ==="); IcebergIO.allManifests(spark, dir).show(false)
    println("=== all_entries ===");  IcebergIO.allEntries(spark, dir).show(false)
    println("=== metadata_log ==="); IcebergIO.metadataLogEntries(spark, dir).show(false)
    println("=== position_deletes ===")
    IcebergIO.positionDeletes(spark, dir).show(false)
    IcebergWrite.compact(spark, dir)
    println("=== after compact: files / all_files / position_deletes ===")
    IcebergIO.files(spark, dir).show(false)
    IcebergIO.allFiles(spark, dir).show(false)
    IcebergIO.positionDeletes(spark, dir).show(false)
    // registered metadata views
    val gs = GraftSession.wrap(spark)
    gs.registerIceberg("t1", dir, metadataTables = true)
    spark.sql("SELECT * FROM t1_all_files").show(false)
    spark.sql("SELECT * FROM t1_metadata_log_entries").show(false)
    spark.sql("SELECT count(*) AS n FROM t1_position_deletes").show(false)
    spark.stop()
  }
}
