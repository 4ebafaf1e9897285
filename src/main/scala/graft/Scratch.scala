package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratchpad main — overwrite freely (CLAUDE.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = "/root/testdata/sf0.01"
    graft.queries.Registry.prepare(spark, sf)

    // V2 write to a FRESH path, then read back
    val out = "/tmp/scratch_v2w_" + System.nanoTime()
    spark.table("nation").write.format("avro").mode("overwrite").save(out)
    val back = spark.read.format("avro").load(out)
    println("write->read schema: " + back.schema.simpleString)
    println("rows: " + back.count() + " files: " +
      new java.io.File(out).listFiles().map(_.getName).sorted.mkString(","))

    // overwrite truncates
    spark.table("region").write.format("avro").mode("overwrite").save(out)
    val back2 = spark.read.format("avro").load(out)
    println("after overwrite: " + back2.schema.simpleString + " rows " + back2.count())

    // append adds
    spark.table("region").write.format("avro").mode("append").save(out)
    println("after append rows: " + spark.read.format("avro").load(out).count())

    // empty write round-trip
    val empty = spark.table("region").limit(0)
    val out2 = out + "_empty"
    empty.write.format("avro").mode("overwrite").save(out2)
    val backE = spark.read.format("avro").load(out2)
    println("empty: " + backE.schema.simpleString + " rows " + backE.count())

    spark.stop()
  }
}
