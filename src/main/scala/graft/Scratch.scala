package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{IcebergIO, IcebergWrite}

/** Scratchpad main — overwrite freely (tools/run.sh graft.Scratch).
  * Current: v3 variant column end-to-end through the Iceberg writer
  * and reader. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    val dir = s"/tmp/scratch_icevar_${java.util.UUID.randomUUID().toString.take(8)}"
    val df = spark.range(4).selectExpr("id",
      "parse_json(concat('{\"k\":', id, ',\"s\":\"x', id, '\"}')) as v")
    IcebergWrite.create(spark, dir, df.schema, formatVersion = 3)
    IcebergWrite.append(df, dir)
    val back = IcebergIO.read(spark, dir)
    println("SCHEMA: " + back.schema)
    back.selectExpr("id", "to_json(v)", "variant_get(v, '$.k', 'long')")
      .orderBy("id").collect().foreach(r => println("ROW: " + r))
    // DV delete over the variant table (row identity untouched by type)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    println("AFTER DELETE: " + IcebergIO.read(spark, dir)
      .selectExpr("id", "to_json(v)").orderBy("id").collect().mkString(" | "))
    // row lineage over a variant table
    println("LINEAGE: " + IcebergIO.readWithRowId(spark, dir)
      .selectExpr("id", "_row_id", "to_json(v)").orderBy("id")
      .collect().mkString(" | "))
    // compact folds the DV; variant content survives the rewrite
    IcebergWrite.compact(spark, dir)
    println("AFTER COMPACT: " + IcebergIO.readWithRowId(spark, dir)
      .selectExpr("id", "_row_id", "to_json(v)").orderBy("id")
      .collect().mkString(" | "))
    // v2 create refuses
    try {
      IcebergWrite.create(spark, s"$dir-v2", df.schema)
      println("V2 GUARD FAIL: accepted")
    } catch { case e: IllegalArgumentException =>
      println("V2 GUARD OK: " + e.getMessage) }
    spark.stop()
  }
}
