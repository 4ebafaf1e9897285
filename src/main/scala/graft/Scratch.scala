package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad main — overwrite freely (CLAUDE.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    queries.Registry.prepare(spark, "/root/testdata/sf0.01")
    val g = GraftSession.wrap(spark)
    g.explainAnalyze(
        "SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY l_returnflag")
      .filter(org.apache.spark.sql.functions.col("metric") === "numOutputRows")
      .collect()
      .foreach(r => println(s"${r.getString(0)} | ${r.getString(1)} | ${r.getLong(2)}"))
    spark.stop()
  }
}
