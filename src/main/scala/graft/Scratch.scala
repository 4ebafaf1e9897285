package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = GraftSession.wrap(spark)
    g.registerParquet("ea_li", "/root/testdata/sf0.001/lineitem.parquet")
    val m = g.explainAnalyze("SELECT l_returnflag, COUNT(*) FROM ea_li GROUP BY l_returnflag")
    m.show(60, false)
    spark.stop()
  }
}
