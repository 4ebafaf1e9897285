package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad main — overwrite freely (tools/run.sh graft.Scratch). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    spark.range(3).show()
    spark.stop()
  }
}
