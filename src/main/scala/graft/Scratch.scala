package graft

import org.apache.spark.sql.SparkSession

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    // Simulate the driver's smoke session: NO nanosAsLong in the builder —
    // entry() must still work (prepare() sets it at runtime).
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
  }
}
