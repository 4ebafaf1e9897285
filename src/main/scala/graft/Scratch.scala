package graft
import org.apache.spark.sql.SparkSession
/** scratchpad: driver t1 smoke — SparkEntry.entry must return rows. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
  }
}
