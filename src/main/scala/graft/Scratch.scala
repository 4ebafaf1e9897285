package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(org.apache.spark.sql.GraftShim.predicateTree(
      col("name").startsWith("ab")))
    println(org.apache.spark.sql.GraftShim.predicateTree(
      !col("name").startsWith("ab")))
    spark.stop()
  }
}
