package graft
import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    println("ISIN: " + GraftShim.predicateTree(col("id").isin(1L, 5L, 9L)))
    println("BETWEEN: " + GraftShim.predicateTree(col("id").between(2, 7)))
    spark.stop()
  }
}
