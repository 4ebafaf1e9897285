package graft
import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val e = GraftShim.expression(col("id") >= 15L)
    println("CLASS: " + e.getClass.getName)
    println("TREE: " + e)
    val e2 = GraftShim.expression(col("name") === "a" && col("score") > 1.0)
    println("CLASS2: " + e2.getClass.getName)
    println("TREE2: " + e2)
    spark.stop()
  }
}
