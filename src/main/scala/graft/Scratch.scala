package graft
import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    println("NEQ: " + GraftShim.predicateTree(col("id") =!= 5L))
    println("NOT: " + GraftShim.predicateTree(!(col("id") > 5L)))
    println("NOTFN: " + GraftShim.predicateTree(not(col("id").isin(1L, 2L))))
    spark.stop()
  }
}
