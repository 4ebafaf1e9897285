package graft

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("scratch")
      .config("spark.ui.enabled", "false").getOrCreate()
    // is `div` a registered FunctionRegistry name (callable via call_function)?
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      call_function("div", lit(-7L), lit(2L)).as("d"))
    df.show()
    println("TYPE=" + df.schema.head.dataType)
    spark.stop()
  }
}
