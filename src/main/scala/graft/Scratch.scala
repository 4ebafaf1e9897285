package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    val names = Seq("tpch_q9", "tpch_q13", "text_quality")
    val qs = queries.Registry.all.filter(q => names.contains(q.name))
    (1 to 3).foreach { it =>
      qs.foreach { q =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        println(f"iter$it ${q.name}: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
