package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad main — overwrite freely (CLAUDE.md). */
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
    val sf = "/root/testdata/sf0.1"
    val q = queries.Registry.all.find(_.name == "dedup_ngram_jaccard").get
    for (it <- 1 to 4) {
      val t0 = System.nanoTime()
      q.run(spark, sf).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"it$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
