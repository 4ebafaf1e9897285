package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad main — overwrite freely (CLAUDE.md). Currently: time the
  * queries that looked heavy in BENCH_r03 + the new advanced queries. */
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
    val names = Set("win_frame_groups", "win_frame_range", "text_quality",
      "repartition_agg", "setop_except", "h2o_q10", "dedup_ngram_jaccard",
      "join_asof", "join_asof_fwd", "join_asof_tol", "join_range",
      "sample_stratified", "agg_pivot", "fn_explode")
    for (q <- queries.Registry.all if names(q.name); it <- 1 to 2) {
      val t0 = System.nanoTime()
      q.run(spark, sf).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"${q.name}%-20s it$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
