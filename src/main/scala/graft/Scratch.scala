package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad main — overwrite freely (CLAUDE.md). Currently: time the
  * minhash/VecDot-affected queries at sf0.1. */
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
    val names = Set("dedup_minhash", "dedup_simhash", "embed_knn_brute",
      "dedup_embedding", "embed_ivf_topk", "embed_ann_lsh")
    for (q <- queries.Registry.all if names(q.name); it <- 1 to 2) {
      val t0 = System.nanoTime()
      q.run(spark, sf).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"${q.name}%-18s it$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
