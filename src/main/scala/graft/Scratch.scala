package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad: time dedup_minhash in isolation at sf0.1 (min of 2). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val times = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"pairs=$n time=$dt%.3f s")
      dt
    }
    println(f"MIN=${times.min}%.3f s")
    spark.stop()
  }
}
