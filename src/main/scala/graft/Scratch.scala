package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad main — overwrite freely. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("tpch_q18", "tpch_q5", "tpch_q9", "dedup_minhash",
      "win_frame_range", "dedup_embedding", "embed_ivf_topk")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"\n========== $n ==========")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
