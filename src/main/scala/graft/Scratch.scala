package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad main — overwrite freely. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("tpch_q13", "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q5",
      "tpch_q4", "tpch_q1", "dedup_minhash", "embed_ivf_topk")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      println(f"$n%-16s min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
