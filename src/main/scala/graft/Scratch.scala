package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    val sf = "/root/testdata/sf0.1"
    graft.queries.Registry.prepare(spark, sf)
    val names = Seq("dedup_semantic", "dedup_groups", "embed_pq_rerank")
    for (n <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.queries.Registry.all.find(_.name == n).get.run(spark, sf).collect()
      println(f"$n iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
