package graft
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = queries.Registry.all.map(q => q.name -> q).toMap
    for (n <- Seq("text_bpe_train", "text_bpe_apply"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      byName(n).run(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
