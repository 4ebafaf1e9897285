package graft
import org.apache.spark.sql.SparkSession
/** scratchpad: time dedup_semantic at sf0.1, 2 iterations. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val q = graft.queries.Registry.all.find(_.name == "dedup_semantic").get
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = q.run(spark, sf).count()
      println(s"iter $i: ${(System.nanoTime()-t0)/1e9} s, rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
