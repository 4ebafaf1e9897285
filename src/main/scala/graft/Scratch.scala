package graft

import org.apache.spark.sql.SparkSession

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_simhash")
    for (n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sf)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"$n%-24s plan ${(t1 - t0) / 1e9}%6.2f s  exec ${(t2 - t1) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
