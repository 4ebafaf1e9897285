package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Scratchpad main — overwrite freely. Current: isolated timing of
  * text_hashlin_classify at sf0.1 after the (doc, slot) collapse. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      TextAnalysis.hashedLinearClassify(docs, "doc_id", "text", "lang",
          buckets = 64, seed = "hl")
        .write.format("noop").mode("overwrite").save()
      println(s"iter $i: " + ((System.nanoTime() - t0) / 1e9))
    }
    spark.stop()
  }
}
