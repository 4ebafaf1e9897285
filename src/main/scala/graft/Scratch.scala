package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.HtmlExtract

/** Scratchpad main — overwrite freely (tools/run.sh graft.Scratch).
  * Current: isolated timing of text_html_extract at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("html",
        HtmlExtract.syntheticHtml(col("doc_id"), col("text")))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      HtmlExtract.extractHtmlText(docs, "doc_id", "html")
        .write.format("noop").mode("overwrite").save()
      println(s"iter $i: " + ((System.nanoTime() - t0) / 1e9))
    }
    spark.stop()
  }
}
