package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.HtmlExtract

/** Scratchpad main — overwrite freely (tools/run.sh graft.Scratch).
  * Current: HTML extraction smoke test over the synthetic page. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(5)
      .withColumn("html",
        HtmlExtract.syntheticHtml(col("doc_id"), col("text")))
    val blocks = HtmlExtract.htmlBlocks(docs, "doc_id", "html")
    blocks.show(40, 60)
    val out = HtmlExtract.extractHtmlText(docs, "doc_id", "html")
    out.show(5, 120)
    out.select("n_blocks", "n_kept").groupBy("n_blocks", "n_kept").count().show()
    spark.stop()
  }
}
