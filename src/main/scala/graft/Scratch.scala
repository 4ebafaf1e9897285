package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sh = Dedup.shingles(docs, "doc_id", "text")
    println("shingle rows: " + sh.count())
    sh.show(3, false)
    val bk = Dedup.minhashBandKeys(sh, 6, 3)
    println("bandkey rows: " + bk.count())
    bk.show(3, false)
    val cands = Dedup.lshCandidates(bk)
    println("candidates: " + cands.count())
    val jac = Dedup.jaccard(cands, sh)
    println("jaccard >= 0.5: " + jac.filter(col("jac") >= 0.5).count())
    jac.orderBy(desc("jac")).show(5, false)
    spark.stop()
  }
}
