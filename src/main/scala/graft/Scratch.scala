package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratchpad main — overwrite freely (CLAUDE.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- runtime bloom filter probe
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = "/tmp/graft_bloom"
    val big = spark.range(0, 2000000).select(col("id").as("k"),
      (col("id") % 1000).as("v"))
    val dim = spark.range(0, 2000000, 4000).select(col("id").as("k"),
      lit("x").as("name"))
    big.write.mode("overwrite").parquet(s"$dir/big")
    dim.write.mode("overwrite").parquet(s"$dir/dim")
    val j = spark.read.parquet(s"$dir/big")
      .join(spark.read.parquet(s"$dir/dim").filter(col("name") === "x"), "k")
    j.write.format("noop").mode("overwrite").save()
    val plan = j.queryExecution.executedPlan.toString
    println("BLOOM might_contain in plan: " + plan.contains("might_contain"))
    println("bloomfilter: " + plan.toLowerCase.contains("bloom"))

    // --- AQE skew join probe
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    val skewed = spark.range(0, 500000).select(
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val right = spark.range(0, 1000).select(col("id").as("k"),
      col("id").as("r"))
    skewed.write.mode("overwrite").parquet(s"$dir/skewed")
    right.write.mode("overwrite").parquet(s"$dir/right")
    val sj = spark.read.parquet(s"$dir/skewed")
      .join(spark.read.parquet(s"$dir/right").hint("merge"), "k")
    sj.queryExecution.toRdd.foreachPartition(
      (_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
    val sp = sj.queryExecution.executedPlan.toString
    println("SKEW marker in plan: " + sp.contains("skew=true"))
    println("SMJ: " + sp.contains("SortMergeJoin"))
    println(sp.linesIterator.filter(l => l.contains("Join") || l.contains("AQEShuffleRead")).mkString("\n"))
    spark.stop()
  }
}
