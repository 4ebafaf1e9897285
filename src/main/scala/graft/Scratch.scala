package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"

    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-28s $s%8.3f s")
      s
    }

    Seq(20, 200).foreach { buckets =>
      println(s"=== buckets = $buckets ===")
      val sdf = spark.read.parquet(s"$src/orders.parquet")
        .select(col("o_orderkey"),
          pmod(col("o_orderkey"), lit(buckets.toLong)).cast("int").as("o_bucket"))
      (1 to 2).foreach { trial =>
        println(s"-- trial $trial")
        // phase A: raw Spark repartition+partitionBy parquet write
        val raw = s"/tmp/graft_prof_raw_${buckets}_$trial"
        graft.sources.IcebergFixture.deleteRecursively(raw)
        t("raw partitionBy write") {
          sdf.withColumn("__p", col("o_bucket"))
            .repartition(col("__p"))
            .write.mode("overwrite").partitionBy("__p").parquet(raw)
        }
        // phase B: per-file stats read-back over the written leaves
        val leaves = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          def walk(d: String): Unit = graft.sources.GraftFs.list(d).foreach { s =>
            if (s.isDirectory) walk(s.getPath.toString)
            else if (s.getPath.getName.endsWith(".parquet")) out += s.getPath.toString
          }
          walk(raw); out.toSeq
        }
        println(s"  leaves: ${leaves.size}")
        t("stats read-back agg") {
          spark.read.schema(sdf.schema).parquet(leaves: _*)
            .withColumn("__gf_f", col("_metadata.file_path"))
            .groupBy("__gf_f")
            .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"),
              min("o_bucket"), max("o_bucket"))
            .collect(): Unit
        }
        // phase C: the full iceberg write
        val dir = s"/tmp/graft_prof_ice_${buckets}_$trial"
        graft.sources.IcebergFixture.deleteRecursively(dir)
        t("iceberg create+append") {
          graft.sources.IcebergWrite.create(spark, dir, sdf.schema,
            partitionCols = Seq("o_bucket"))
          graft.sources.IcebergWrite.append(sdf, dir): Unit
        }
      }
    }
    spark.stop()
  }
}
