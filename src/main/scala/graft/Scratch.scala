package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratchpad main — overwrite freely. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    queries.Registry.prepare(spark, sfDir)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { it =>
      println(s"=== iteration $it")
      val pairs = Dedup.minhashNearDups(spark.table("documents"), "doc_id", "text",
        numBands = 6, rowsPerBand = 3, shingleN = 3, threshold = 0.5)
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val edges = pairs
        .select(explode(array(
          struct(col("a_id").as("u"), col("b_id").as("v")),
          struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
        .persist(lvl)
      t("edges materialize")(println("  n_edges=" + edges.count()))
      var labels = edges.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
        .persist(lvl)
      t("labels init")(labels.count())
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 25) {
        t(s"round $rounds") {
          val nbrMin = edges
            .join(labels.select(col("id").as("v"), col("comp").as("vc")), "v")
            .groupBy("u").agg(min(col("vc")).as("nc"))
          val next = labels
            .join(nbrMin.select(col("u").as("id"), col("nc")), Seq("id"), "left")
            .select(col("id"),
              least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
            .persist(lvl)
          changed = next.join(labels.select(col("id"), col("comp").as("old")), "id")
            .filter(col("comp") =!= col("old")).count()
          labels.unpersist()
          labels = next
          rounds += 1
          println(s"  changed=$changed")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
