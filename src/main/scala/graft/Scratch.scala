package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", col("id") < 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Int =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet.count(exact)
    val seed = recall(Similarity.pqTopK(emb, "vec_id", "embedding",
      col("id") < 8, 10, m = 16, ksub = 32))
    println(s"seed recall: $seed/80")
    for (it <- Seq(1, 2, 3)) {
      val tr = recall(Similarity.pqTopKTrained(emb, "vec_id", "embedding",
        col("id") < 8, 10, m = 16, ksub = 32, iters = it))
      println(s"trained(iters=$it) recall: $tr/80")
    }
    spark.stop()
  }
}
