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
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding",
        col("id") < 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Int =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet.count(exact)
    def cands(df: org.apache.spark.sql.DataFrame): Long = df.count()
    for (ci <- Seq(0, 1, 2, 3); np <- Seq(2, 4)) {
      val r = recall(Similarity.ivfPqTopKTrained(emb, "vec_id", "embedding",
        col("id") < 8, 10, nCells = 8, nprobe = np, m = 16, ksub = 32,
        iters = 1, coarseIters = ci))
      println(s"coarseIters=$ci nprobe=$np recall=$r/80")
    }
    // full-probe equivalence with trained coarse
    val trainedRows = Similarity.pqTopKTrained(emb, "vec_id", "embedding",
        col("id") < 8, 10, m = 16, ksub = 32, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Similarity.ivfPqTopKTrained(emb, "vec_id", "embedding",
        col("id") < 8, 10, nCells = 8, nprobe = 8, m = 16, ksub = 32,
        iters = 1, coarseIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"full-probe trained-coarse == trained ADC: ${full == trainedRows}")
    spark.stop()
  }
}
