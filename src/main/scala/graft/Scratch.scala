package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** scratchpad: plan audit for the round-12 operators. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val sem = graft.operators.Similarity.semanticDedup(
      emb, "vec_id", "embedding", k = 8, iters = 0, threshold = 0.35)
    val plan = sem.queryExecution.executedPlan.toString
    println("=== dedup_semantic physical plan summary ===")
    println("cartesian: " + plan.contains("CartesianProduct"))
    println("bnlj: " + plan.contains("BroadcastNestedLoopJoin"))
    println("shuffles: " + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("broadcasts: " + "BroadcastExchange".r.findAllIn(plan).length)
    println("smj/shj: " + "SortMergeJoin".r.findAllIn(plan).length + "/" +
      "ShuffledHashJoin".r.findAllIn(plan).length)
    spark.stop()
  }
}
