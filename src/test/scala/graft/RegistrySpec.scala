package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the registry stays populated, names line up,
  * and the flagship entry computes rows. */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry() runs the flagship query and returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows(0).schema.fieldNames.contains("sum_qty"))
  }

  test("registry is populated and oracle keys are a subset of query keys") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(q.size >= 70)
    assert(o.keySet.subsetOf(q.keySet))
    assert(o.size >= 65) // near-total oracle coverage
  }

  test("a sample of queries executes at sf0.001") {
    for (name <- Seq("tpch_q6", "join_inner", "win_ranks", "setop_union",
        "text_stats", "dedup_exact")) {
      val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
      assert(df.collect() != null, name)
    }
  }
}
