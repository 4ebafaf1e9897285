package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Scale-pattern tests: bucketed co-located joins (no exchange on either
  * side) and skew-salted joins (correctness under salting). */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    val or = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS or_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", "/tmp/graft_bucketed/li_b").mode("overwrite").saveAsTable("li_b")
    or.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", "/tmp/graft_bucketed/or_b").mode("overwrite").saveAsTable("or_b")

    val joined = spark.table("li_b")
      .join(spark.table("or_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucket join: no shuffle before the join itself — the only
    // exchange allowed is the one for the groupBy.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected bucket-local join, plan:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum ==
      li.join(or, col("l_orderkey") === col("o_orderkey")).count())
    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE or_b")
  }

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString

  test("tpch_q1 plan: pushed filter, pruned columns, two-phase agg, one hash exchange") {
    val p = planOf("tpch_q1")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("partial_sum"))
    assert(!p.contains("l_orderkey"), "projection should prune unused columns")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("tpch_q3 plan: dimension sides broadcast, fact side never shuffled for joins") {
    val p = planOf("tpch_q3")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"))
  }

  test("embed_knn_brute plan: top-k pushed below the shuffle, query side broadcast") {
    val p = planOf("embed_knn_brute")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("Partial"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("embed_ann_lsh plan: candidates come from a hash join on the bucket key") {
    val p = planOf("embed_ann_lsh")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "bucketed ANN must not degenerate to a nested-loop join")
  }

  test("salted join matches the plain join exactly") {
    import spark.implicits._
    // one hot key (0) with many rows + a tail
    val skewed = (Seq.fill(1000)(0L) ++ (1L to 50L)).map(k => (k, k * 2))
      .toDF("k", "v")
    val small = (0L to 50L).map(k => (k, s"name_$k")).toDF("k", "name")
    val salted = SkewJoin.saltedInnerJoin(skewed, small, "k", buckets = 8)
    val plain = skewed.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().orderBy("k").collect().toSeq ==
      plain.groupBy("k").count().orderBy("k").collect().toSeq)
  }

  test("DDL type normalization maps reference types to Spark types") {
    import graft.ExternalTableDdl.normalizeTypes
    assert(normalizeTypes("(a VARCHAR, b VARCHAR(10), c TEXT)")
      == "(a STRING, b VARCHAR(10), c STRING)")
    assert(normalizeTypes("(u INT UNSIGNED, v BIGINT UNSIGNED, w REAL)")
      == "(u BIGINT, v DECIMAL(20,0), w FLOAT)")
    // column NAMES colliding with type keywords stay untouched
    assert(normalizeTypes("(text VARCHAR, real DOUBLE, n DECIMAL(10,2))")
      == "(text STRING, real DOUBLE, n DECIMAL(10,2))")
    assert(normalizeTypes("(a INT COMMENT 'use REAL text', b REAL)")
      == "(a INT COMMENT 'use REAL text', b FLOAT)")
    // end-to-end through the translator
    val out = ExternalTableDdl.translate(
      "CREATE EXTERNAL TABLE t (a VARCHAR, n INT UNSIGNED) STORED AS CSV LOCATION '/tmp/x'").get
    assert(out.contains("(a STRING, n BIGINT)"))
  }
}
