package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (TPC-H q1 shape: scan → filter → two-phase agg →
    * sort, the stage shape the reference asserts in
    * scheduler/src/planner.rs:352-367) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.TpchQueries.q1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.all.map(q => q.name -> q.run).toMap

  /** DuckDB-equivalent SQL per query (driver correctness gate). */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
