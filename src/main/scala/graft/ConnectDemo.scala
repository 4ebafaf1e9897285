package graft

import org.apache.spark.sql.SparkSession

/**
 * Spark Connect client demo — the SECOND distribution surface SURVEY §3.3
 * names (alongside the Thrift/JDBC server, reference Flight SQL:
 * scheduler/src/flight_sql.rs:87): a thin gRPC client drives a remote
 * Spark Connect server with the SAME unified `SparkSession` API this
 * library is written against.
 *
 * This main is pure CLIENT code: it compiles against the classic jars but
 * at runtime only needs `spark-connect-client-jvm` on the classpath —
 * `builder().remote("sc://…")` dispatches to the Connect implementation.
 * Launch the paired server + this client with `tools/connect_demo.sh`,
 * which prints CONNECT_DEMO_OK on success.
 */
object ConnectDemo {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.getOrElse("15002")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    // api.mode must be set through the BUILDER: the unified builder only
    // inspects its own config calls (not system properties) when picking
    // the classic vs Connect companion
    val spark = SparkSession.builder()
      .config("spark.api.mode", "connect")
      .remote(s"sc://localhost:$port")
      .getOrCreate()
    try {
      // relations + temp views live in the SERVER session; this process
      // only holds a gRPC channel
      spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("nation")
      val rows = spark.sql(
        """SELECT n_regionkey, count(*) AS n FROM nation
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin).collect()
      rows.foreach(r => println(s"${r.get(0)}\t${r.get(1)}"))
      require(rows.length == 5, s"expected 5 region groups over Connect, got ${rows.length}")
      require(rows.map(_.getLong(1)).sum == 25L, "expected 25 nations total over Connect")
      println("CONNECT_DEMO_OK")
    } finally spark.stop()
  }
}
