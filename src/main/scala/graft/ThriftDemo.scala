package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

/**
 * Distribution-surface demo: the reference exposes its engine to external
 * clients over Flight SQL / JDBC (reference
 * ballista/scheduler/src/flight_sql.rs:87, `ballista-cli`); Spark's
 * equivalent surface is the Hive Thrift server (JDBC/ODBC) and Spark
 * Connect. This main starts a Thrift server ON a GraftSession — temp
 * views, graft UDFs and all — and queries it back over plain JDBC
 * (`org.apache.hive.jdbc.HiveDriver`), proving an external BI tool /
 * JDBC client could run every registry query against this engine.
 *
 * Usage: tools/run.sh graft.ThriftDemo [sfDir] — prints the JDBC rows and
 * `THRIFT_DEMO_OK` on success.
 */
object ThriftDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = 10000 + (System.nanoTime() % 5000).toInt
    // Derby metastore state + warehouse go to a throwaway dir, not cwd.
    val scratch = java.nio.file.Files.createTempDirectory("graft_thrift").toString
    System.setProperty("derby.system.home", scratch)

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-thrift-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      // JDBC sessions share THIS session's state (temp views, UDFs) —
      // the same registered-tables model the reference's clients see.
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      .config("hive.server2.thrift.port", port.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = GraftSession.wrap(spark)
    g.registerTables(sfDir)

    org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)

    // Wait for the listener, then act as an external JDBC client.
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val url = s"jdbc:hive2://localhost:$port/default"
    val conn = {
      var attempt = 0
      var c: java.sql.Connection = null
      while (c == null) {
        try c = DriverManager.getConnection(url, "graft", "")
        catch {
          case e: Exception if attempt < 60 =>
            attempt += 1; Thread.sleep(500)
          case e: Exception => throw e
        }
      }
      c
    }
    try {
      val st = conn.createStatement()
      // a real aggregation over the registered views, through the wire
      val rs = st.executeQuery(
        """SELECT r_name, count(*) AS n_nations
          |FROM region JOIN nation ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin)
      var rows = 0
      while (rs.next()) {
        println(s"${rs.getString(1)}\t${rs.getLong(2)}")
        rows += 1
      }
      require(rows == 5, s"expected 5 regions over JDBC, got $rows")
      // graft's registered parity functions work through the wire too
      val rs2 = st.executeQuery("SELECT CAST(approx_distinct(n_name) AS BIGINT) FROM nation")
      require(rs2.next() && rs2.getLong(1) == 25L, "approx_distinct over JDBC")
      println("THRIFT_DEMO_OK")
    } finally {
      conn.close()
      spark.stop()
    }
  }
}
