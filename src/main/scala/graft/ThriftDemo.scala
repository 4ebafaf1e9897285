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
 * `THRIFT_DEMO_OK` on success. The JDBC plumbing lives in `withJdbc` so
 * `ThriftServerSpec` regression-tests the same surface in `sbt test`.
 */
object ThriftDemo {

  /** Probe-bind an ephemeral port (bind 0 → read assigned → close):
    * guessing inside a fixed range can land on an occupied port, leaving
    * the server failing to bind while the client retries against nothing
    * — or worse, talking to a foreign service already listening there. */
  def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Start a Thrift server for `spark` on `port`, hand an external JDBC
    * connection's Statement to `f`, then stop the server. The connect
    * loop is bounded (~15 s): the port is pre-probed free, so a server
    * that never comes up is a startup failure, not something to wait
    * out for minutes. */
  def withJdbc[A](spark: SparkSession, port: Int)(f: java.sql.Statement => A): A = {
    // startWithContext reads the port from the Hive conf, which is
    // seeded from both the SQL conf and system properties — set both.
    spark.conf.set("hive.server2.thrift.port", port.toString)
    System.setProperty("hive.server2.thrift.port", port.toString)
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      var attempt = 0
      var conn: java.sql.Connection = null
      while (conn == null) {
        try conn = DriverManager.getConnection(url, "graft", "")
        catch {
          case _: Exception if attempt < 30 => attempt += 1; Thread.sleep(500)
          case e: Exception => throw e
        }
      }
      try f(conn.createStatement())
      finally conn.close()
    } finally server.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Derby metastore state + warehouse go to a throwaway dir, not cwd.
    val scratch = java.nio.file.Files.createTempDirectory("graft_thrift").toString
    System.setProperty("derby.system.home", scratch)

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-thrift-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      // JDBC sessions share THIS session's state (temp views, UDFs) —
      // the same registered-tables model the reference's clients see.
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = GraftSession.wrap(spark)
    g.registerTables(sfDir)

    withJdbc(spark, freePort()) { st =>
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
    }
    spark.stop()
  }
}
