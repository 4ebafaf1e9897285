package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Regression test for the external-client distribution surface
 * (reference: Flight SQL / JDBC, scheduler/src/flight_sql.rs:87): start
 * a Hive Thrift server on the shared test session and query it back over
 * plain JDBC, in-process. Port-collision-safe (probe-bound ephemeral
 * port via ThriftDemo.freePort) and CANCELED — not failed — if the
 * server can't come up in this environment; assertion failures inside
 * the JDBC exchange still fail normally.
 *
 * The shared test session lacks `thriftServer.singleSession` (a static
 * conf), so each JDBC connection gets fresh session state: plain temp
 * views are NOT visible. The spec therefore exercises the two surfaces
 * an external client genuinely has against a multi-session server —
 * global temp views and direct `parquet.`path`` scans.
 */
class ThriftServerSpec extends AnyFunSuite {

  test("external JDBC client queries the engine through the Thrift server") {
    val spark = TestSpark.spark
    // Derby metastore scratch must not land in cwd.
    val scratch = java.nio.file.Files.createTempDirectory("graft_thrift_spec").toString
    System.setProperty("derby.system.home", scratch)

    spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .createOrReplaceGlobalTempView("g_nation")

    try {
      ThriftDemo.withJdbc(spark, ThriftDemo.freePort()) { st =>
        // 1. global temp view through the wire
        val rs = st.executeQuery("SELECT count(*) AS n FROM global_temp.g_nation")
        assert(rs.next() && rs.getLong(1) == 25L, "global temp view over JDBC")

        // 2. aggregation over a direct parquet-path scan
        val rs2 = st.executeQuery(
          s"""SELECT n_regionkey, count(*) AS n
             |FROM parquet.`${TestSpark.sfDir}/nation.parquet`
             |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
        var rows = 0
        var total = 0L
        while (rs2.next()) { rows += 1; total += rs2.getLong(2) }
        assert(rows == 5, s"expected 5 region groups over JDBC, got $rows")
        assert(total == 25L, s"expected 25 nations total over JDBC, got $total")
      }
    } catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case e: Exception =>
        cancel(s"thrift server unavailable in this environment: ${e.getMessage}")
    }
  }
}
