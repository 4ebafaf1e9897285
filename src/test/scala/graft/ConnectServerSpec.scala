package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/**
 * Spark Connect distribution surface as a REGRESSION TEST (the second
 * external-client surface SURVEY §3.3 names, alongside the Thrift/JDBC
 * server covered by [[ThriftServerSpec]]; reference Flight SQL analog:
 * scheduler/src/flight_sql.rs:87).
 *
 * Runs `tools/connect_demo.sh`: a Spark Connect gRPC server JVM on a
 * probe-bound free port plus a separate thin-client JVM
 * ([[ConnectDemo]], only `spark-connect-client-jvm` + classes on its
 * classpath) driving it over `sc://`. The two-JVM split is the point —
 * it proves the client truly speaks gRPC rather than falling back to a
 * classic in-process session (the silent-fallback trap documented in
 * CLAUDE.md). Cancels (does not fail) when the thin-client jar is not
 * shipped, mirroring ThriftServerSpec's availability guard.
 */
class ConnectServerSpec extends AnyFunSuite {

  test("spark connect server + thin client round-trip over gRPC") {
    val clientJar = new File(
      "/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar")
    assume(clientJar.isFile, s"connect thin-client jar not shipped: $clientJar")
    val script = new File("tools/connect_demo.sh")
    assume(script.isFile, s"demo script missing: $script")
    val out = new StringBuilder
    val logger = scala.sys.process.ProcessLogger(
      l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val rc = scala.sys.process.Process(Seq("bash", script.getPath)).!(logger)
    assert(rc == 0, s"connect_demo.sh exited $rc; output:\n$out")
    assert(out.toString.contains("CONNECT_DEMO_OK"),
      s"client never confirmed the round-trip; output:\n$out")
  }
}
