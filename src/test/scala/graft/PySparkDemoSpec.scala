package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/**
 * PySpark client surface as a REGRESSION TEST — the documented analog
 * of the reference's Python bindings (PyBallista,
 * python/src/context.rs:48-330), closing the last undemonstrated
 * client row alongside [[ThriftServerSpec]] (JDBC) and
 * [[ConnectServerSpec]] (Spark Connect).
 *
 * Runs `tools/pyspark_demo.py` in a SEPARATE Python-driven JVM: the
 * py4j gateway wraps graft's session facade, CTAS writes a real
 * Iceberg table through the native writer, DELETE commits a
 * position-delete snapshot, and both the graft and plain-PySpark SQL
 * surfaces read the merge-on-read result. Cancels (does not fail) when
 * pyspark is not installed, mirroring the other client specs'
 * availability guards.
 */
class PySparkDemoSpec extends AnyFunSuite {

  test("pyspark drives graft's SQL surface through the py4j gateway") {
    val script = new File("tools/pyspark_demo.py")
    assume(script.isFile, s"demo script missing: $script")
    val probe = scala.sys.process.Process(
      Seq("python3", "-c", "import pyspark")).!
    assume(probe == 0, "pyspark not installed in python3")
    val out = new StringBuilder
    val logger = scala.sys.process.ProcessLogger(
      l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val rc = scala.sys.process.Process(
      Seq("python3", script.getPath)).!(logger)
    assert(rc == 0, s"pyspark_demo.py exited $rc; output:\n$out")
    assert(out.toString.contains("PYSPARK_DEMO_OK"),
      s"demo never confirmed the round-trip; output:\n$out")
  }
}
