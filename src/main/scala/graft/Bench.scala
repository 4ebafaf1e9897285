package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: times each benchmarkable registry query at
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line. Honest measurement
 * (fixes VERDICT r1 "What's wrong" #3-4):
 *
 *  - results are forced through the noop sink — every column is computed
 *    and materialized, nothing is answered from parquet metadata the way
 *    a bare `.count()` would be;
 *  - a failing query is recorded as -1.0 with its error class in an
 *    `"errors"` map, never as a fast success.
 */
object Bench {

  /** The budget gate's loadavg threshold (`max_loadavg_for_gate` in
    * BENCH_BUDGET.json; the gate's own default when absent). */
  def maxLoadForGate(budgetPath: String): Double =
    try {
      val f = new java.io.File(budgetPath)
      if (!f.isFile) 2.0
      else Option(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(f).get("max_loadavg_for_gate"))
        .map(_.asDouble).getOrElse(2.0)
    } catch { case _: Throwable => 2.0 }

  /** Where the per-query detail goes. A CONTENDED run (loadavg_start
    * above the budget gate's threshold) must never overwrite the
    * gateable detail file: BenchBudgetSpec self-skips on a contended
    * detail, so an overwrite would disarm the live gate until the next
    * regen (every driver bench run did exactly that — VERDICT r8). The
    * contended result is still written, to a `.contended` side file,
    * so the run stays diagnosable. */
  def detailTarget(requested: String, loadavgStart: Double,
                   maxLoad: Double): String =
    if (loadavgStart <= maxLoad) requested
    else if (requested.endsWith(".json"))
      requested.stripSuffix(".json") + ".contended.json"
    else requested + ".contended"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = queries.Registry.all.filter(_.bench).sortBy(_.name)
    // Reference methodology: the tpch harness runs multiple iterations per
    // query and reports the aggregate (reference:
    // benchmarks/src/bin/tpch.rs:286-350, default 3 iterations). We run 2
    // and report the min so one-time JIT/codegen compilation isn't billed
    // as engine throughput.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt

    def loadavg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadavg

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val allTimes = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val results = qs.map { q =>
      try {
        val times = (1 to iters).map { _ =>
          try {
            val t0 = System.nanoTime()
            q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } finally {
            // Drop persisted intermediates (near-dup shingle sets) INSIDE
            // the iteration loop: iteration 2 must recompute from source,
            // not report a cached-run time as engine throughput.
            spark.catalog.clearCache()
          }
        }
        allTimes(q.name) = times
        q.name -> times.min
      } catch {
        case e: Throwable =>
          errors(q.name) = e.getClass.getSimpleName
          spark.catalog.clearCache()
          q.name -> -1.0
      }
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def jnum(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val eJson = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum

    // The driver captures only the LAST 2000 chars of stdout and parses the
    // JSON line out of that window (BENCH_r03: a full per-query map pushed
    // the line past the window and the round's numbers were unparseable).
    // So stdout carries a compact line — total + the headline queries — and
    // the complete per-query/per-iteration detail goes to a file in the
    // repo, which the driver's end-of-round commit picks up.
    val headline: Set[String] =
      (1 to 22).map(i => s"tpch_q$i").toSet ++ Set(
        "dedup_minhash", "dedup_embedding", "embed_ivf_topk",
        "embed_knn_brute", "text_quality", "h2o_q10")
    val qJson = results.collect { case (k, v) if headline(k) => s""""$k":${jnum(v)}""" }
      .mkString("{", ",", "}")
    val tJson = allTimes.map { case (k, ts) =>
      s""""$k":${ts.map(jnum).mkString("[", ",", "]")}""" }.mkString("{", ",", "}")
    val allJson = results.map { case (k, v) => s""""$k":${jnum(v)}""" }.mkString("{", ",", "}")
    val detailReq = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val detailPath = detailTarget(detailReq, loadStart,
      maxLoadForGate("BENCH_BUDGET.json"))
    if (detailPath != detailReq)
      System.err.println(f"contended run (loadavg_start $loadStart%.2f): " +
        s"writing $detailPath and leaving the gateable $detailReq untouched")
    val detail =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$allJson,"errors":$eJson,"iterations":$iters,"times":$tJson,"loadavg_start":${jnum(loadStart)},"loadavg_end":${jnum(loadavg)},"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(detailPath),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"detail write failed: $e") }

    val loadEnd = loadavg
    // Stop BEFORE printing the JSON line so executor-shutdown log noise
    // can't land between the line and the end of stdout (the driver parses
    // the line out of the last 2000 chars).
    spark.stop()
    // loadavg start/end make a contended run diagnosable from the artifact
    // alone (VERDICT r2: a 78× swing on an unchanged binary was load).
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qJson,"errors":$eJson,"n_queries":${results.size},"iterations":$iters,"detail":"$detailPath","loadavg_start":${jnum(loadStart)},"loadavg_end":${jnum(loadEnd)},"sf":"$sfDir"}""")
  }
}
