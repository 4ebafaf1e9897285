package graft

/** r19 optimization scratch: isolate registry queries — warm timings via
  * the noop sink plus a formatted-plan dump per query.
  * Usage: SF=/root/testdata/sf0.1 CPUS=32 ITERS=3 PLAN_DIR=plans/r19 \
  *        PLAN_SUFFIX=before tools/run.sh graft.Scratch q1 q2 ...
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SF", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val iters = sys.env.getOrElse("ITERS", "3").toInt
    val planDir = sys.env.get("PLAN_DIR")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
    val byName = queries.Registry.all.map(q => q.name -> q).toMap
    args.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n"))
      planDir.foreach { d =>
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$d/${q.name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        spark.catalog.clearCache()
      }
      val planOnly = sys.env.contains("PLAN_ONLY")
      val times = (1 to iters).map { _ =>
        try {
          spark.sparkContext.setJobDescription(q.name)
          val t0 = System.nanoTime()
          if (planOnly) { q.run(spark, sfDir).queryExecution.executedPlan; () }
          else q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally spark.catalog.clearCache()
      }
      println(f"${q.name}%-28s " + times.map(t => f"$t%6.3f").mkString(" "))
    }
    spark.stop()
  }
}
