package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (unset on the driver): dump only these names.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var errors = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Files.deleteIfExists(Paths.get(s"$outDir/$name._ERROR"))
      } catch { case e: Throwable =>
        // A thrown query must be a LOUD red row, not an invisible one
        // (round-11 lesson: six entries crashed here and silently
        // vanished from the driver's correctness file). Remove any
        // partial result dir — its presence would fool the gate's
        // missing-output check — and leave an explicit marker file.
        errors += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = Paths.get(s"$outDir/$name")
        if (Files.exists(dir)) {
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
        }
        Files.writeString(Paths.get(s"$outDir/$name._ERROR"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
      // Queries that persist() intermediates (minhash/ngram shingle sets)
      // must not stay resident for the remaining ~100 queries of the run
      // (mirrors Bench's per-query clearCache).
      finally spark.catalog.clearCache()
    }
    if (errors > 0)
      System.err.println(s"[verify] $errors quer${if (errors == 1) "y" else "ies"} FAILED (see *._ERROR markers in $outDir)")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
