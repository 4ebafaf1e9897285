package graft

/** Scratchpad main — overwrite freely (repo convention). Currently:
  * refresh ONE entry's oracle SQL inside an existing Verify dump's
  * oracle_sql.json so `check.py --no-verify <name>` re-compares against
  * the recompiled SQL without a full Spark rerun. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val Array(outDir, name) = args.take(2)
    val sql = SparkEntry.oracleSql(name)
    val p = java.nio.file.Paths.get(s"$outDir/oracle_sql.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root.put(name, sql)
    java.nio.file.Files.write(p, om.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    println(s"refreshed oracle for $name in $p")
  }
}
