package graft

/**
 * Translates the reference dialect
 *   `CREATE EXTERNAL TABLE [IF NOT EXISTS] t [(c1 T1, ...)]
 *    STORED AS {CSV|PARQUET|AVRO|NDJSON|JSON} [WITH HEADER ROW]
 *    [DELIMITER 'x'] [PARTITIONED BY (...)] LOCATION 'path'`
 * (reference: ballista/client/src/context.rs:416-484, which accepts the
 * DataFusion `CreateExternalTable` statement and registers a listing
 * table) into Spark DDL
 *   `CREATE TABLE t [(schema)] USING fmt OPTIONS (path '...', ...)`.
 *
 * Spark's `CREATE TABLE ... USING ... OPTIONS(path ...)` has the same
 * semantics: an unmanaged table over existing files, schema declared or
 * inferred, `IF NOT EXISTS` honored, error on duplicate otherwise —
 * matching the reference's already-exists behavior (context.rs:470-481).
 */
object ExternalTableDdl {

  private val head =
    """(?is)^\s*CREATE\s+EXTERNAL\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*(.*)$""".r

  /** `CREATE EXTERNAL TABLE [IF NOT EXISTS] t STORED AS ICEBERG
    * LOCATION 'path' [AS <query>]` → (ifNotExists, name, location,
    * ctasQuery). Handled apart from [[translate]] because Iceberg has
    * no Spark `USING` connector in this repo — the session registers
    * the live rule-based scan view instead (and for the CTAS form,
    * creates + populates the table from the query first). A column
    * list is rejected: the table's own metadata (or the CTAS query's
    * schema) is the schema authority — declaring a conflicting one
    * would silently mislead. */
  def translateIceberg(sql: String): Option[(Boolean, String, String, Option[String])] =
    sql match {
      case head(ifNotExists, name, rest)
          if """(?is)STORED\s+AS\s+ICEBERG\b""".r.findFirstIn(rest).isDefined =>
        require(!rest.trim.startsWith("("),
          "STORED AS ICEBERG takes no column list — the schema comes " +
            "from the table's own metadata")
        val location = """(?is)LOCATION\s+'([^']*)'""".r
          .findFirstMatchIn(rest).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(
            s"CREATE EXTERNAL TABLE requires LOCATION: $sql"))
        val ctas = """(?is)\bAS\s+((?:SELECT|WITH|VALUES|FROM|TABLE)\b.+?)\s*;?\s*$""".r
          .findFirstMatchIn(rest).map(_.group(1).trim)
        Some((ifNotExists != null, name, location, ctas))
      case _ => None
    }

  /** Returns Some(sparkSql) if this is a reference-dialect CREATE EXTERNAL
    * TABLE, None to pass the statement through to Spark untouched.
    * `STORED AS AVRO` translates to `USING avro`, which resolves to
    * [[graft.sources.AvroDataSourceV2]] (the session façade removes
    * `avro` from `spark.sql.sources.useV1SourceList`). */
  def translate(sql: String): Option[String] = sql match {
    case head(ifNotExists, name, rest) =>
      var r = rest.trim
      // optional column list: consume a balanced (...) prefix, ignoring
      // parens inside single-quoted literals (a column COMMENT or DEFAULT
      // containing ')' must not end the scan)
      val (colList, afterCols) =
        if (r.startsWith("(")) {
          var depth = 0; var i = 0; var inQuote = false
          var done = false
          while (i < r.length && !done) {
            r.charAt(i) match {
              case '\'' => inQuote = !inQuote
              case '(' if !inQuote => depth += 1
              case ')' if !inQuote =>
                depth -= 1
                if (depth == 0) done = true
              case _ =>
            }
            i += 1
          }
          (Some(r.substring(0, i)), r.substring(i).trim)
        } else (None, r)
      r = afterCols

      def find(re: scala.util.matching.Regex): Option[String] =
        re.findFirstMatchIn(r).map(_.group(1))

      val fmt = find("""(?is)STORED\s+AS\s+(\w+)""".r)
        .getOrElse(throw new IllegalArgumentException(
          s"CREATE EXTERNAL TABLE requires STORED AS: $sql"))
      val location = find("""(?is)LOCATION\s+'([^']*)'""".r)
        .getOrElse(throw new IllegalArgumentException(
          s"CREATE EXTERNAL TABLE requires LOCATION: $sql"))
      val delimiter = find("""(?is)DELIMITER\s+'([^']*)'""".r)
      val header = """(?is)WITH\s+HEADER\s+ROW""".r.findFirstIn(r).isDefined
      val partitionCols = find("""(?is)PARTITIONED\s+BY\s*\(([^)]*)\)""".r)

      val sparkFmt = fmt.toLowerCase match {
        case "csv"              => "csv"
        case "parquet"          => "parquet"
        case "avro"             => "avro"
        case "json" | "ndjson"  => "json"
        case other => throw new IllegalArgumentException(s"unsupported format $other")
      }
      val opts = Seq(
        Some(s"path '${location.replace("'", "''")}'"),
        if (sparkFmt == "csv") Some(s"header '${header.toString}'") else None,
        delimiter.map(d => s"delimiter '$d'"),
        if (sparkFmt == "csv" && colList.isEmpty) Some("inferSchema 'true'") else None
      ).flatten.mkString(", ")

      val ine = if (ifNotExists != null) "IF NOT EXISTS " else ""
      val cols = colList.map(c => s" ${normalizeTypes(c)}").getOrElse("")
      val part = partitionCols.map(p => s" PARTITIONED BY ($p)").getOrElse("")
      Some(s"CREATE TABLE $ine$name$cols USING $sparkFmt OPTIONS ($opts)$part")
    case _ => None
  }

  /** Map reference-dialect (DataFusion/Arrow) column types that Spark DDL
    * rejects or misreads onto Spark types (SURVEY §1 type table):
    * bare VARCHAR/TEXT (Spark VARCHAR needs a length) → STRING, unsigned
    * ints → the next wider signed type, REAL → FLOAT. Applied ONLY to the
    * type portion of each column definition — a column NAMED `text` or
    * `real` (this repo's own documents table has a `text` column) must
    * not be rewritten; quoted literals (COMMENTs) are left alone too. */
  private[graft] def normalizeTypes(colList: String): String = {
    val rules: Seq[(String, String)] = Seq(
      """(?i)^VARCHAR\b(?!\s*\()""" -> "STRING",
      """(?i)^TEXT\b""" -> "STRING",
      """(?i)^TINYINT\s+UNSIGNED\b""" -> "SMALLINT",
      """(?i)^SMALLINT\s+UNSIGNED\b""" -> "INT",
      """(?i)^(INT|INTEGER)\s+UNSIGNED\b""" -> "BIGINT",
      """(?i)^BIGINT\s+UNSIGNED\b""" -> "DECIMAL(20,0)",
      """(?i)^REAL\b""" -> "FLOAT",
      """(?i)^BYTEA\b""" -> "BINARY")
    val inner = colList.trim.stripPrefix("(").stripSuffix(")")
    // split at top-level commas (not inside parens or quotes)
    val cols = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var inQuote = false; var start = 0
    for (i <- inner.indices) inner.charAt(i) match {
      case '\'' => inQuote = !inQuote
      case '(' if !inQuote => depth += 1
      case ')' if !inQuote => depth -= 1
      case ',' if !inQuote && depth == 0 =>
        cols += inner.substring(start, i); start = i + 1
      case _ =>
    }
    cols += inner.substring(start)
    val out = cols.map { c =>
      val t = c.trim
      // name = first token (optionally backquoted); the rest is the type
      // (+ modifiers) — rules anchor at the start of the type portion.
      val m = """^(`[^`]+`|\S+)\s+(.*)$""".r.findFirstMatchIn(t)
      m match {
        case Some(g) =>
          val typed = rules.foldLeft(g.group(2)) {
            case (s, (re, to)) => s.replaceAll(re, to)
          }
          s"${g.group(1)} $typed"
        case None => t
      }
    }
    out.mkString("(", ", ", ")")
  }
}
