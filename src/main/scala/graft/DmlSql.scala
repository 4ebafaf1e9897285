package graft

/**
 * SQL DML surface for registered native-Iceberg tables: `DELETE FROM`,
 * `UPDATE ... SET`, and the canonical whole-row `MERGE INTO` form,
 * parsed here and routed to [[graft.sources.IcebergWrite]]'s
 * merge-on-read verbs by [[GraftSession.sql]]. Spark's own parser
 * accepts these statements only for DSv2 catalogs with write support;
 * the session façade translates them for its rule-based scan views the
 * same way it translates the reference dialect's
 * `CREATE EXTERNAL TABLE` (reference runs DML through its SQL context,
 * client/src/context.rs:377-521).
 *
 * Deliberately conservative grammar: expressions (the WHERE condition,
 * SET right-hand sides) pass through verbatim to `expr(...)` — Spark's
 * full expression language works — while the statement SHAPE is
 * anchored regex, so anything unrecognized falls through to spark.sql
 * untouched and fails with Spark's own message.
 */
object DmlSql {

  sealed trait Stmt
  /** `INSERT INTO t <query>` — positional column alignment, like SQL.
    * Claimed only when `t` is a REGISTERED Iceberg table (the session
    * falls through to spark.sql otherwise — catalog parquet tables keep
    * Spark's own INSERT path). */
  final case class Insert(table: String, query: String) extends Stmt
  final case class Delete(table: String, where: Option[String]) extends Stmt
  final case class Update(table: String, sets: Seq[(String, String)],
                          where: Option[String]) extends Stmt
  /** `MERGE INTO t [AS a] USING s [AS b] ON <equi keys>
    *  WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
    * — the whole-row upsert form; keyCols extracted from the ON spine. */
  final case class Merge(target: String, source: String,
                         keyCols: Seq[String]) extends Stmt

  private val InsertRe =
    """(?is)^\s*INSERT\s+INTO\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_]*)\s+((?:SELECT|VALUES|WITH|FROM|TABLE)\b.+?)\s*;?\s*$""".r
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+?)\s*;?\s*$""".r
  private val MergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+(\w+)|\s+(\w+))?""" +
     """\s+USING\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+(\w+)|\s+(\w+))?""" +
     """\s+ON\s+(.+?)""" +
     """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
     """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$""").r

  /** None = not a DML statement shape this surface owns. */
  def parse(sql: String): Option[Stmt] = sql match {
    case InsertRe(t, query) => Some(Insert(t, query.trim))
    case DeleteRe(t, where) =>
      Some(Delete(t, Option(where).map(_.trim).filter(_.nonEmpty)))
    case UpdateRe(t, rest) =>
      // the SET/WHERE boundary needs a QUOTE-AWARE scan — a regex split
      // would cut inside `SET a = 'x WHERE y'`
      val (setList, where) = splitAtTopLevelWhere(rest)
      val sets = splitTopLevel(setList).map { a =>
        val i = a.indexOf('=')
        require(i > 0, s"malformed SET assignment: '$a'")
        val lhs = a.substring(0, i).trim
        require(lhs.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"SET target must be a plain column name, got '$lhs'")
        lhs -> a.substring(i + 1).trim
      }
      Some(Update(t, sets, where))
    case MergeRe(t, ta1, ta2, s, sa1, sa2, on) =>
      val tAlias = Seq(Option(ta1), Option(ta2)).flatten.headOption.getOrElse(t)
      val sAlias = Seq(Option(sa1), Option(sa2)).flatten.headOption.getOrElse(s)
      Some(Merge(t, s, mergeKeys(on.trim, tAlias, sAlias)))
    case _ => None
  }

  /** ON clause of the canonical merge: a pure-AND spine of
    * `t.col = s.col` equalities naming the SAME column on both sides
    * (that is what a keyed upsert means); anything else is refused
    * loudly rather than silently mis-keyed. */
  private def mergeKeys(on: String, tAlias: String, sAlias: String): Seq[String] = {
    val eq = """(?i)\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*""".r
    on.split("(?i)\\s+AND\\s+").toSeq.map {
      case eq(q1, c1, q2, c2) =>
        val ok =
          (q1.equalsIgnoreCase(tAlias) && q2.equalsIgnoreCase(sAlias) && c1.equalsIgnoreCase(c2)) ||
          (q1.equalsIgnoreCase(sAlias) && q2.equalsIgnoreCase(tAlias) && c1.equalsIgnoreCase(c2))
        require(ok, s"MERGE ON term '$q1.$c1 = $q2.$c2' is not a " +
          s"target/source equality on one column (aliases: $tAlias, $sAlias)")
        c1
      case other => throw new IllegalArgumentException(
        s"MERGE ON supports a pure-AND spine of t.col = s.col equalities; got '$other'")
    }
  }

  /** Split `rest` (everything after SET) at the FIRST top-level WHERE
    * keyword — outside parens and single-quoted strings, delimited by
    * whitespace on both sides. No top-level WHERE = update-all. */
  private[graft] def splitAtTopLevelWhere(rest: String): (String, Option[String]) = {
    var depth = 0; var inStr = false
    var i = 0
    while (i < rest.length) {
      val c = rest.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && (c == 'w' || c == 'W') &&
            i >= 1 && rest.charAt(i - 1).isWhitespace &&
            i + 5 < rest.length &&
            rest.substring(i, i + 5).equalsIgnoreCase("WHERE") &&
            rest.charAt(i + 5).isWhitespace =>
          return (rest.substring(0, i).trim,
            Some(rest.substring(i + 5).trim).filter(_.nonEmpty))
        case _ =>
      }
      i += 1
    }
    (rest.trim, None)
  }

  /** Split on top-level commas only — parens and single-quoted strings
    * guard nested commas (`SET a = coalesce(x, 0), b = 'p,q'`). */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\'') inStr = false
      } else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start).trim
    out.result().filter(_.nonEmpty)
  }
}
