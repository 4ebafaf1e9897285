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
  /** `INSERT OVERWRITE t <query>` — replace the table's live content
    * with the query result in one snapshot (prior snapshots stay
    * time-travelable). */
  final case class InsertOverwrite(table: String, query: String) extends Stmt
  /** `TRUNCATE TABLE t` — remove all live rows. Metadata-only at the
    * session layer: an overwrite snapshot carrying no files. */
  final case class Truncate(table: String) extends Stmt
  final case class Delete(table: String, where: Option[String]) extends Stmt
  final case class Update(table: String, sets: Seq[(String, String)],
                          where: Option[String]) extends Stmt
  /** One parsed `WHEN` clause of a MERGE; `cond` is the optional
    * `AND <expr>` text, passed through verbatim. */
  sealed trait MergeWhen { def cond: Option[String] }
  /** `WHEN MATCHED [AND c] THEN UPDATE SET *` (star = true) or
    * `... UPDATE SET col = expr, ...`. */
  final case class WhenUpdate(cond: Option[String],
                              sets: Seq[(String, String)],
                              star: Boolean) extends MergeWhen
  /** `WHEN MATCHED [AND c] THEN DELETE`. */
  final case class WhenDelete(cond: Option[String]) extends MergeWhen
  /** `WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT *` (star = true)
    * or `... INSERT (cols) VALUES (exprs)`. */
  final case class WhenInsert(cond: Option[String],
                              cols: Seq[String], exprs: Seq[String],
                              star: Boolean) extends MergeWhen
  /** `WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE` — the full-sync
    * shape: target rows absent from the source drop. */
  final case class WhenSourceDelete(cond: Option[String]) extends MergeWhen
  /** `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET col = expr, ...`
    * — flag/retire target rows absent from the source (expressions see
    * the TARGET alias only). */
  final case class WhenSourceUpdate(cond: Option[String],
                                    sets: Seq[(String, String)]) extends MergeWhen

  /** `MERGE INTO t [AS a] USING s [AS b] ON <equi keys> WHEN ...` —
    * keyCols extracted from the ON spine; clauses in statement order
    * (first applicable wins per row, ANSI semantics). The canonical
    * whole-row pair (UPDATE SET * / INSERT *, both unconditional)
    * routes to the upsert fast path at the session layer. */
  final case class Merge(target: String, source: String,
                         keyCols: Seq[String],
                         targetAlias: String, sourceAlias: String,
                         clauses: Seq[MergeWhen]) extends Stmt

  /** `ALTER TABLE t ADD COLUMN name TYPE [DEFAULT lit]` — metadata-only
    * schema evolution on a registered Iceberg table (claimed, like
    * INSERT, only for registered names; catalog tables keep Spark's
    * ALTER). `default` is the optional literal text after `DEFAULT`,
    * passed through verbatim (v3 column defaults — pre-existing rows
    * read it, omitting writers fill it). */
  final case class AlterAddColumn(table: String, colName: String,
                                  colType: String,
                                  default: Option[String]) extends Stmt
  /** `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b]` — routes
    * to [[graft.sources.IcebergWrite.computeTableStats]] on REGISTERED
    * Iceberg tables (catalog tables keep Spark's own ANALYZE). */
  final case class AnalyzeTable(table: String,
                                columns: Seq[String]) extends Stmt
  /** `SHOW TBLPROPERTIES t` — table properties of a registered Iceberg
    * table from its metadata.json (Spark's native form cannot serve a
    * temp view; catalog tables keep Spark's). */
  final case class ShowTblProperties(table: String) extends Stmt
  /** `ALTER TABLE t RENAME COLUMN a TO b` (needs field-id resolution). */
  final case class AlterRenameColumn(table: String, from: String,
                                     to: String) extends Stmt
  /** `ALTER TABLE t DROP COLUMN a`. */
  final case class AlterDropColumn(table: String, colName: String) extends Stmt
  /** `ALTER TABLE t ALTER COLUMN a TYPE <type>` — spec type promotion. */
  final case class AlterWidenColumn(table: String, colName: String,
                                    colType: String) extends Stmt
  /** `CALL system.<proc>('table', args...)` — the runtime-jar Spark
    * procedure surface for table maintenance, over registered names.
    * Args are literal strings/numbers, parsed at the session layer. */
  final case class Call(procedure: String, args: Seq[String]) extends Stmt

  private val InsertRe =
    """(?is)^\s*INSERT\s+INTO\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_]*)\s+((?:SELECT|VALUES|WITH|FROM|TABLE)\b.+?)\s*;?\s*$""".r
  private val InsertOverwriteRe =
    """(?is)^\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_]*)\s+((?:SELECT|VALUES|WITH|FROM|TABLE)\b.+?)\s*;?\s*$""".r
  private val TruncateRe =
    """(?is)^\s*TRUNCATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val AlterRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)\s*;?\s*$""".r
  // the reluctant type group makes the FIRST top-level `DEFAULT` the
  // split point — a DEFAULT inside the literal text stays in the literal
  private val AddColRe =
    """(?is)^ADD\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)(?:\s+DEFAULT\s+(.+))?$""".r
  private val RenameColRe =
    """(?is)^RENAME\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
  private val DropColRe =
    """(?is)^DROP\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
  private val WidenColRe =
    """(?is)^ALTER\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TYPE\s+(.+)$""".r
  private val CallRe =
    """(?is)^\s*CALL\s+(?:graft\.)?system\.([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*;?\s*$""".r
  private val AnalyzeRe =
    ("""(?is)^\s*ANALYZE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+COMPUTE\s+""" +
     """STATISTICS(?:\s+FOR\s+COLUMNS\s+(.+?))?\s*;?\s*$""").r
  private val ShowTblPropsRe =
    """(?is)^\s*SHOW\s+TBLPROPERTIES\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+?)\s*;?\s*$""".r
  private val MergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+(\w+)|\s+(\w+))?""" +
     """\s+USING\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+(\w+)|\s+(\w+))?""" +
     """\s+ON\s+(.+?)\s+WHEN\s+(.+?)\s*;?\s*$""").r

  /** None = not a DML statement shape this surface owns. */
  def parse(sql: String): Option[Stmt] = sql match {
    case InsertRe(t, query) => Some(Insert(t, query.trim))
    case InsertOverwriteRe(t, query) => Some(InsertOverwrite(t, query.trim))
    case TruncateRe(t) => Some(Truncate(t))
    case AlterRe(t, action) => action.trim match {
      case AddColRe(name, tpe, dflt) =>
        Some(AlterAddColumn(t, name, tpe.trim,
          Option(dflt).map(_.trim).filter(_.nonEmpty)))
      case RenameColRe(from, to) => Some(AlterRenameColumn(t, from, to))
      case DropColRe(name) => Some(AlterDropColumn(t, name))
      case WidenColRe(name, tpe) => Some(AlterWidenColumn(t, name, tpe.trim))
      case _ => None // other ALTER forms stay Spark's
    }
    case CallRe(proc, args) =>
      Some(Call(proc.toLowerCase(java.util.Locale.ROOT),
        splitTopLevel(args)))
    case AnalyzeRe(t, cols) =>
      Some(AnalyzeTable(t, Option(cols).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)))
    case ShowTblPropsRe(t) => Some(ShowTblProperties(t))
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
    case MergeRe(t, ta1, ta2, s, sa1, sa2, on, whens) =>
      val tAlias = Seq(Option(ta1), Option(ta2)).flatten.headOption.getOrElse(t)
      val sAlias = Seq(Option(sa1), Option(sa2)).flatten.headOption.getOrElse(s)
      val clauses = splitAtKeyword(whens, "WHEN").map(parseWhen)
      require(clauses.nonEmpty, "MERGE needs at least one WHEN clause")
      Some(Merge(t, s, mergeKeys(on.trim, tAlias, sAlias), tAlias, sAlias, clauses))
    case _ => None
  }

  private val MatchedHead = """(?is)^MATCHED(\s.*)?$""".r
  private val NotMatchedBySourceHead =
    """(?is)^NOT\s+MATCHED\s+BY\s+SOURCE(\s.*)?$""".r
  // BY TARGET is the ANSI-explicit spelling of the plain NOT MATCHED
  private val NotMatchedHead =
    """(?is)^NOT\s+MATCHED(?:\s+BY\s+TARGET)?(\s.*)?$""".r
  private val InsertAction =
    """(?is)^INSERT\s*(?:\*|\(\s*([^)]*?)\s*\)\s*VALUES\s*\((.*)\))\s*$""".r

  /** One `WHEN ...` clause (the leading WHEN already stripped):
    *   MATCHED [AND cond] THEN UPDATE SET * | UPDATE SET a=e,... | DELETE
    *   NOT MATCHED [AND cond] THEN INSERT * | INSERT (cols) VALUES (exprs)
    * The AND/THEN boundaries are quote/paren-aware scans — a condition
    * like `s.note = 'x THEN y'` must not truncate. */
  private def parseWhen(clause: String): MergeWhen = {
    def condAndAction(rest: String): (Option[String], String) = {
      val (head, thenPart) = splitAtKeyword2(rest, "THEN")
      val action = thenPart.getOrElse(throw new IllegalArgumentException(
        s"MERGE WHEN clause missing THEN: '$clause'"))
      val cond = head.trim match {
        case "" => None
        case c if c.toUpperCase.startsWith("AND ") || c.toUpperCase.startsWith("AND\t") =>
          Some(c.substring(4).trim)
        case other => throw new IllegalArgumentException(
          s"expected [AND <cond>] THEN in MERGE WHEN clause, got '$other'")
      }
      (cond, action.trim)
    }
    clause.trim match {
      case NotMatchedBySourceHead(rest) =>
        val (cond, action) = condAndAction(Option(rest).getOrElse(""))
        val up = """(?is)^UPDATE\s+SET\s+(.+)$""".r
        action match {
          case a if a.equalsIgnoreCase("DELETE") => WhenSourceDelete(cond)
          case up(sets) =>
            val as = splitTopLevel(sets).map { a =>
              val i = a.indexOf('=')
              require(i > 0, s"malformed SET assignment: '$a'")
              val lhs = a.substring(0, i).trim
              require(lhs.matches("[A-Za-z_][A-Za-z0-9_]*"),
                s"SET target must be a plain column name, got '$lhs'")
              lhs -> a.substring(i + 1).trim
            }
            WhenSourceUpdate(cond, as)
          case other => throw new IllegalArgumentException(
            s"WHEN NOT MATCHED BY SOURCE supports UPDATE SET or DELETE, got '$other'")
        }
      case NotMatchedHead(rest) =>
        val (cond, action) = condAndAction(Option(rest).getOrElse(""))
        action match {
          case a if a.equalsIgnoreCase("INSERT *") ||
              a.toUpperCase.replaceAll("\\s+", " ") == "INSERT *" =>
            WhenInsert(cond, Nil, Nil, star = true)
          case InsertAction(cols, exprs) if cols != null =>
            val cs = splitTopLevel(cols)
            val es = splitTopLevel(exprs)
            require(cs.nonEmpty && cs.length == es.length,
              s"INSERT column/value count mismatch: ${cs.length} vs ${es.length}")
            cs.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
              s"INSERT column must be a plain name, got '$c'"))
            WhenInsert(cond, cs, es, star = false)
          case InsertAction(_, _) => WhenInsert(cond, Nil, Nil, star = true)
          case other => throw new IllegalArgumentException(
            s"WHEN NOT MATCHED supports INSERT only, got '$other'")
        }
      case MatchedHead(rest) =>
        val (cond, action) = condAndAction(Option(rest).getOrElse(""))
        val up = """(?is)^UPDATE\s+SET\s+(.+)$""".r
        action match {
          case a if a.equalsIgnoreCase("DELETE") => WhenDelete(cond)
          case up(sets) if sets.trim == "*" => WhenUpdate(cond, Nil, star = true)
          case up(sets) =>
            val as = splitTopLevel(sets).map { a =>
              val i = a.indexOf('=')
              require(i > 0, s"malformed SET assignment: '$a'")
              val lhs = a.substring(0, i).trim
              require(lhs.matches("[A-Za-z_][A-Za-z0-9_]*"),
                s"SET target must be a plain column name, got '$lhs'")
              lhs -> a.substring(i + 1).trim
            }
            WhenUpdate(cond, as, star = false)
          case other => throw new IllegalArgumentException(
            s"WHEN MATCHED supports UPDATE SET or DELETE, got '$other'")
        }
      case other => throw new IllegalArgumentException(
        s"MERGE WHEN clause must start with MATCHED or NOT MATCHED: '$other'")
    }
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

  /** True when a whitespace-delimited, case-insensitive occurrence of
    * `kw` starts at `i`. */
  private def keywordAt(s: String, i: Int, kw: String): Boolean =
    (i == 0 || s.charAt(i - 1).isWhitespace) &&
    i + kw.length <= s.length &&
    s.regionMatches(true, i, kw, 0, kw.length) &&
    (i + kw.length == s.length || s.charAt(i + kw.length).isWhitespace)

  /** Start indices of top-level (outside parens and single-quoted
    * strings) occurrences of keyword `kw` in `s`. */
  private def topLevelKeywordPositions(s: String, kw: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && keywordAt(s, i, kw)) out += i
      }
      i += 1
    }
    out.result()
  }

  /** Split MERGE clause text at each top-level `kw` (= WHEN) that is
    * followed by MATCHED / NOT MATCHED — the lookahead keeps an
    * (unparenthesized) `CASE WHEN` inside a condition from splitting a
    * clause; parenthesize CASE expressions in merge conditions. The
    * text BEFORE the first separator is the first segment (the caller
    * already stripped its leading WHEN). */
  private[graft] def splitAtKeyword(s: String, kw: String): Seq[String] = {
    val clauseHead = """(?is)^(MATCHED|NOT\s+MATCHED)\b.*""".r
    val cuts = topLevelKeywordPositions(s, kw).filter { p =>
      clauseHead.matches(s.substring(p + kw.length).trim)
    }
    val starts = 0 +: cuts.map(_ + kw.length)
    val ends = cuts :+ s.length
    starts.zip(ends).map { case (a, b) => s.substring(a, b).trim }
      .filter(_.nonEmpty)
  }

  /** Split at the FIRST top-level `kw`; None = keyword absent. */
  private[graft] def splitAtKeyword2(s: String, kw: String): (String, Option[String]) =
    topLevelKeywordPositions(s, kw).headOption match {
      case Some(p) => (s.substring(0, p).trim,
        Some(s.substring(p + kw.length).trim))
      case None => (s.trim, None)
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
