package graft

/**
 * `expr SIMILAR TO 'pattern'` support (reference:
 * ballista/core/proto/datafusion.proto:354 `SimilarToNode`): Spark's
 * parser has no SIMILAR TO, so the statement text is rewritten to
 * `expr [NOT] RLIKE '^converted$'` before parsing.
 *
 * SQL SIMILAR TO pattern semantics vs Java regex: `%` → `.*`, `_` → `.`,
 * a literal `.` must be escaped, everything else (`|`, `*`, `+`, `?`,
 * parens, brackets, braces) already carries regex meaning in SIMILAR TO.
 * The match is anchored over the whole string (hence `^...$`).
 *
 * The rewrite is textual and targets the `SIMILAR TO '<literal>'` form —
 * the only form the reference's surface serializes. A SIMILAR TO against
 * a non-literal pattern passes through untouched (and fails in Spark's
 * parser with a clear error).
 */
object SimilarTo {

  private val pat =
    """(?is)\b(NOT\s+)?SIMILAR\s+TO\s+'((?:[^']|'')*)'""".r

  def rewrite(sql: String): String = rewrite(sql, escapedStringLiterals = false)

  /**
   * @param escapedStringLiterals the session's
   *   `spark.sql.parser.escapedStringLiterals`: when true, Spark's string
   *   parser takes backslashes literally, so the regex must NOT be doubled
   *   before embedding (doubling would reach the regex engine verbatim and
   *   change every escape's meaning).
   */
  def rewrite(sql: String, escapedStringLiterals: Boolean): String =
    pat.replaceAllIn(sql, m => {
      val not = if (m.group(1) != null) "NOT " else ""
      // convertPattern yields the true Java regex; the regex is then
      // embedded in a Spark single-quoted string literal, whose parser
      // (escapedStringLiterals=false) unescapes backslashes — so every
      // backslash that must reach the regex engine is doubled here.
      val regex = convertPattern(m.group(2))
      val literalBody =
        if (escapedStringLiterals) regex else regex.replace("\\", "\\\\")
      scala.util.matching.Regex.quoteReplacement(s"${not}RLIKE '^$literalBody$$'")
    })

  /** SQL SIMILAR TO pattern → Java regex body (unanchored, real regex —
    * NOT yet escaped for embedding in a SQL string literal). Inside a
    * bracket expression `[...]`, `%` and `_` are LITERAL characters in
    * SIMILAR TO (and in regex), so they pass through unchanged there.
    * `.`, `^`, `$` are literal characters in SIMILAR TO and get regex
    * escapes; a `\x` escape in the pattern means literal `x`. */
  private[graft] def convertPattern(p: String): String = {
    // Postgres rejects a pattern ending in an unpaired escape ("LIKE
    // pattern must not end with escape character"); match that instead of
    // letting a dangling backslash surface later as an opaque
    // PatternSyntaxException from the regex engine.
    require(p.reverse.takeWhile(_ == '\\').length % 2 == 0,
      s"SIMILAR TO pattern must not end with escape character: '$p'")
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < p.length) {
      p.charAt(i) match {
        case '\\' if i + 1 < p.length =>
          // SIMILAR TO escape: next char is literal. Alphanumerics must
          // NOT be re-escaped (regex \d, \w… would change meaning).
          val c = p.charAt(i + 1)
          if (c.isLetterOrDigit) sb.append(c) else sb.append('\\').append(c)
          i += 1
        case '[' if !inClass => inClass = true; sb.append('[')
        case ']' if inClass  => inClass = false; sb.append(']')
        case '%' if !inClass => sb.append(".*")
        case '_' if !inClass => sb.append('.')
        case '.' if !inClass => sb.append("\\.")
        case '^' if !inClass => sb.append("\\^")
        case '$' if !inClass => sb.append("\\$")
        case c               => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
