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

  def rewrite(sql: String): String =
    pat.replaceAllIn(sql, m => {
      val not = if (m.group(1) != null) "NOT " else ""
      val converted = convertPattern(m.group(2))
      scala.util.matching.Regex.quoteReplacement(s"${not}RLIKE '^$converted$$'")
    })

  /** SQL SIMILAR TO pattern → Java regex body (unanchored). Inside a
    * bracket expression `[...]`, `%` and `_` are LITERAL characters in
    * SIMILAR TO (and in regex), so they pass through unchanged there. */
  private[graft] def convertPattern(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < p.length) {
      p.charAt(i) match {
        case '[' if !inClass => inClass = true; sb.append('[')
        case ']' if inClass  => inClass = false; sb.append(']')
        case '%' if !inClass => sb.append(".*")
        case '_' if !inClass => sb.append('.')
        case '.' if !inClass => sb.append("\\.")
        case c               => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
