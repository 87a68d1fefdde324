package graft.run

/** PostgreSQL-style JSON operator rewriting for stage SQL.
  *
  * The reference registers the `datafusion-functions-json` pack
  * (core/src/custom_udfs.rs:67), which planner-rewrites `expr -> 'key'` to
  * `json_get(...)` and `expr ->> 'key'` to `json_as_text(...)`. Spark's
  * parser reserves `->` for lambda syntax, so the equivalent surface here is
  * a text-level rewrite applied to stage queries before validation and
  * execution — reference stage SQL using the operators runs unchanged.
  *
  * Rules (mirroring the operator semantics):
  *   - `X -> 'k'`  → `json_get(X, 'k')`   (result keeps its JSON form)
  *   - `X ->> 'k'` → `json_as_text(X, 'k')` (result as bare text)
  *   - `X -> 3`    → `json_get(X, '[3]')`  (array index)
  *   - chains resolve left-to-right: `p->'a'->>'b'` ⇒
  *     `json_as_text(json_get(p, 'a'), 'b')`
  *
  * A rewrite fires only when the right operand is a string or integer
  * literal, which is what keeps Spark lambdas (`x -> x * 2`) untouched —
  * a lambda whose entire body is a bare literal (a constant lambda) is the
  * one ambiguous form, and it is not rewritten-safe SQL to begin with.
  * Operators inside string literals, quoted identifiers, and comments are
  * never touched.
  */
object SqlRewrite {

  def jsonOperators(sql: String): String = {
    var s = sql
    var from = 0
    var i = nextArrow(s, from)
    while (i >= 0) {
      rewriteAt(s, i) match {
        case Some(ns) => s = ns; from = 0 // indices shifted; each success removes one arrow
        case None => from = i + 1 // lambda or unsupported operand: skip this arrow
      }
      i = nextArrow(s, from)
    }
    s
  }

  /** Index of the next `->` (or `->>`) outside literals/comments, or -1. */
  private def nextArrow(s: String, from: Int): Int = {
    var i = 0
    var inSingle = false
    var inDouble = false
    var inBacktick = false
    var inLineComment = false
    var inBlockComment = false
    while (i < s.length - 1) {
      val c = s(i)
      if (inLineComment) { if (c == '\n') inLineComment = false }
      else if (inBlockComment) { if (c == '*' && s(i + 1) == '/') { inBlockComment = false; i += 1 } }
      else if (inSingle) { if (c == '\'') inSingle = false }
      else if (inDouble) { if (c == '"') inDouble = false }
      else if (inBacktick) { if (c == '`') inBacktick = false }
      else c match {
        case '\'' => inSingle = true
        case '"' => inDouble = true
        case '`' => inBacktick = true
        case '-' if s(i + 1) == '-' => inLineComment = true; i += 1
        case '/' if s(i + 1) == '*' => inBlockComment = true; i += 1
        case '-' if s(i + 1) == '>' && i >= from => return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  private def rewriteAt(s: String, arrow: Int): Option[String] = {
    val isText = s.startsWith("->>", arrow)
    val opLen = if (isText) 3 else 2

    // right operand: a string literal or an integer literal, else no rewrite
    var r = arrow + opLen
    while (r < s.length && s(r).isWhitespace) r += 1
    if (r >= s.length) return None
    val (rhsPath, rhsEnd) =
      if (s(r) == '\'') {
        // scan to the closing quote, treating '' as an escaped quote
        var e = r + 1
        var closed = -1
        while (closed < 0 && e < s.length) {
          if (s(e) == '\'') {
            if (e + 1 < s.length && s(e + 1) == '\'') e += 2 else { closed = e; }
          } else e += 1
        }
        if (closed < 0) return None
        (s.substring(r, closed + 1), closed + 1)
      } else if (s(r).isDigit) {
        var e = r
        while (e < s.length && s(e).isDigit) e += 1
        (s"'[${s.substring(r, e)}]'", e)
      } else return None

    // left operand: identifier chain, optionally ending in a call's (...)
    var lEnd = arrow - 1
    while (lEnd >= 0 && s(lEnd).isWhitespace) lEnd -= 1
    if (lEnd < 0) return None
    var lStart = lEnd
    if (s(lEnd) == ')') {
      // balance back to the matching '(' (single-quote aware), then take the
      // function name before it
      var depth = 0
      var j = lEnd
      var inLit = false
      while (j >= 0 && (depth != 0 || s(j) != '(' || inLit)) {
        if (inLit) { if (s(j) == '\'') inLit = false }
        else s(j) match {
          case '\'' => inLit = true
          case ')' => depth += 1
          case '(' => depth -= 1
          case _ => ()
        }
        if (depth == 0 && s(j) == '(' && !inLit) () else j -= 1
      }
      if (j < 0) return None
      lStart = j
      var k = j - 1
      while (k >= 0 && (s(k).isLetterOrDigit || s(k) == '_' || s(k) == '.')) k -= 1
      lStart = k + 1
      if (lStart == j) return None // bare parenthesized expr without a name: skip
    } else {
      var k = lEnd
      while (k >= 0 && (s(k).isLetterOrDigit || s(k) == '_' || s(k) == '.' || s(k) == '`')) k -= 1
      lStart = k + 1
      if (lStart > lEnd) return None
    }

    val lhs = s.substring(lStart, lEnd + 1)
    val fn = if (isText) "json_as_text" else "json_get"
    Some(s.substring(0, lStart) + s"$fn($lhs, $rhsPath)" + s.substring(rhsEnd))
  }
}
