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
  * literal, which keeps ordinary Spark lambdas (`x -> x * 2`) untouched.
  * Constant lambdas (`transform(a, x -> 2)`) ARE valid Spark SQL and look
  * identical to a JSON access on a bare column — the disambiguator is the
  * enclosing call: when the left operand is a bare unqualified identifier
  * appearing as a direct argument of one of Spark's higher-order functions
  * (`transform`, `filter`, `aggregate`, ...), it is a lambda parameter and
  * is never rewritten. Operators inside string literals, quoted identifiers,
  * and comments are never touched.
  *
  * All scanning is driven by one forward-computed literal/comment mask per
  * pass, so quote state is never re-derived right-to-left (where `''`
  * escapes would be ambiguous).
  */
object SqlRewrite {

  /** Spark higher-order functions whose lambda arguments use `->`. A bare
    * identifier directly inside one of these calls is a lambda parameter,
    * not a JSON column.
    */
  private val HigherOrderFns = Set(
    "transform", "filter", "exists", "forall", "aggregate", "reduce",
    "zip_with", "map_filter", "map_zip_with", "transform_keys",
    "transform_values", "array_sort")

  def jsonOperators(sql: String): String = {
    var s = sql
    var from = 0
    var done = false
    while (!done) {
      val mask = literalMask(s)
      val i = nextArrow(s, mask, from)
      if (i < 0) done = true
      else rewriteAt(s, mask, i) match {
        case Some(ns) => s = ns; from = 0 // indices shifted; each success removes one arrow
        case None => from = i + 1 // lambda or unsupported operand: skip this arrow
      }
    }
    s
  }

  /** Forward pass: mask(i) = true iff char i sits inside (or delimits) a
    * string literal, quoted identifier, or comment. `''` inside a single-
    * quoted literal is handled as an escape, so a literal like 'don''t' is
    * one contiguous masked span.
    */
  private def literalMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          mask(i) = true; i += 1
          var closed = false
          while (!closed && i < s.length) {
            mask(i) = true
            if (s(i) == '\\' && i + 1 < s.length) {
              // Spark's default lexer honors backslash escapes inside string
              // literals ('it\'s'): skip the escaped char or the mask would
              // close the literal early and desync from the real parser
              mask(i + 1) = true; i += 2
            } else if (s(i) == '\'') {
              if (i + 1 < s.length && s(i + 1) == '\'') { mask(i + 1) = true; i += 2 }
              else { closed = true; i += 1 }
            } else i += 1
          }
        case '"' =>
          mask(i) = true; i += 1
          while (i < s.length && s(i) != '"') { mask(i) = true; i += 1 }
          if (i < s.length) { mask(i) = true; i += 1 }
        case '`' =>
          mask(i) = true; i += 1
          while (i < s.length && s(i) != '`') { mask(i) = true; i += 1 }
          if (i < s.length) { mask(i) = true; i += 1 }
        case '-' if i + 1 < s.length && s(i + 1) == '-' =>
          while (i < s.length && s(i) != '\n') { mask(i) = true; i += 1 }
        case '/' if i + 1 < s.length && s(i + 1) == '*' =>
          mask(i) = true; mask(i + 1) = true; i += 2
          var closed = false
          while (!closed && i < s.length) {
            mask(i) = true
            if (s(i) == '*' && i + 1 < s.length && s(i + 1) == '/') { mask(i + 1) = true; i += 2; closed = true }
            else i += 1
          }
        case _ => i += 1
      }
    }
    mask
  }

  /** Index of the next unmasked `->` (or `->>`) at or after `from`, or -1. */
  private def nextArrow(s: String, mask: Array[Boolean], from: Int): Int = {
    var i = math.max(from, 0)
    while (i < s.length - 1) {
      if (!mask(i) && s(i) == '-' && s(i + 1) == '>') return i
      i += 1
    }
    -1
  }

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Lowercased function name whose `(` sits at `paren`, if any. */
  private def nameBefore(s: String, paren: Int): Option[String] = {
    var k = paren - 1
    while (k >= 0 && s(k).isWhitespace) k -= 1
    val end = k
    while (k >= 0 && isIdentChar(s(k))) k -= 1
    if (k == end) None else Some(s.substring(k + 1, end + 1).toLowerCase(java.util.Locale.ROOT))
  }

  /** Name of the call the position sits directly inside (the nearest
    * unmatched `(` to the left, counting only unmasked parens), if that
    * `(` is preceded by a function name. `pos` is the index just before
    * the candidate identifier.
    */
  private def enclosingCallName(s: String, mask: Array[Boolean], pos: Int): Option[String] = {
    var j = pos
    while (j >= 0 && s(j).isWhitespace) j -= 1
    if (j < 0) return None
    s(j) match {
      case '(' => nameBefore(s, j)
      case ',' =>
        var depth = 0
        j -= 1
        while (j >= 0) {
          if (!mask(j)) s(j) match {
            case ')' => depth += 1
            case '(' => if (depth == 0) return nameBefore(s, j) else depth -= 1
            case _ => ()
          }
          j -= 1
        }
        None
      case _ => None
    }
  }

  private def rewriteAt(s: String, mask: Array[Boolean], arrow: Int): Option[String] = {
    val isText = s.startsWith("->>", arrow)
    val opLen = if (isText) 3 else 2

    // right operand: a string literal or an integer literal, else no rewrite
    var r = arrow + opLen
    while (r < s.length && s(r).isWhitespace) r += 1
    if (r >= s.length) return None
    val (rhsPath, rhsEnd) =
      if (s(r) == '\'') {
        // scan to the closing quote, treating '' and \' as escaped quotes
        var e = r + 1
        var closed = -1
        while (closed < 0 && e < s.length) {
          if (s(e) == '\\' && e + 1 < s.length) e += 2
          else if (s(e) == '\'') {
            if (e + 1 < s.length && s(e + 1) == '\'') e += 2 else closed = e
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
      // balance back to the matching '(' (unmasked parens only), then take
      // the function name before it
      var depth = 0
      var j = lEnd
      var open = -1
      while (j >= 0 && open < 0) {
        if (!mask(j)) s(j) match {
          case ')' => depth += 1
          case '(' => depth -= 1; if (depth == 0) open = j
          case _ => ()
        }
        if (open < 0) j -= 1
      }
      if (open < 0) return None
      var k = open - 1
      while (k >= 0 && (isIdentChar(s(k)) || s(k) == '.')) k -= 1
      lStart = k + 1
      if (lStart == open) return None // bare parenthesized expr without a name: skip
    } else {
      var k = lEnd
      while (k >= 0 && (isIdentChar(s(k)) || s(k) == '.' || s(k) == '`')) k -= 1
      lStart = k + 1
      if (lStart > lEnd) return None
      // lambda-parameter guard: a bare unqualified identifier that is a
      // direct argument of a higher-order function is a lambda param —
      // `transform(a, x -> 2)` must stay a (constant) lambda
      val lhs0 = s.substring(lStart, lEnd + 1)
      if (!lhs0.contains('.') && !lhs0.contains('`') &&
          enclosingCallName(s, mask, lStart - 1).exists(HigherOrderFns.contains))
        return None
    }

    val lhs = s.substring(lStart, lEnd + 1)
    val fn = if (isText) "json_as_text" else "json_get"
    Some(s.substring(0, lStart) + s"$fn($lhs, $rhsPath)" + s.substring(rhsEnd))
  }
}
