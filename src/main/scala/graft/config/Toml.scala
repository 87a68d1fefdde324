package graft.config

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Minimal TOML parser (no third-party dependency resolves in the offline
  * build) producing a Jackson tree, so TOML pipelines flow through the same
  * [[ConfigParser.fromTree]] walk as YAML/JSON — the reference accepts all
  * three formats (aqueducts/meta/src/lib.rs:11-13, core/src/templating.rs:126-147).
  *
  * Covers the TOML 1.0 subset pipeline definitions use (the reference's
  * examples/aqueduct_pipeline_example.toml exercises most of it):
  *   - bare / quoted / dotted keys; `[table]` and `[[array-of-tables]]`
  *     headers, including dotted headers that attach to the LAST element of
  *     a preceding array of tables (`[[sources]]` … `[sources.format]`)
  *   - basic and literal strings, single- and multi-line (`"""…"""` with
  *     escapes and line-ending backslash, `'''…'''` verbatim)
  *   - integers (decimal with `_`, hex/octal/binary), floats, booleans
  *   - arrays (nested, multiline, trailing comma) and inline tables
  *   - date/datetime tokens are kept as strings (the config model parses
  *     timestamps from ISO strings already)
  *   - `#` comments
  *
  * Intentional leniencies vs the spec (documented, none affect well-formed
  * documents): inline tables may span lines even outside strings, tables may
  * be reopened, and exotic float syntax (`inf`, `nan`) is rejected.
  */
object Toml {

  final case class TomlError(msg: String, line: Int)
    extends RuntimeException(s"TOML parse error at line $line: $msg")

  def parse(raw: String): ObjectNode = new Parser(raw).document()

  private final class Parser(s: String) {
    private val nf = JsonNodeFactory.instance
    private var pos = 0
    private val root = nf.objectNode()
    private var current: ObjectNode = root

    private def eof: Boolean = pos >= s.length
    private def peek: Char = s(pos)
    private def lineAt(p: Int): Int = 1 + s.substring(0, math.min(p, s.length)).count(_ == '\n')
    private def err(msg: String): Nothing = throw TomlError(msg, lineAt(pos))

    def document(): ObjectNode = {
      skipTrivia(newlines = true)
      while (!eof) {
        if (peek == '[') header() else keyValue(current)
        endOfStatement()
        skipTrivia(newlines = true)
      }
      root
    }

    // -------------------------------------------------------------- trivia

    /** Skip spaces/tabs, comments, and (optionally) newlines. */
    private def skipTrivia(newlines: Boolean): Unit = {
      var go = true
      while (go && !eof) {
        peek match {
          case ' ' | '\t' => pos += 1
          case '\r' | '\n' if newlines => pos += 1
          case '#' => while (!eof && peek != '\n') pos += 1
          case _ => go = false
        }
      }
    }

    /** After a top-level statement: only trivia until the line ends. */
    private def endOfStatement(): Unit = {
      skipTrivia(newlines = false)
      if (!eof && peek != '\n' && peek != '\r')
        err(s"unexpected content after value: '${s.substring(pos, math.min(pos + 20, s.length))}'")
    }

    // --------------------------------------------------------------- keys

    private def bareKeyChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-'

    /** One dotted key path: `a.b."c d"` → Seq(a, b, "c d"). */
    private def keyPath(): Seq[String] = {
      val parts = Seq.newBuilder[String]
      var more = true
      while (more) {
        skipTrivia(newlines = false)
        if (eof) err("expected key")
        parts += (peek match {
          case '"' => basicString(multiline = false)
          case '\'' => literalString(multiline = false)
          case c if bareKeyChar(c) =>
            val start = pos
            while (!eof && bareKeyChar(peek)) pos += 1
            s.substring(start, pos)
          case c => err(s"invalid key character '$c'")
        })
        skipTrivia(newlines = false)
        if (!eof && peek == '.') { pos += 1 } else more = false
      }
      parts.result()
    }

    /** Descend one path segment for header resolution: arrays of tables
      * resolve to their LAST element (TOML semantics — `[sources.format]`
      * after `[[sources]]` extends the most recent source).
      */
    private def descend(node: ObjectNode, seg: String): ObjectNode =
      node.get(seg) match {
        case null =>
          val child = nf.objectNode(); node.set[JsonNode](seg, child); child
        case o: ObjectNode => o
        case a: ArrayNode =>
          if (a.size() == 0 || !a.get(a.size() - 1).isObject)
            err(s"cannot extend non-table array '$seg'")
          a.get(a.size() - 1).asInstanceOf[ObjectNode]
        case _ => err(s"key '$seg' already holds a non-table value")
      }

    private def header(): Unit = {
      pos += 1 // '['
      val isArray = !eof && peek == '['
      if (isArray) pos += 1
      val path = keyPath()
      skipTrivia(newlines = false)
      if (eof || peek != ']') err("expected ']' closing table header")
      pos += 1
      if (isArray) {
        if (eof || peek != ']') err("expected ']]' closing array-of-tables header")
        pos += 1
      }
      val parent = path.dropRight(1).foldLeft(root)(descend)
      val last = path.last
      current =
        if (isArray) {
          val arr = parent.get(last) match {
            case null => val a = nf.arrayNode(); parent.set[JsonNode](last, a); a
            case a: ArrayNode => a
            case _ => err(s"key '$last' already holds a non-array value")
          }
          val t = nf.objectNode(); arr.add(t); t
        } else descend(parent, last)
    }

    // ---------------------------------------------------------- key = value

    private def keyValue(target: ObjectNode): Unit = {
      val path = keyPath()
      skipTrivia(newlines = false)
      if (eof || peek != '=') err("expected '=' after key")
      pos += 1
      skipTrivia(newlines = false)
      val v = value()
      val parent = path.dropRight(1).foldLeft(target)(descend)
      if (parent.has(path.last)) err(s"duplicate key '${path.mkString(".")}'")
      parent.set[JsonNode](path.last, v)
    }

    // --------------------------------------------------------------- values

    private def value(): JsonNode = {
      if (eof) err("expected value")
      peek match {
        case '"' =>
          if (s.startsWith("\"\"\"", pos)) nf.textNode(basicString(multiline = true))
          else nf.textNode(basicString(multiline = false))
        case '\'' =>
          if (s.startsWith("'''", pos)) nf.textNode(literalString(multiline = true))
          else nf.textNode(literalString(multiline = false))
        case '[' => array()
        case '{' => inlineTable()
        case _ => scalarToken()
      }
    }

    private def array(): ArrayNode = {
      pos += 1 // '['
      val arr = nf.arrayNode()
      var done = false
      while (!done) {
        skipTrivia(newlines = true)
        if (eof) err("unterminated array")
        if (peek == ']') { pos += 1; done = true }
        else {
          arr.add(value())
          skipTrivia(newlines = true)
          if (eof) err("unterminated array")
          peek match {
            case ',' => pos += 1
            case ']' => pos += 1; done = true
            case c => err(s"expected ',' or ']' in array, found '$c'")
          }
        }
      }
      arr
    }

    private def inlineTable(): ObjectNode = {
      pos += 1 // '{'
      val obj = nf.objectNode()
      skipTrivia(newlines = true)
      if (!eof && peek == '}') { pos += 1; return obj }
      var done = false
      while (!done) {
        skipTrivia(newlines = true)
        keyValue(obj)
        skipTrivia(newlines = true)
        if (eof) err("unterminated inline table")
        peek match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case c => err(s"expected ',' or '}' in inline table, found '$c'")
        }
      }
      obj
    }

    private def basicString(multiline: Boolean): String = {
      val quotes = if (multiline) 3 else 1
      pos += quotes
      if (multiline && !eof && peek == '\n') pos += 1 // trim the first newline
      else if (multiline && s.startsWith("\r\n", pos)) pos += 2
      val sb = new java.lang.StringBuilder
      while (true) {
        if (eof) err("unterminated string")
        if (multiline && s.startsWith("\"\"\"", pos)) {
          // content may end in up to two quotes: consume extras before the
          // closing delimiter
          var q = 0
          while (pos + 3 + q < s.length && s(pos + 3 + q) == '"' && q < 2) q += 1
          sb.append("\"" * q)
          pos += 3 + q
          return sb.toString
        }
        if (!multiline && peek == '"') { pos += 1; return sb.toString }
        if (!multiline && (peek == '\n' || peek == '\r')) err("newline in single-line string")
        if (peek == '\\') {
          pos += 1
          if (eof) err("dangling escape")
          peek match {
            case 'b' => sb.append('\b'); pos += 1
            case 't' => sb.append('\t'); pos += 1
            case 'n' => sb.append('\n'); pos += 1
            case 'f' => sb.append('\f'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case '"' => sb.append('"'); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case 'u' => sb.appendCodePoint(hex(4)); ()
            case 'U' => sb.appendCodePoint(hex(8)); ()
            case c if multiline && (c == '\n' || c == '\r' || c == ' ' || c == '\t') =>
              // line-ending backslash: skip whitespace through the newline(s)
              while (!eof && (peek == ' ' || peek == '\t' || peek == '\n' || peek == '\r')) pos += 1
            case c => err(s"invalid escape '\\$c'")
          }
        } else { sb.append(peek); pos += 1 }
      }
      throw new IllegalStateException("unreachable")
    }

    private def hex(n: Int): Int = {
      pos += 1 // 'u' / 'U'
      if (pos + n > s.length) err("truncated unicode escape")
      val code = Integer.parseInt(s.substring(pos, pos + n), 16)
      pos += n
      code
    }

    private def literalString(multiline: Boolean): String = {
      val quotes = if (multiline) 3 else 1
      pos += quotes
      if (multiline && !eof && peek == '\n') pos += 1
      else if (multiline && s.startsWith("\r\n", pos)) pos += 2
      val start = pos
      if (multiline) {
        val end = s.indexOf("'''", pos)
        if (end < 0) err("unterminated literal string")
        // content may end in up to two quotes
        var e = end
        while (e + 3 < s.length && s(e + 3) == '\'' && e - end < 2) e += 1
        pos = e + 3
        s.substring(start, e)
      } else {
        while (!eof && peek != '\'' && peek != '\n') pos += 1
        if (eof || peek != '\'') err("unterminated literal string")
        val out = s.substring(start, pos)
        pos += 1
        out
      }
    }

    /** Bare scalar: boolean, integer, float, or date/time (kept textual). */
    private def scalarToken(): JsonNode = {
      val start = pos
      while (!eof && !",]}#\n\r".contains(peek)) pos += 1
      val tok = s.substring(start, pos).trim
      if (tok.isEmpty) err("expected value")
      tok match {
        case "true" => nf.booleanNode(true)
        case "false" => nf.booleanNode(false)
        case t if t.matches("""\d{4}-\d{2}-\d{2}([Tt ].+)?""") => nf.textNode(t) // date / datetime
        case t if t.matches("""\d{2}:\d{2}:\d{2}(\.\d+)?""") => nf.textNode(t) // local time
        case t =>
          val clean = t.replace("_", "")
          try {
            if (clean.startsWith("0x") || clean.startsWith("0X")) nf.numberNode(java.lang.Long.parseLong(clean.drop(2), 16))
            else if (clean.startsWith("0o") || clean.startsWith("0O")) nf.numberNode(java.lang.Long.parseLong(clean.drop(2), 8))
            else if (clean.startsWith("0b") || clean.startsWith("0B")) nf.numberNode(java.lang.Long.parseLong(clean.drop(2), 2))
            else if (clean.exists(c => c == '.' || c == 'e' || c == 'E')) nf.numberNode(clean.toDouble)
            else nf.numberNode(clean.toLong)
          } catch {
            case _: NumberFormatException => err(s"unrecognized value '$t'")
          }
      }
    }
  }
}
