package graft.run

import org.scalatest.funsuite.AnyFunSuite

class SqlRewriteSpec extends AnyFunSuite {
  import SqlRewrite.jsonOperators

  test("-> and ->> rewrite to json_get / json_as_text") {
    assert(jsonOperators("SELECT props -> 'k' FROM t") ==
      "SELECT json_get(props, 'k') FROM t")
    assert(jsonOperators("SELECT props->>'k' FROM t") ==
      "SELECT json_as_text(props, 'k') FROM t")
    assert(jsonOperators("SELECT t.props ->> 'a' AS a FROM t") ==
      "SELECT json_as_text(t.props, 'a') AS a FROM t")
  }

  test("integer right operand becomes an index path") {
    assert(jsonOperators("SELECT arr -> 0 FROM t") ==
      "SELECT json_get(arr, '[0]') FROM t")
  }

  test("chains resolve left-to-right through the generated call") {
    assert(jsonOperators("SELECT p->'a'->>'b' FROM t") ==
      "SELECT json_as_text(json_get(p, 'a'), 'b') FROM t")
    assert(jsonOperators("SELECT p -> 'a' -> 0 -> 'c' FROM t") ==
      "SELECT json_get(json_get(json_get(p, 'a'), '[0]'), 'c') FROM t")
  }

  test("lambdas, literals, and comments are untouched") {
    val lambda = "SELECT transform(a, x -> x * 2) FROM t"
    assert(jsonOperators(lambda) == lambda)
    val lambda2 = "SELECT filter(a, (x, i) -> x > i) FROM t"
    assert(jsonOperators(lambda2) == lambda2)
    val inString = "SELECT '-> not an op' AS s, p ->> 'k' FROM t"
    assert(jsonOperators(inString) == "SELECT '-> not an op' AS s, json_as_text(p, 'k') FROM t")
    val comment = "SELECT x FROM t -- p -> 'k'"
    assert(jsonOperators(comment) == comment)
  }

  test("mixed: lambda and JSON operator in one statement") {
    assert(jsonOperators("SELECT transform(a, x -> x + 1), p->'k' FROM t") ==
      "SELECT transform(a, x -> x + 1), json_get(p, 'k') FROM t")
  }

  test("escaped quotes in the key survive the rewrite") {
    assert(jsonOperators("SELECT p ->> 'it''s' FROM t") ==
      "SELECT json_as_text(p, 'it''s') FROM t")
  }

  test("backslash-escaped quotes do not desync the literal mask") {
    // Spark's default lexer reads 'it\\'s fine' as ONE literal; a mask that
    // closed at the backslashed quote would hide the arrow that follows
    assert(jsonOperators("SELECT 'it\\'s fine' AS a, p -> 'k' AS b FROM t") ==
      "SELECT 'it\\'s fine' AS a, json_get(p, 'k') AS b FROM t")
    // and a backslash-escaped quote in the KEY scans to the real closing quote
    assert(jsonOperators("SELECT p ->> 'don\\'t' FROM t") ==
      "SELECT json_as_text(p, 'don\\'t') FROM t")
  }

  test("function-call left operand is wrapped whole") {
    assert(jsonOperators("SELECT get_json_object(j, '$.a') ->> 'b' FROM t") ==
      "SELECT json_as_text(get_json_object(j, '$.a'), 'b') FROM t")
  }

  test("constant lambdas inside higher-order functions are untouched") {
    val constInt = "SELECT transform(a, x -> 2) FROM t"
    assert(jsonOperators(constInt) == constInt)
    val constStr = "SELECT transform(a, x -> 'hi') FROM t"
    assert(jsonOperators(constStr) == constStr)
    val firstArg = "SELECT array_sort(a, (l, r) -> 1) FROM t"
    assert(jsonOperators(firstArg) == firstArg)
    val nested = "SELECT aggregate(a, 0, (acc, x) -> acc, acc -> 0) FROM t"
    assert(jsonOperators(nested) == nested)
  }

  test("JSON access on a column argument of a non-HOF call still rewrites") {
    assert(jsonOperators("SELECT coalesce(props -> 'k', 'none') FROM t") ==
      "SELECT coalesce(json_get(props, 'k'), 'none') FROM t")
    // qualified identifiers are never lambda params, even inside a HOF
    assert(jsonOperators("SELECT transform(a, x -> t.props) , t.p -> 'k' FROM t") ==
      "SELECT transform(a, x -> t.props) , json_get(t.p, 'k') FROM t")
  }

  test("lambda param used with a JSON operator inside the body rewrites") {
    assert(jsonOperators("SELECT exists(arr, x -> x ->> 'k' = 'v') FROM t") ==
      "SELECT exists(arr, x -> json_as_text(x, 'k') = 'v') FROM t")
  }

  test("escaped quote inside a call argument does not skew paren balancing") {
    assert(jsonOperators("SELECT get_json_object(c, 'don''t') -> 'k' FROM t") ==
      "SELECT json_get(get_json_object(c, 'don''t'), 'k') FROM t")
  }

  test("top-level select-list items after a comma still rewrite") {
    assert(jsonOperators("SELECT a, props -> 'k' FROM t") ==
      "SELECT a, json_get(props, 'k') FROM t")
  }
}
