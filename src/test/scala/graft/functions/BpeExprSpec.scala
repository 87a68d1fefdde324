package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The native merge-table encode must be bit-identical to the literal
  * delimited-`replace` chain it replaced (the form the DuckDB oracle still
  * replays): same double-separator greedy left-to-right semantics, merge by
  * merge in rank order. The reference here IS that chain, executed with
  * plain `String.replace` (also literal, also left-to-right
  * non-overlapping), so any divergence in the native scan fails loudly.
  */
class BpeExprSpec extends AnyFunSuite {

  private val S = "\u001f"

  private def refEncodeWord(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var s = S + S + w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)) + S + S).mkString
    merges.foreach { case (a, b) => s = s.replace(S + a + S + S + b + S, S + a + b + S) }
    s.split(S).filter(_.nonEmpty).toSeq
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap(refEncodeWord(_, merges))

  private def nativeEncode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val arr = new BpeMergeTable(merges.toArray).encode(UTF8String.fromString(text))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("hand cases: back-to-back, overlapping, astral, multi-word") {
    val m = Seq(("a", "b"), ("ab", "ab"), ("c", "c"))
    assert(nativeEncode("abab", m) == Seq("abab")) // (a,b) twice, then (ab,ab)
    assert(nativeEncode("ccc", m) == Seq("cc", "c")) // greedy non-overlapping
    assert(nativeEncode("ab cd abab", m) == Seq("ab", "c", "d", "abab"))
    assert(nativeEncode("  ab  ", m) == Seq("ab")) // whitespace edges
    assert(nativeEncode("", m) == Seq.empty)
    val astral = Seq(("𝄞", "a")) // 𝄞 as a single codepoint token
    assert(nativeEncode("𝄞a", astral) == Seq("𝄞a"))
    assert(nativeEncode("a𝄞", astral) == Seq("a", "𝄞"))
  }

  test("property: native == replace-chain reference on generated tables") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Array("a", "b", "c", "d", "𝄞")
    for (trial <- 1 to 200) {
      // grow a realistic trained table: each merge joins two pool tokens,
      // the result joins the pool (so later merges reference earlier output)
      val pool = scala.collection.mutable.ArrayBuffer[String](alphabet.toIndexedSeq: _*)
      val merges = (1 to (1 + rnd.nextInt(12))).map { _ =>
        val a = pool(rnd.nextInt(pool.size)); val b = pool(rnd.nextInt(pool.size))
        pool += (a + b)
        (a, b)
      }
      val text = (1 to (1 + rnd.nextInt(6))).map { _ =>
        (1 to (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.mkString(" ")
      assert(nativeEncode(text, merges) == refEncode(text, merges),
        s"trial $trial diverged: text=$text merges=$merges")
    }
  }

  test("merge tables beyond the old 64-literal cap work and plan O(1)") {
    // 1000 chained merges over 'ab': a+b, ab+ab, abab+abab, ... plus filler
    val big = Seq(("a", "b"), ("ab", "ab")) ++
      (1 to 998).map(i => (s"x$i", s"y$i")) // never fire, still probed
    assert(nativeEncode("ababab ab", big) == refEncode("ababab ab", big))
  }
}

/** Spark-side: the expression codegens, survives serialization, and the
  * plan stays constant-size as the table grows.
  */
class BpeExprSparkSpec extends SparkSpec {

  test("bpe_encode runs under codegen with a 1k merge table, O(1) plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, "abab cd"), (2L, "AB ab"), (3L, null: String))
      .toDF("id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab")) ++ (1 to 1000).map(i => (s"x$i", s"y$i"))
    val out = df.select(col("id"),
        BpeEncodeExpr(lower(col("text")), merges).as("tokens"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) == Seq("abab", "c", "d"))
    assert(out(1).getSeq[String](1) == Seq("ab", "ab"))
    assert(out(2).isNullAt(1))
    // plan size must not scale with the merge table: the table is a
    // reference object, not per-merge literals
    val small = df.select(BpeEncodeExpr(lower(col("text")), merges.take(2)).as("t"))
    val large = df.select(BpeEncodeExpr(lower(col("text")), merges).as("t"))
    val (ps, pl) = (small.queryExecution.executedPlan.treeString,
      large.queryExecution.executedPlan.treeString)
    assert(math.abs(ps.length - pl.length) < 200,
      s"plan grows with merge count: ${ps.length} vs ${pl.length}")
  }
}
