package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native text statistics for the quality-scoring / language-ID
  * hot path.
  *
  * The compositional forms tokenize repeatedly and pay an interpreted
  * higher-order `filter` with a LINEAR `array_contains` scan per word per
  * stopword list — O(words × Σ|list|) string compares per document, the
  * dominant cost of qualityScore and langId. [[TextStats]] computes the
  * word count, the `[^A-Za-z0-9\s]` character count, and the per-list
  * stopword hit counts in ONE traversal with hash-set membership.
  *
  * Semantics are bit-compatible with the compositional definitions:
  * words are maximal runs of non-`\s` characters (Java regex `\s` =
  * `[ \t\n\f\r]` exactly, NOT Unicode whitespace), matching
  * `filter(split(trim(c), "\\s+"), length > 0)`; stopword matching
  * lowercases each word (`String.toLowerCase(Locale.ROOT)`, identical to
  * Spark's `lower` for the ASCII range); the punct count matches
  * `size(regexp_extract_all(c, "[^A-Za-z0-9\\s]"))` for BMP text; and
  * `n_chars` is `length(c)` (codepoint count).
  */
object TextStatsUtil {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(u: UTF8String, sets: Array[java.util.HashSet[String]]): InternalRow = {
    val s = u.toString
    val n = s.length
    val hits = new Array[Int](sets.length)
    var nWords = 0
    var nPunct = 0
    var i = 0
    var wordStart = -1
    while (i <= n) {
      val ws = i == n || isWs(s.charAt(i))
      if (!ws) {
        if (wordStart < 0) wordStart = i
        val c = s.charAt(i)
        val alnum = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        if (!alnum && !Character.isLowSurrogate(c)) nPunct += 1
      } else if (wordStart >= 0) {
        nWords += 1
        if (sets.length > 0) {
          val w = s.substring(wordStart, i).toLowerCase(java.util.Locale.ROOT)
          var k = 0
          while (k < sets.length) {
            if (sets(k).contains(w)) hits(k) += 1
            k += 1
          }
        }
        wordStart = -1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      u.numChars(), nWords, nPunct, new GenericArrayData(hits.map(Integer.valueOf))))
  }
}

/** `struct(n_chars, n_words, n_punct, hits: array<int>)` over a string
  * column, with `hits(i)` = words of the text present in `lists(i)`
  * (case-insensitive). See [[TextStatsUtil]] for the exact semantics.
  */
case class TextStats(child: Expression, lists: Seq[Seq[String]])
  extends UnaryExpression {

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lists.map { l =>
      val s = new java.util.HashSet[String](l.size * 2)
      l.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
      s
    }.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"text_stats expects a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "text_stats"

  override def nullSafeEval(v: Any): Any =
    TextStatsUtil.compute(v.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("stopwordSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextStatsUtil.compute($a, $setsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  def apply(c: Column, lists: Seq[Seq[String]]): Column =
    GraftShims.column(TextStats(GraftShims.expression(c), lists))
}
