package graft.plans

import graft.functions.WordShingles
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** Engine session extensions (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * registers the native [[WordShingles]] expression as the SQL function
  * `word_shingles(text, n)` so declarative pipeline stages get the codegen'd
  * implementation too, not just the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(text, IntegerLiteral(n)) => WordShingles(text, n)
        case _ => throw new IllegalArgumentException(
          "word_shingles(text, n) expects a string column and an integer literal")
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_shingles"),
      new ExpressionInfo(classOf[graft.functions.CharShingles].getName, "char_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(text, IntegerLiteral(n), IntegerLiteral(stride)) =>
          graft.functions.CharShingles(text, n, stride)
        case Seq(text, IntegerLiteral(n)) => graft.functions.CharShingles(text, n, 1)
        case _ => throw new IllegalArgumentException(
          "char_shingles(text, n[, stride]) expects a string column and integer literals")
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) =>
          import org.apache.spark.sql.catalyst.expressions.Cast
          import org.apache.spark.sql.types.{ArrayType, DoubleType}
          graft.functions.DotProduct(
            Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
        case _ => throw new IllegalArgumentException(
          "dot_product(a, b) expects two double-array columns")
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantize_int8"),
      new ExpressionInfo(classOf[graft.functions.QuantizeInt8].getName, "quantize_int8"),
      (args: Seq[Expression]) => args match {
        case Seq(v) =>
          import org.apache.spark.sql.catalyst.expressions.Cast
          import org.apache.spark.sql.types.{ArrayType, DoubleType}
          graft.functions.QuantizeInt8(Cast(v, ArrayType(DoubleType)))
        case _ => throw new IllegalArgumentException(
          "quantize_int8(v) expects one numeric-array column")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[graft.functions.HilbertIndex].getName, "hilbert_index"),
      (args: Seq[Expression]) => args match {
        case IntegerLiteral(bits) +: coords if coords.nonEmpty =>
          import org.apache.spark.sql.catalyst.expressions.Cast
          import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
          // only LOSSLESS widening casts: a silent long/double truncation
          // would compute a wrong curve position instead of erroring, and
          // a wrong clustering key is invisible until skipping degrades.
          // Anything else reaches HilbertIndex uncast and fails analysis
          // with the expression's own int-coordinates type error.
          graft.functions.HilbertIndex(bits, coords.map(c => c.dataType match {
            case ByteType | ShortType => Cast(c, IntegerType)
            case _ => c
          }))
        case _ => throw new IllegalArgumentException(
          "hilbert_index(bits, c1, ..., ck) expects an integer-literal bit " +
            "depth and k int coordinate columns")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[graft.functions.SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.SortedIntersectCount(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_count(a, b) expects two sorted bigint-array columns")
      }))
    // Column-built text functions exposed to stage SQL: the builder wraps
    // the argument expression as a Column, reuses the library definition,
    // and unwraps the resulting expression tree — one definition, two APIs.
    def columnFn(name: String, build: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
        : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
      new FunctionIdentifier(name),
      new ExpressionInfo(graft.functions.Text.getClass.getName, name),
      (args: Seq[Expression]) => args match {
        case Seq(e) => org.apache.spark.sql.GraftShims.convertedExpression(
          build(org.apache.spark.sql.GraftShims.column(e)))
        case _ => throw new IllegalArgumentException(s"$name(text) expects one string column")
      })
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[graft.functions.WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (args: Seq[Expression]) => args match {
        case Seq(text, IntegerLiteral(n), IntegerLiteral(w)) =>
          graft.functions.WinnowFingerprints(text, n, w)
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints(text, n, w) expects a string column and integer literals")
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.functions.NfcNormalize(s)
        case _ => throw new IllegalArgumentException(
          "nfc_normalize(text) expects one string column")
      }))
    ext.injectFunction(columnFn("quality_score", graft.functions.Text.qualityScore))
    ext.injectFunction(columnFn("lang_id", graft.functions.Text.langId))
    ext.injectFunction(columnFn("token_count", c => graft.functions.Text.tokenCount(c)))
    ext.injectFunction(columnFn("dup_word_ratio", c => graft.functions.Text.dupNgramRatio(c, 1)))
    ext.injectFunction(columnFn("normalize_text", graft.functions.Text.normalizeText))
    // the full rule-metric struct; `gopher_pass` is the common filter form
    ext.injectFunction(columnFn("gopher_flags", graft.functions.Text.gopherFlags))
    ext.injectFunction(columnFn("gopher_pass",
      c => graft.functions.Text.gopherFlags(c).getField("pass")))
    ext.injectFunction(columnFn("pii_redact", graft.functions.Text.piiRedact))
  }
}
