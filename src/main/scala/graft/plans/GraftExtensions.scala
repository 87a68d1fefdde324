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
  }
}
