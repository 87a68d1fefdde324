package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** Native vector math for the ANN / near-dup hot path.
  *
  * The composed form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * semantically right but executes as interpreted higher-order-function
  * lambdas — the dominant cost of every cosine-scoring operator once norms
  * are hoisted (measured: the interpreted HOF pair loop is ~3-5× slower
  * than a native loop). [[DotProduct]] computes the same value in one tight
  * loop inside whole-stage codegen.
  *
  * Null semantics match the composed form exactly: `zip_with` pads a
  * shorter array with nulls and `null * x` poisons the sum, so a length
  * mismatch or any null element yields NULL. Summation is left-to-right, so
  * results are bit-identical to the HOF formulation.
  */
object VectorUtil {
  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.functions.VectorUtil.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** DataFrame-API entry: `DotProduct(col("a"), col("b"))`. Casts inputs to
    * `array<double>` so float-embedding columns work directly.
    */
  def apply(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a.cast("array<double>")),
      GraftShims.expression(b.cast("array<double>"))))
}
