package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, NullType}

/** Native set ops for the near-dup verification hot path.
  *
  * Every candidate pair a prefix/band/chunk blocker emits is verified with
  * an exact overlap count over the docs' shingle-hash sets. The built-in
  * form `size(array_intersect(a, b))` builds a hash set AND materializes the
  * intersection array per row — per-pair allocation on the single most
  * executed path of the dedup operators. [[SortedIntersectCount]] computes
  * only the count, by a linear merge over the two pre-sorted arrays: no
  * allocation, no hashing, whole-stage-codegen'd.
  */
object SetUtil {
  /** |a ∩ b| for two ascending-sorted long arrays with no null elements.
    * Duplicate values count once (set semantics, matching array_intersect).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        val v = x
        while (i < na && a.getLong(i) == v) i += 1
        while (j < nb && b.getLong(j) == v) j += 1
      }
    }
    c
  }
}

/** `sorted_intersect_count(a, b)`: exact |a ∩ b| of two ascending-sorted
  * `array<bigint>` columns. Inputs MUST be sorted ascending (e.g. via
  * `sort_array`) and null-element-free — hash arrays built with `xxhash64`
  * satisfy both by construction. NULL input array ⇒ NULL.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetUtil.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetUtil.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectCount(
      GraftShims.expression(a), GraftShims.expression(b)))
}
