package graft.sources

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** `BitmapNotContains(bitmap)(row_index)`: TRUE iff the row index is NOT in
  * the file's deletion-vector bitmap — i.e. the row is live under
  * merge-on-read. This is the row filter for every DV-carrying file of a
  * Delta scan ([[DeltaLog.readFiles]]); as a native codegen'd expression it
  * keeps exactly those scans — the ones a big merge-on-read table has most
  * of — inside whole-stage codegen, where a Scala UDF would break the span
  * and pay boxing per row.
  *
  * The decoded [[DeletionVectors.RoaringArray]] is embedded as a codegen
  * reference object (driver-decoded once per file, shipped with the plan —
  * bitmaps are KB-scale, bounded by the DV file's own size). Null
  * semantics: the row-index metadata column is never null on a file scan,
  * but nulls propagate anyway (standard unary-expression contract).
  */
case class BitmapNotContains(
    bitmap: DeletionVectors.RoaringArray,
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_live_row"

  override protected def nullSafeEval(input: Any): Any =
    !bitmap.contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvBitmap", bitmap,
      classOf[DeletionVectors.RoaringArray].getName)
    val idx = child.genCode(ctx)
    ev.copy(code =
      code"""
        |${idx.code}
        |boolean ${ev.isNull} = ${idx.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) {
        |  ${ev.value} = !$ref.contains(${idx.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BitmapNotContains =
    copy(child = newChild)
}

object BitmapNotContains {
  def apply(bitmap: DeletionVectors.RoaringArray, idx: Column): Column =
    GraftShims.column(BitmapNotContains(bitmap, GraftShims.expression(idx)))
}
