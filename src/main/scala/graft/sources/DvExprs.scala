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

/** Path-keyed deletion-vector lookup for Iceberg v3 scans: several data
  * files share ONE consolidated scan there (unlike Delta's per-file
  * groups), so the bitmap is found per row by file path. Keys are
  * [[UTF8String]] so the probe is a direct hash lookup on the scan's own
  * string representation — no per-row `String` conversion.
  */
final class DvLookup(
    m: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      DeletionVectors.RoaringArray]) extends Serializable {
  /** TRUE iff (file, pos) is live — no bitmap for the file, or not set. */
  def live(file: org.apache.spark.unsafe.types.UTF8String, pos: Long): Boolean = {
    val b = m.get(file)
    b == null || !b.contains(pos)
  }
}

object DvLookup {
  def apply(byFile: Map[String, DeletionVectors.RoaringArray]): DvLookup = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      DeletionVectors.RoaringArray]()
    byFile.foreach { case (k, v) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(k), v)
    }
    new DvLookup(m)
  }
}

/** `DvLookupLive(lookup)(file, pos)`: the merge-on-read row filter for a
  * consolidated Iceberg v3 scan — codegen'd like [[BitmapNotContains]]
  * so DV-heavy scans stay inside whole-stage codegen.
  */
case class DvLookupLive(
    lookup: DvLookup,
    file: Expression,
    pos: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = file
  override def right: Expression = pos
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_lookup_live"

  override protected def nullSafeEval(f: Any, p: Any): Any =
    lookup.live(f.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[DvLookup].getName)
    defineCodeGen(ctx, ev, (f, p) => s"$ref.live($f, $p)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvLookupLive =
    copy(file = newLeft, pos = newRight)
}

object DvLookupLive {
  def apply(byFile: Map[String, DeletionVectors.RoaringArray],
      file: Column, pos: Column): Column =
    GraftShims.column(DvLookupLive(DvLookup(byFile),
      GraftShims.expression(file), GraftShims.expression(pos)))
}
