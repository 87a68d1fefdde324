package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** k-dimensional Hilbert curve index (Skilling's transpose algorithm —
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004; public).
  *
  * Role: the space-filling curve behind liquid-style clustering rewrites
  * ([[graft.destinations.ZOrder.cluster]] with `curve = "hilbert"`). Both
  * Morton (Z-order) and Hilbert map k range-bucket ids to one sort key so
  * every clustered column's per-file min/max interval tightens, but the
  * Hilbert curve never takes the long diagonal jumps Morton takes between
  * quadrants — consecutive curve positions are always unit steps — so at
  * equal file counts each file covers a tighter k-d box and data skipping
  * prunes strictly more files on box predicates. That is why current-
  * generation clustered tables (Delta liquid clustering, the public
  * `clusteredTable` writer feature) cluster on Hilbert rather than Morton.
  *
  * Validated properties (HilbertSpec): bijective on the full `2^(k*bits)`
  * cube and unit-step adjacent for k=2..4, and at k=2 bit-identical to the
  * classic xy2d formulation (the form a DuckDB recursive CTE replays for
  * the q139 oracle).
  */
object HilbertCurve {

  /** Coordinates → Hilbert index. `coords` are clamped to `[0, 2^bits)` —
    * clamping (not masking) so out-of-range inputs keep boundary order
    * instead of wrapping. Pure function; does not mutate its argument.
    */
  def index(coords: Array[Int], bits: Int): Long = {
    val n = coords.length
    val max = (1 << bits) - 1
    val x = new Array[Int](n)
    var i = 0
    while (i < n) {
      x(i) = math.min(math.max(coords(i), 0), max)
      i += 1
    }
    // Skilling AxesToTranspose: inverse-undo then Gray-encode, in place
    var q = 1 << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0
    q = 1 << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → linear index: bit b of x(i) lands at index bit
    // b*n + (n-1-i) (MSB-first interleave across dimensions)
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        d = (d << 1) | ((x(i) >> b) & 1)
        i += 1
      }
      b -= 1
    }
    d
  }
}

/** `hilbert_index(bits, c1 … ck)`: the Hilbert curve position of k int
  * coordinates on the order-`bits` curve, as a codegen'd scalar — the
  * clustering sort key stays inside whole-stage codegen like the rest of
  * the rewrite plan. Null semantics: any null coordinate yields NULL (the
  * clustering caller's bucket ids are never null — nulls land in bucket 0
  * upstream, same as Z-order).
  */
case class HilbertIndex(bits: Int, coords: Seq[Expression]) extends Expression {
  require(bits >= 1 && bits <= 16, s"hilbert bits out of range: $bits")
  require(coords.nonEmpty && coords.size * bits <= 63,
    s"hilbert_index supports up to ${63 / bits} dimensions at $bits bits, " +
      s"got ${coords.size}")

  override def children: Seq[Expression] = coords
  override def dataType: DataType = LongType
  override def nullable: Boolean = coords.exists(_.nullable)
  override def prettyName: String = "hilbert_index"

  // byte/short widen LOSSLESSLY to the int coordinate space, so they are
  // accepted directly; long/double must fail analysis rather than silently
  // truncate to a wrong curve position (ADVICE r13)
  override def checkInputDataTypes(): TypeCheckResult =
    if (coords.forall(c => c.dataType == IntegerType ||
        c.dataType == ByteType || c.dataType == ShortType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects int (or losslessly-widenable byte/short) " +
        s"coordinates, got " +
        coords.map(_.dataType.catalogString).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val arr = new Array[Int](coords.size)
    var i = 0
    while (i < arr.length) {
      val v = coords(i).eval(input)
      if (v == null) return null
      arr(i) = v match {
        case b: java.lang.Byte => b.intValue()
        case s: java.lang.Short => s.intValue()
        case x => x.asInstanceOf[Int]
      }
      i += 1
    }
    HilbertCurve.index(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = coords.map(_.genCode(ctx))
    val arr = ctx.freshName("hilbertCoords")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) { ${ev.isNull} = true; } else { $arr[$i] = ${e.value}; }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |${CodeGenerator.javaType(LongType)} ${ev.value} = -1L;
        |int[] $arr = new int[${coords.size}];
        |$fill
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.HilbertCurve.index($arr, $bits);
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(coords = newChildren)
}

object HilbertIndex {
  /** DataFrame-API entry: `HilbertIndex(6, Seq(col("a"), col("b")))`.
    * No blanket `cast("int")` here: long/double coordinates must fail the
    * expression's own analysis-time type check instead of silently
    * truncating to a wrong curve position; byte/short are widened
    * losslessly by the expression itself (ADVICE r13).
    */
  def apply(bits: Int, cols: Seq[Column]): Column =
    GraftShims.column(HilbertIndex(bits, cols.map(GraftShims.expression)))
}
