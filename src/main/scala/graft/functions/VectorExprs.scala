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

object QuantizeUtil {
  /** Symmetric int8 quantization in one pass: scale = 127/max|v|, q_i =
    * clamp(⌊v_i·scale + 0.5⌋, ±127); zero/empty vectors quantize to zeros
    * with scale 0. Null elements poison the result to NULL (same as the
    * compositional transform form). Arithmetic matches the documented
    * engine-portable definition bit-for-bit (floor(x+0.5) half-up).
    */
  def quantize(v: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val a = math.abs(v.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs > 0) 127.0 / maxAbs else 0.0
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = math.floor(v.getDouble(i) * scale + 0.5)
      q(i) = Integer.valueOf(math.max(-127.0, math.min(127.0, x)).toInt)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new org.apache.spark.sql.catalyst.util.GenericArrayData(q), scale))
  }
}

/** `quantize_int8(v)`: one-pass native form of [[graft.ops.Ann.quantizeInt8]]
  * — `struct(q: array<int>, scale: double)`. The compositional transform
  * form walks the array once per HOF lambda, interpreted; this is a single
  * codegen'd loop.
  */
case class QuantizeInt8(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 expects an array<double> input, got ${dt.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("q",
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)),
    org.apache.spark.sql.types.StructField("scale",
      DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(v: Any): Any =
    QuantizeUtil.quantize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("qz")
      s"""
         |InternalRow $r = graft.functions.QuantizeUtil.quantize($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def apply(v: Column): Column =
    GraftShims.column(QuantizeInt8(GraftShims.expression(v.cast("array<double>"))))
}

/** One-pass hashed bag-of-words featurizer for the quality classifier
  * ([[graft.ops.Quality]]): md5 each token ONCE, bucket by the first 4
  * digest bytes mod `nFeatures`, accumulate counts. The composed HOF form
  * (`transform(0..n-1, i => size(filter(buckets, _ === i)))`) re-walks the
  * token array — re-evaluating every md5 — once per feature index, i.e.
  * O(nFeatures × tokens) digests per row; this is O(tokens). Measured at
  * sf0.1 / 64 features that is the difference between ~39 s and ~1 s for
  * q96. Null tokens are skipped (the HOF form filters them out the same
  * way); a null array yields NULL.
  */
object HashedBowUtil {
  // per-row getInstance("MD5") pays a provider lookup + allocation in the
  // scoring scan; the ThreadLocal + reset pattern matches WinnowUtil /
  // PositionalHashUtil (ADVICE r5)
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def counts(words: ArrayData, nFeatures: Int): ArrayData = {
    val acc = new Array[Double](nFeatures)
    val md = digest.get()
    md.reset()
    val len = words.numElements()
    var i = 0
    while (i < len) {
      if (!words.isNullAt(i)) {
        val d = md.digest(words.getUTF8String(i).getBytes)
        val b = ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % nFeatures).toInt
        acc(b) += 1.0
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }
}

case class HashedBow(child: Expression, nFeatures: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hashed_bow expects an array<string> input, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_bow"

  override def nullSafeEval(v: Any): Any =
    HashedBowUtil.counts(v.asInstanceOf[ArrayData], nFeatures)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashedBowUtil.counts($a, $nFeatures);")

  override protected def withNewChildInternal(newChild: Expression): HashedBow =
    copy(child = newChild)
}

object HashedBow {
  def apply(words: Column, nFeatures: Int): Column =
    GraftShims.column(HashedBow(GraftShims.expression(words), nFeatures))
}
