package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass document sketches.
  *
  * Both sketches here were first built compositionally (explode the words
  * into a 64-conditional-sum hash aggregate for SimHash; 32 `transform`
  * array passes for the MinHash signature). Correct, but the SimHash form
  * pays an explode shuffle plus an aggregate too wide for whole-stage
  * codegen, and the MinHash form re-walks the shingle array once per hash
  * function in interpreted lambdas. Each sketch is a pure per-document
  * function of the text, so the natural physical shape is ONE codegen'd
  * scalar expression per document: no explode, no shuffle, no aggregate —
  * the sketch computes inside the scan stage and the operator's only
  * shuffles are the tiny (id, sketch) frames downstream. At 100 TB that
  * turns the signature step from the dominant stage into a map-side detail.
  */
object SimHash64Util {

  /** 64-bit SimHash of the whitespace-tokenized words (per occurrence, not
    * distinct — every repeat votes again), or null when the input has no
    * words (the compositional explode→aggregate form emitted no row for
    * wordless documents; callers filter the nulls to keep that contract).
    *
    * Bit numbering matches the compositional form exactly:
    *   - portable: word hash = upper 64 bits of md5 (big-endian); fingerprint
    *     bit j (as `1L << j`) is the sign of the vote sum over md5 bit
    *     `63 - j` — "hex-digit order", reproducible in any engine with md5.
    *   - fast: word hash = xxhash64(word) (seed 42, Spark's built-in);
    *     fingerprint bit j votes with word-hash bit j.
    */
  def simhash(s: UTF8String, portable: Boolean): java.lang.Long = {
    val counters = new Array[Int](64)
    val words = ShingleUtil.Whitespace.split(s.toString)
    var any = false
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (!w.isEmpty) {
        any = true
        val u = UTF8String.fromString(w)
        val wh = if (portable) Md5Bits64Util.bits(u) else XXH64.hashUTF8String(u, 42L)
        var j = 0
        while (j < 64) {
          val bit = if (portable) (wh >>> (63 - j)) & 1L else (wh >>> j) & 1L
          counters(j) += (if (bit == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
}

case class SimHash64(child: Expression, portable: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Util.simhash(input.asInstanceOf[UTF8String], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.SimHash64Util.simhash($c, $portable);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** DataFrame-API entry: `SimHash64(col("text"), portable = true)`. */
  def apply(c: Column, portable: Boolean): Column =
    GraftShims.column(SimHash64(GraftShims.expression(c), portable))
}

/** One-pass MinHash signature over a shingle array.
  *
  * h_i(x) = (a_i·x + b_i) mod p over x = crc32(shingle) mod p — identical
  * arithmetic to the compositional `array_min(transform(...))` form (and to
  * the DuckDB oracle), but each shingle is CRC'd once and all k running
  * minima update in the same pass. Returns null for an empty shingle array
  * (`array_min` of an empty transform is null per hash in the compositional
  * form; a null signature falls out of the band equi-join downstream).
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
  extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty, "coefficient arrays must match and be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  def compute(ar: ArrayData): ArrayData = {
    val n = ar.numElements()
    if (n == 0) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val crc = new java.util.zip.CRC32
    var i = 0
    while (i < n) {
      val s = ar.getUTF8String(i)
      crc.reset()
      crc.update(s.getBytes)
      val x = crc.getValue % p
      var j = 0
      while (j < k) {
        val h = (x * a(j) + b(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** DataFrame-API entry over a shingle-array column. */
  def apply(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(c), a.toArray, b.toArray, p))
}
