package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling.
  *
  * The pure-`functions._` formulation (split → filter → transform/slice/
  * concat_ws → array_distinct) is semantically right but executes as
  * interpreted higher-order-function lambdas — and worse, optimizer rules
  * (InferFiltersFromGenerate + predicate pushdown) clone the whole
  * expression into scan-level filters, so the O(words·n) work runs 2-3× per
  * row on one pre-shuffle partition. This custom Catalyst [[WordShingles]]
  * expression computes the same array in one tight native pass and
  * participates in whole-stage codegen (`doGenCode` emits a single static
  * call), so cloning it is cheap and nothing breaks the codegen pipeline.
  *
  * Semantics are identical to the composed form (and to the DuckDB oracle's
  * `string_split_regex`-based construction): ASCII-regex whitespace split,
  * empty tokens dropped, shingles joined by single spaces, first-occurrence
  * distinct order, `[]` for documents shorter than n words.
  */
object ShingleUtil {
  /** Precompiled: String.split(regex) recompiles the pattern per call for
    * multi-char regexes — per-document cost on every shingling/sketch path.
    */
  val Whitespace: java.util.regex.Pattern = java.util.regex.Pattern.compile("\\s+")

  def shingles(s: UTF8String, n: Int): ArrayData = {
    val words = Whitespace.split(s.toString)
    var wc = 0
    var i = 0
    while (i < words.length) { if (!words(i).isEmpty) { words(wc) = words(i); wc += 1 }; i += 1 }
    if (wc < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](wc * 2)
    i = 0
    while (i <= wc - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** DataFrame-API entry: `WordShingles(lower(col("text")), 3)`. */
  def apply(c: Column, n: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(c), n))
}

/** Native character n-gram shingling with stride (see Text.charShingles for
  * semantics: lowercasing is the CALLER's job here, distinct first-occurrence
  * order, `[]` under n chars). One tight pass per row, whole-stage codegen —
  * the composed transform/substring form is interpreted per window and gets
  * cloned by optimizer rules exactly like the word form.
  */
object CharShingleUtil {
  // positions are CODEPOINTS, matching Spark's length/substring and the
  // DuckDB oracle's substr: the BMP fast path windows by UTF-16 units
  // (identical for surrogate-free text), supplementary-plane text takes
  // the codepoint-array path so emoji are never split mid-character
  def shingles(s: UTF8String, n: Int, stride: Int): ArrayData = {
    val str = s.toString
    val bmp = str.codePointCount(0, str.length) == str.length
    val cps: Array[Int] = if (bmp) null else str.codePoints().toArray
    val len = if (bmp) str.length else cps.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](len / stride * 2)
    var i = 0
    while (i <= len - n) {
      seen.add(if (bmp) str.substring(i, i + n) else new String(cps, i, n))
      i += stride
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class CharShingles(child: Expression, n: Int, stride: Int)
  extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingleUtil.shingles(input.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShingleUtil.shingles($c, $n, $stride)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  /** DataFrame-API entry: `CharShingles(lower(col("text")), 8, 4)`. */
  def apply(c: Column, n: Int, stride: Int): Column =
    GraftShims.column(CharShingles(GraftShims.expression(c), n, stride))
}

/** Native winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03): per-position character n-gram md5s, minimum per window of
  * `w` consecutive positions, distinct in first-occurrence order — exactly
  * the composed `Text.positionalShingleHashes` → `Text.winnowMinima`
  * pipeline (and the DuckDB oracle), but one tight pass: digests compare
  * as unsigned bytes (hex order) and only the selected minima are
  * hex-encoded; ASCII text hashes byte slices in place with zero substring
  * allocations. The composed HOF form was 12.7s at sf0.1 — interpreted
  * lambdas paying a digest per position AND a string alloc per window.
  * Lowercasing is the CALLER's job (the [[CharShingleUtil]] contract);
  * positions index codepoints, matching the composed form and the oracle
  * (see [[CharShingleUtil]]).
  */
object WinnowUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def fingerprints(s: UTF8String, n: Int, w: Int): ArrayData = {
    val str = s.toString
    val bytes = s.getBytes
    val ascii = bytes.length == str.length
    // positions index CODEPOINTS (Spark length/substring and DuckDB substr
    // semantics): ASCII hashes byte slices in place; surrogate-free BMP
    // slices by UTF-16 units (equal to codepoints); astral text slices a
    // codepoint array so surrogate pairs are never split mid-character
    val bmp = ascii || str.codePointCount(0, str.length) == str.length
    val cps: Array[Int] = if (bmp) null else str.codePoints().toArray
    val positions = (if (bmp) str.length else cps.length) - n + 1
    if (positions < w) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val ds = new Array[Array[Byte]](positions)
    var i = 0
    while (i < positions) {
      md.reset()
      if (ascii) md.update(bytes, i, n)
      else if (bmp) md.update(str.substring(i, i + n)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else md.update(new String(cps, i, n)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ds(i) = md.digest()
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String](positions / w * 4 + 8)
    var j = 0
    while (j <= positions - w) {
      var m = ds(j)
      var k = 1
      while (k < w) { if (less(ds(j + k), m)) m = ds(j + k); k += 1 }
      seen.add(hex(m))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class WinnowFingerprints(child: Expression, n: Int, w: Int)
  extends UnaryExpression {

  require(n >= 2 && w >= 1, "need n >= 2 and w >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.fingerprints(input.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowUtil.fingerprints($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** DataFrame-API entry: `WinnowFingerprints(lower(col("text")), 8, 4)`. */
  def apply(c: Column, n: Int, w: Int): Column =
    GraftShims.column(WinnowFingerprints(GraftShims.expression(c), n, w))
}

/** The upper 64 bits of md5(input) as a big-endian long — the native form
  * of "decode the first 16 hex chars of md5": bit j (j = 0 the MSB of the
  * first hex digit) is `(value >> (63 - j)) & 1`, exactly the bit numbering
  * the portable SimHash and its DuckDB oracle use. One digest + one
  * 8-byte read per value instead of 16 interpreted hex-digit decodes.
  */
object Md5Bits64Util {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def bits(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong // big-endian = hex-digit order
  }
}

case class Md5Bits64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_bits64 expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_bits64"

  override def nullSafeEval(input: Any): Any =
    Md5Bits64Util.bits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Bits64Util.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Bits64 =
    copy(child = newChild)
}

object Md5Bits64 {
  def apply(c: Column): Column = GraftShims.column(Md5Bits64(GraftShims.expression(c)))
}

/** Per-position 64-bit window hashes for exact duplicated-substring span
  * detection ([[graft.ops.Spans]]): element `i` (0-based) is the upper 64
  * bits of md5 of the length-`n` window starting at codepoint `i` — the
  * [[Md5Bits64Util]] value of what `substring(text, i+1, n)` returns, so
  * the DuckDB oracle's `substr(md5(substr(t, pos, n)), 1, 16)` is the
  * bijective hex image of each element. One digest pass per row (ASCII
  * hashes byte slices in place, zero substring allocations — the
  * [[WinnowUtil]] structure) and an 8-byte posting key: the composed
  * `transform(sequence(...), md5(substring(...)))` form paid interpreted
  * lambdas plus a 32-char string key through two corpus exchanges
  * (measured 13.8s → the native form is the q92 winnow cut applied to the
  * span miner). Empty array under `n` codepoints; null in, null out.
  */
object PositionalHashUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val bytes = s.getBytes
    val ascii = bytes.length == str.length
    // positions index CODEPOINTS (Spark substring / DuckDB substr), same
    // three-tier path as WinnowUtil: ASCII → byte slices, surrogate-free
    // BMP → UTF-16 slices, astral → codepoint-array slices
    val bmp = ascii || str.codePointCount(0, str.length) == str.length
    val cps: Array[Int] = if (bmp) null else str.codePoints().toArray
    val positions = (if (bmp) str.length else cps.length) - n + 1
    if (positions < 1) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val out = new Array[Any](positions)
    var i = 0
    while (i < positions) {
      md.reset()
      if (ascii) md.update(bytes, i, n)
      else if (bmp) md.update(str.substring(i, i + n)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else md.update(new String(cps, i, n)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = java.nio.ByteBuffer.wrap(md.digest(), 0, 8).getLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class PositionalHashes64(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 2, "need n >= 2")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"positional_hashes64 expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "positional_hashes64"

  override def nullSafeEval(input: Any): Any =
    PositionalHashUtil.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PositionalHashUtil.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PositionalHashes64 =
    copy(child = newChild)
}

object PositionalHashes64 {
  /** DataFrame-API entry: `PositionalHashes64(lower(col("text")), 20)`. */
  def apply(c: Column, n: Int): Column =
    GraftShims.column(PositionalHashes64(GraftShims.expression(c), n))
}

/** Fused shingle→xxhash64 expressions (r18): the jaccard miners only ever
  * consume `xxhash64(shingle)` — the shingle STRINGS died immediately
  * after an explode, so materializing an `Array[UTF8String]` (one UTF-16→
  * UTF-8 encode + object per window), exploding STRING rows and hashing
  * them per row was pure allocation overhead on the hottest scan stage.
  * These emit the distinct window hashes directly as an `Array[Long]`,
  * hashing UTF-8 byte slices of the input IN PLACE with the exact
  * function/seed `functions.xxhash64` uses (XXH64, seed 42) — so every
  * emitted value equals `xxhash64(<shingle string>)` bit-for-bit and the
  * posting lists are unchanged. Distinctness is per-doc first-occurrence,
  * now keyed by the 64-bit hash rather than the string: the two differ
  * only if two distinct windows of one document collide in 64 bits
  * (p ≈ windows²/2⁶⁴ — the same collision the pair miner already accepts
  * across documents, see [[graft.ops.Dedup.minePairs]]).
  */
object ShingleHashUtil {
  private final val Seed = 42L

  /** Minimal open-addressed long set (power-of-two capacity, linear
    * probing) — per-document window dedup without boxing. */
  private final class LongSet(expected: Int) {
    private var cap = {
      var c = 8
      while (c < expected * 2 && c < (1 << 30)) c <<= 1
      c
    }
    private var keys = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    def add(h: Long): Boolean = {
      if ((n + 1) * 2 > cap) grow()
      // cap is a power of two and cap-1 has a clear sign bit, so the AND
      // is non-negative even for negative int hashes
      var i = java.lang.Long.hashCode(h) & (cap - 1)
      while (used(i)) {
        if (keys(i) == h) return false
        i = (i + 1) & (cap - 1)
      }
      used(i) = true; keys(i) = h; n += 1; true
    }
    private def grow(): Unit = {
      val ok = keys; val ou = used
      cap <<= 1
      keys = new Array[Long](cap); used = new Array[Boolean](cap); n = 0
      var j = 0
      while (j < ok.length) { if (ou(j)) add(ok(j)); j += 1 }
    }
  }

  private def utf8Len(lead: Byte): Int =
    if (lead >= 0) 1
    else if ((lead & 0xE0) == 0xC0) 2
    else if ((lead & 0xF0) == 0xE0) 3
    else 4

  private def isWs(b: Byte): Boolean = // java regex \s (ASCII): [ \t\n\x0B\f\r]
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  private val empty = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    .fromPrimitiveArray(Array.empty[Long])

  /** Distinct char-n-gram (codepoint windows, `stride`) hashes of `s` —
    * each value == xxhash64 of the window's string. */
  def charHashes(s: UTF8String, n: Int, stride: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // codepoint byte offsets (UTF-8 lead bytes; one slot per codepoint)
    val offs = new Array[Int](len + 1)
    var nc = 0
    var i = 0
    while (i < len) { offs(nc) = i; nc += 1; i += utf8Len(bytes(i)) }
    offs(nc) = len
    if (nc < n) return empty
    val count = (nc - n) / stride + 1
    val set = new LongSet(count)
    val out = new Array[Long](count)
    var k = 0
    var p = 0
    while (p <= nc - n) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offs(p),
        offs(p + n) - offs(p), Seed)
      if (set.add(h)) { out(k) = h; k += 1 }
      p += stride
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  /** Distinct word-n-gram hashes of `s` (ASCII-whitespace split, single
    * spaces between words — [[ShingleUtil.shingles]]' exact strings),
    * each value == xxhash64 of the shingle string. */
  def wordHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // word boundaries as byte ranges (regex \s is ASCII-only, so the
    // byte scan splits exactly like Whitespace.split on the string)
    var wc = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        starts(wc) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(wc) = i
        wc += 1
      } else i += 1
    }
    if (wc < n) return empty
    val count = wc - n + 1
    val set = new LongSet(count)
    val out = new Array[Long](count)
    var k = 0
    var buf = scratch.get()
    i = 0
    while (i <= wc - n) {
      var need = n - 1
      var j = 0
      while (j < n) { need += ends(i + j) - starts(i + j); j += 1 }
      if (buf.length < need) {
        buf = new Array[Byte](java.lang.Integer.highestOneBit(need) << 1)
        scratch.set(buf)
      }
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val wl = ends(i + j) - starts(i + j)
        System.arraycopy(bytes, starts(i + j), buf, pos, wl)
        pos += wl
        j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, Seed)
      if (set.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }
}

case class WordShingleHashes64(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes64 expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes64"

  override def nullSafeEval(input: Any): Any =
    ShingleHashUtil.wordHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.wordHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes64 =
    copy(child = newChild)
}

object WordShingleHashes64 {
  def apply(c: Column, n: Int): Column =
    GraftShims.column(WordShingleHashes64(GraftShims.expression(c), n))
}

case class CharShingleHashes64(child: Expression, n: Int, stride: Int)
  extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hashes64 expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes64"

  override def nullSafeEval(input: Any): Any =
    ShingleHashUtil.charHashes(input.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.charHashes($c, $n, $stride)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes64 =
    copy(child = newChild)
}

object CharShingleHashes64 {
  def apply(c: Column, n: Int, stride: Int): Column =
    GraftShims.column(CharShingleHashes64(GraftShims.expression(c), n, stride))
}
