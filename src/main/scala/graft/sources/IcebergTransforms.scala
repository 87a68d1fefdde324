package graft.sources

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apache Iceberg PARTITION TRANSFORMS (public Table Spec "Partitioning"
  * + Appendix B "32-bit Hash Requirements", iceberg.apache.org/spec):
  * `identity`, `year`, `month`, `day`, `hour`, `bucket[N]`, `truncate[W]`,
  * `void` — shared by the foreign-table reader ([[IcebergRead]]: scan-time
  * pruning THROUGH the transform) and the native destination
  * ([[graft.destinations.IcebergWrite]]: write-side partition tuples).
  *
  * Spec semantics implemented exactly:
  *   - `year`/`month` count whole years/months from 1970-01; `day` counts
  *     days from 1970-01-01; `hour` counts hours from the epoch — all
  *     FLOOR-based (negative timestamps bin correctly), all computed from
  *     the value's own micros/days, never the session timezone.
  *   - `bucket[N]` = `(murmur3_x86_32(v) & Int.MaxValue) % N` over the
  *     spec's byte layouts: int/long/date/timestamp hash as the 8-byte
  *     little-endian LONG (int upcasts, so `bucket(34)` == `bucket(34L)`),
  *     strings hash their UTF-8 bytes, decimals the minimal two's-
  *     complement big-endian of the unscaled value, binary its bytes.
  *     The spec's Appendix-B test vectors are pinned in the suite.
  *   - `truncate[W]` floors integers to a multiple of W (`v - (v mod W)`
  *     with positive mod), truncates strings to W CODE POINTS (not UTF-16
  *     units), and decimals by unscaled-value floor.
  *
  * Monotonicity (the pruning contract): `year`/`month`/`day`/`hour` and
  * `truncate` are order-preserving, so a range predicate on the SOURCE
  * column maps to a range on the transform value; `bucket` preserves only
  * equality; `void` prunes nothing. All transforms map null to null.
  *
  * Scale: write-side derivation is plain codegen'd Spark expressions
  * (bucket via the native [[IcebergBucket]] expression — stays inside
  * whole-stage codegen); pruning is driver-side scalar math over
  * manifest metadata, never touching data files.
  */
object IcebergTransforms {

  sealed trait Transform
  case object Identity extends Transform
  case object Year extends Transform
  case object Month extends Transform
  case object Day extends Transform
  case object Hour extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class Truncate(w: Int) extends Transform
  case object Void extends Transform

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  /** Spec JSON spelling → transform (`bucket[16]`, `truncate[4]`). */
  def parse(s: String): Transform = s match {
    case "identity" => Identity
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case BucketRe(n) => Bucket(n.toInt)
    case TruncRe(w) => Truncate(w.toInt)
    case "void" => Void
    case other => throw new IllegalArgumentException(
      s"unknown Iceberg partition transform '$other'")
  }

  def render(t: Transform): String = t match {
    case Identity => "identity"
    case Year => "year"
    case Month => "month"
    case Day => "day"
    case Hour => "hour"
    case Bucket(n) => s"bucket[$n]"
    case Truncate(w) => s"truncate[$w]"
    case Void => "void"
  }

  /** Iceberg's conventional partition-field name for a transform. */
  def fieldName(t: Transform, source: String): String = t match {
    case Identity => source
    case Year => s"${source}_year"
    case Month => s"${source}_month"
    case Day => s"${source}_day"
    case Hour => s"${source}_hour"
    case Bucket(_) => s"${source}_bucket"
    case Truncate(_) => s"${source}_trunc"
    case Void => s"${source}_null"
  }

  /** Transform/source-type compatibility — refused loudly at create/read
    * rather than producing wrong tuples. */
  def validate(t: Transform, srcType: DataType, source: String): Unit = {
    def bad(): Nothing = throw new IllegalArgumentException(
      s"Iceberg transform ${render(t)} cannot apply to " +
        s"$source: ${srcType.catalogString}")
    t match {
      case Identity | Void => ()
      // Iceberg `timestamp` (without zone) is Spark's TimestampNTZType:
      // temporal transforms apply to BOTH flavors (the ntz value bins by
      // its wall-clock micros, the tz one by its UTC instant — spec exact)
      case Year | Month | Day => srcType match {
        case DateType | TimestampType | TimestampNTZType => ()
        case _ => bad()
      }
      case Hour => srcType match {
        case TimestampType | TimestampNTZType => ()
        case _ => bad()
      }
      case Bucket(n) =>
        require(n > 0, s"bucket[$n] needs a positive bucket count")
        srcType match {
          case IntegerType | LongType | DateType | TimestampType |
               TimestampNTZType | StringType | BinaryType | _: DecimalType => ()
          case _ => bad()
        }
      case Truncate(w) =>
        require(w > 0, s"truncate[$w] needs a positive width")
        srcType match {
          case IntegerType | LongType | StringType => ()
          case _ => bad()
        }
    }
  }

  // ------------------------------------------------------ 32-bit murmur3

  /** murmur3_x86_32, seed 0 — the public-domain MurmurHash3 finalization
    * the Iceberg spec mandates (Appendix B). Scala's MurmurHash3 and
    * Spark's `hash()` both use different seeds/layouts, so this is written
    * out explicitly and pinned against the spec's test vectors.
    */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0
    val n = data.length & ~3
    var i = 0
    while (i < n) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    val rem = data.length & 3
    if (rem >= 3) k1 ^= (data(n + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(n + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(n) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** hashLong: murmur3 of the value's 8-byte LITTLE-endian layout — ints,
    * dates, times and timestamps all upcast to this per the spec. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n
  def bucketBytes(b: Array[Byte], n: Int): Int = (murmur3(b) & Int.MaxValue) % n
  def bucketUtf8(s: UTF8String, n: Int): Int = bucketBytes(s.getBytes, n)
  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, n: Int): Int =
    bucketBytes(d.toJavaBigDecimal.unscaledValue.toByteArray, n)

  // --------------------------------------------------- scalar application

  private def epochDayOfMicros(micros: Long): Long =
    Math.floorDiv(micros, 86400000000L)

  private def yearOfDays(days: Long): Int =
    java.time.LocalDate.ofEpochDay(days).getYear - 1970

  private def monthOfDays(days: Long): Int = {
    val ld = java.time.LocalDate.ofEpochDay(days)
    (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
  }

  /** Truncate a string to `w` code points (the spec counts code points,
    * not UTF-16 units). */
  def truncateString(s: String, w: Int): String =
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))

  /** Apply the transform to ONE value in Catalyst internal form (Int days
    * for dates, Long micros for timestamps, UTF8String for strings) and
    * return the normalized JVM transform value (Int / Long / String) used
    * by pruning comparisons. None = null input, or a (transform, type)
    * pair pruning does not model — the caller must then keep the file.
    */
  def applyScalar(t: Transform, srcType: DataType, internal: Any): Option[Any] = {
    if (internal == null) return None
    t match {
      case Identity => normalizeInternal(srcType, internal)
      case Year => srcType match {
        case DateType => Some(yearOfDays(internal.asInstanceOf[Int].toLong))
        case TimestampType | TimestampNTZType =>
          Some(yearOfDays(epochDayOfMicros(internal.asInstanceOf[Long])))
        case _ => None
      }
      case Month => srcType match {
        case DateType => Some(monthOfDays(internal.asInstanceOf[Int].toLong))
        case TimestampType | TimestampNTZType =>
          Some(monthOfDays(epochDayOfMicros(internal.asInstanceOf[Long])))
        case _ => None
      }
      case Day => srcType match {
        case DateType => Some(internal.asInstanceOf[Int])
        case TimestampType | TimestampNTZType =>
          Some(epochDayOfMicros(internal.asInstanceOf[Long]).toInt)
        case _ => None
      }
      case Hour => srcType match {
        case TimestampType | TimestampNTZType =>
          Some(Math.floorDiv(internal.asInstanceOf[Long], 3600000000L).toInt)
        case _ => None
      }
      case Bucket(n) => srcType match {
        case IntegerType => Some(bucketLong(internal.asInstanceOf[Int].toLong, n))
        case LongType => Some(bucketLong(internal.asInstanceOf[Long], n))
        case DateType => Some(bucketLong(internal.asInstanceOf[Int].toLong, n))
        case TimestampType | TimestampNTZType =>
          Some(bucketLong(internal.asInstanceOf[Long], n))
        case StringType => Some(bucketUtf8(internal.asInstanceOf[UTF8String], n))
        case _: DecimalType =>
          Some(bucketDecimal(internal.asInstanceOf[Decimal], n))
        case BinaryType => Some(bucketBytes(internal.asInstanceOf[Array[Byte]], n))
        case _ => None
      }
      case Truncate(w) => srcType match {
        case IntegerType =>
          val v = internal.asInstanceOf[Int]
          Some(v - Math.floorMod(v, w))
        case LongType =>
          val v = internal.asInstanceOf[Long]
          Some(v - Math.floorMod(v, w.toLong))
        case StringType =>
          Some(truncateString(internal.asInstanceOf[UTF8String].toString, w))
        case _ => None
      }
      case Void => None
    }
  }

  /** Catalyst-internal → normalized JVM comparison value for the pruning
    * domain (Int / Long / String; None = a type pruning does not model). */
  private def normalizeInternal(srcType: DataType, v: Any): Option[Any] = srcType match {
    case IntegerType | DateType => Some(v.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long])
    case StringType => Some(v.asInstanceOf[UTF8String].toString)
    case _ => None
  }

  /** Manifest-avro partition value → the same normalized JVM domain. */
  def normalizeRaw(raw: AnyRef): Option[Any] = raw match {
    case null => None
    case i: java.lang.Integer => Some(i.intValue())
    case l: java.lang.Long => Some(l.longValue())
    case s: org.apache.avro.util.Utf8 => Some(s.toString)
    case s: String => Some(s)
    case _ => None
  }

  /** Total order over the normalized pruning domain (Int/Long unify).
    * Strings compare by CODE POINT — the order of their unsigned UTF-8
    * bytes, which is what Iceberg bound ordering is defined over. UTF-16
    * `compareTo` disagrees for astral characters (BMP U+E000..U+FFFF
    * sorts above surrogate pairs in UTF-16 but below them in UTF-8), so
    * it would mis-prune files whose bounds or probes leave the BMP.
    */
  def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Long) => java.lang.Long.compare(x.toLong, y)
    case (x: Long, y: Int) => java.lang.Long.compare(x, y.toLong)
    case (x: String, y: String) =>
      var i = 0; var j = 0
      while (i < x.length && j < y.length) {
        val cx = x.codePointAt(i); val cy = y.codePointAt(j)
        if (cx != cy) return java.lang.Integer.compare(cx, cy)
        i += Character.charCount(cx); j += Character.charCount(cy)
      }
      java.lang.Integer.compare(x.length - i, y.length - j)
    case _ => throw new IllegalArgumentException(
      s"incomparable pruning values: ${a.getClass} vs ${b.getClass}")
  }

  /** Whether the transform preserves source order (range predicates map
    * through); bucket preserves only equality. */
  def monotone(t: Transform): Boolean = t match {
    case Identity | Year | Month | Day | Hour | Truncate(_) => true
    case Bucket(_) | Void => false
  }

  // ------------------------------------------- write-side derived columns

  /** The derived Spark column for one partition field — plain codegen'd
    * builtins (timestamp math on `unix_micros`, never the session zone;
    * exact while |micros| < 2^53, i.e. through year ~2250) with the native
    * [[IcebergBucket]] expression for `bucket`.
    */
  def column(t: Transform, src: Column, srcType: DataType): Column = {
    // wall-clock micros for ntz via an EXPLICIT-UTC cast (never the
    // session zone); instant micros for tz — the spec's value domains
    def micros: Column = srcType match {
      case TimestampType => unix_micros(src)
      case TimestampNTZType => unix_micros(GraftShims.column(
        org.apache.spark.sql.catalyst.expressions.Cast(
          GraftShims.convertedExpression(src), TimestampType, Some("UTC"))))
      case _ => refuse(t, srcType)
    }
    def tsDays: Column = {
      val us = micros
      ((us - pmod(us, lit(86400000000L))) / 86400000000L).cast(IntegerType)
    }
    def dayDate: Column = srcType match {
      case DateType => src
      case TimestampType | TimestampNTZType => date_from_unix_date(tsDays)
      case _ => refuse(t, srcType)
    }
    t match {
      case Identity => src
      case Year => year(dayDate) - 1970
      case Month => (year(dayDate) - 1970) * 12 + month(dayDate) - 1
      case Day => dayDate
      case Hour => srcType match {
        case TimestampType | TimestampNTZType =>
          val us = micros
          ((us - pmod(us, lit(3600000000L))) / 3600000000L).cast(IntegerType)
        case _ => refuse(t, srcType)
      }
      case Bucket(n) =>
        val normalized: Column = srcType match {
          case IntegerType | LongType => src.cast(LongType)
          case DateType => unix_date(src).cast(LongType)
          case TimestampType | TimestampNTZType => micros
          case StringType | BinaryType | _: DecimalType => src
          case _ => refuse(t, srcType)
        }
        GraftShims.column(
          IcebergBucket(GraftShims.convertedExpression(normalized), n))
      case Truncate(w) => srcType match {
        // substring counts code points (UTF8String semantics) — spec-exact
        case StringType => substring(src, 1, w)
        case IntegerType | LongType =>
          (src - pmod(src, lit(w))).cast(srcType)
        case _ => refuse(t, srcType)
      }
      case Void => lit(null).cast(srcType)
    }
  }

  private def refuse(t: Transform, srcType: DataType): Nothing =
    throw new IllegalArgumentException(
      s"Iceberg transform ${render(t)} unsupported over ${srcType.catalogString}")

  /** Spark type of the derived partition column ([[column]]'s output). */
  def resultSparkType(t: Transform, srcType: DataType): DataType = t match {
    case Identity | Void => srcType
    case Year | Month | Hour => IntegerType
    case Day => DateType // human-readable hive dirs; manifests carry int days
    case Bucket(_) => IntegerType
    case Truncate(_) => srcType
  }

  // ------------------------------- manifest-list field-summary bounds

  /** Single-value binary (de)serialization for field-summary bounds
    * (spec Appendix D) over the pruning domain: int → 4-byte LE,
    * long → 8-byte LE, string → UTF-8. */
  def boundBytes(v: Any): Array[Byte] = v match {
    case i: Int =>
      val b = new Array[Byte](4)
      var k = 0; while (k < 4) { b(k) = ((i >>> (8 * k)) & 0xff).toByte; k += 1 }
      b
    case l: Long =>
      val b = new Array[Byte](8)
      var k = 0; while (k < 8) { b(k) = ((l >>> (8 * k)) & 0xff).toByte; k += 1 }
      b
    case s: String => s.getBytes("UTF-8")
    case other => throw new IllegalArgumentException(
      s"no single-value serialization for ${other.getClass}")
  }

  /** Decode a bound for the given transform/source pair; None = a type
    * this pruner does not model (callers must keep the manifest). */
  def boundValue(
      t: Transform, srcType: DataType, bytes: Array[Byte]): Option[Any] = {
    def le32: Int = {
      var v = 0; var k = 0
      while (k < 4 && k < bytes.length) { v |= (bytes(k) & 0xff) << (8 * k); k += 1 }
      v
    }
    def le64: Long = {
      var v = 0L; var k = 0
      while (k < 8 && k < bytes.length) { v |= (bytes(k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    t match {
      case Year | Month | Day | Hour | Bucket(_) => Some(le32)
      case Identity | Truncate(_) => srcType match {
        case IntegerType | DateType => Some(le32)
        case LongType | TimestampType | TimestampNTZType => Some(le64)
        case StringType => Some(new String(bytes, "UTF-8"))
        case _ => None
      }
      case Void => None
    }
  }
}

/** Native codegen'd Iceberg `bucket[N]` — murmur3_x86_32 per the spec over
  * a pre-normalized child (LONG for all integral/temporal sources, string/
  * decimal/binary as themselves). A UDF here would break whole-stage
  * codegen on the write path's partition derivation; this stays inside it.
  */
final case class IcebergBucket(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType | BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket needs long/string/binary/decimal input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => IcebergTransforms.bucketLong(input.asInstanceOf[Long], n)
    case StringType => IcebergTransforms.bucketUtf8(input.asInstanceOf[UTF8String], n)
    case BinaryType => IcebergTransforms.bucketBytes(input.asInstanceOf[Array[Byte]], n)
    case _: DecimalType => IcebergTransforms.bucketDecimal(input.asInstanceOf[Decimal], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case LongType => "bucketLong"
      case StringType => "bucketUtf8"
      case BinaryType => "bucketBytes"
      case _: DecimalType => "bucketDecimal"
    }
    defineCodeGen(ctx, ev, c =>
      s"graft.sources.IcebergTransforms.$fn($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}
