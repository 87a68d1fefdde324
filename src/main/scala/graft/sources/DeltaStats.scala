package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.types._
import scala.util.control.NonFatal

/** Shared stats machinery for the Delta protocol bridge: per-column file
  * intervals from add-action stats / partition values, a type-aware
  * comparator, and a CONSERVATIVE predicate evaluator. Every answer is
  * "could this file hold a matching row?" — parse failures, missing
  * columns, truncated or incomparable values all answer yes, so pruning
  * (on the read path via [[DeltaLog.readWhere]], on the write path via
  * upsert/replace) can only ever save work, never rows.
  */
private[graft] object DeltaStats {

  private val mapper = new ObjectMapper()

  private def str(a: Any): String = a match {
    case n: JsonNode => if (n.isNumber) n.decimalValue.toPlainString else n.asText
    case d: java.sql.Date => d.toString
    case x => x.toString
  }

  private def compareCodePoints(x: String, y: String): Int = {
    val xi = x.codePoints().toArray; val yi = y.codePoints().toArray
    var i = 0
    while (i < xi.length && i < yi.length) {
      if (xi(i) != yi(i)) return Integer.compare(xi(i), yi(i))
      i += 1
    }
    Integer.compare(xi.length, yi.length)
  }

  /** Timestamp stats value → instant. Accepts instants (literal probes),
    * ISO-with-offset ("...Z" — this engine and delta-spark), naive ISO
    * (assumed UTC — some engines omit the zone), and the hive partition
    * spelling ("yyyy-MM-dd HH:mm:ss[.S]"). None = unparseable (callers
    * keep the file). Parsing — never string comparison — is what makes
    * MIXED-precision stats (millis vs micros) order correctly.
    */
  private def tsInstant(a: Any): Option[java.time.Instant] = a match {
    case i: java.time.Instant => Some(i)
    case other =>
      val s0 = str(other)
      try Some(java.time.OffsetDateTime.parse(s0).toInstant)
      catch { case NonFatal(_) =>
        try Some(java.time.LocalDateTime.parse(s0.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC))
        catch { case NonFatal(_) => None } }
  }

  /** TimestampNTZ stats value → zone-free wall clock. Accepts
    * LocalDateTime (literal probes), naive ISO (this engine's and
    * delta-spark's spelling), the hive space form, and tolerates a
    * spurious zone suffix (taken as the wall-clock part). None =
    * unparseable (callers keep the file).
    */
  private def ntzLocal(a: Any): Option[java.time.LocalDateTime] = a match {
    case l: java.time.LocalDateTime => Some(l)
    case other =>
      val s0 = str(other).replace(' ', 'T')
      try Some(java.time.LocalDateTime.parse(s0))
      catch { case NonFatal(_) =>
        try Some(java.time.OffsetDateTime.parse(s0).toLocalDateTime)
        catch { case NonFatal(_) => None } }
  }

  /** None = incomparable (caller must treat as overlapping). Strings
    * compare by code point — UTF-16 `compareTo` disagrees with Spark's
    * UTF-8 binary ordering for astral characters.
    */
  def cmp(dt: DataType, a: Any, b: Any): Option[Int] =
    try dt match {
      case _: NumericType =>
        Some(new java.math.BigDecimal(str(a)).compareTo(new java.math.BigDecimal(str(b))))
      case StringType => Some(compareCodePoints(str(a), str(b)))
      case DateType => Some(str(a).compareTo(str(b))) // ISO yyyy-MM-dd
      case BooleanType =>
        Some(java.lang.Boolean.compare(str(a).toBoolean, str(b).toBoolean))
      case TimestampType =>
        for (x <- tsInstant(a); y <- tsInstant(b)) yield x.compareTo(y)
      case TimestampNTZType =>
        for (x <- ntzLocal(a); y <- ntzLocal(b)) yield x.compareTo(y)
      case _ => None
    } catch { case NonFatal(_) => None }

  /** What a file's stats (or a partition value) say about one column.
    * `lo`/`hi` of None = unknown bound. `hiExact` marks a bound that IS
    * the column's value (partition values): stats-derived maxima stay
    * false and get the coarse-precision pad in [[padHi]].
    */
  final case class ColInterval(
      lo: Option[Any], hi: Option[Any], nullsPossible: Boolean, allNull: Boolean,
      hiExact: Boolean = false)

  /** A timestamp stats MAX may have been truncated DOWN by a coarser-
    * precision writer (delta-spark serializes milliseconds and pads +1ms
    * back at skip time, its DataSkippingReader compensation): a file
    * whose true max is 10:00:00.000999 records "…00.000", and an exact
    * hi>v check would wrongly drop it for v = 10:00:00.000500. When the
    * parsed value carries fewer than 6 fractional digits, pad the max by
    * the sub-precision remainder (999µs for millis, 999999µs for bare
    * seconds) — still a valid upper bound, never below the true max.
    * This engine's own stats are full micros (6 digits) → pad 0, and the
    * MIN side needs no change (a floor is a valid lower bound).
    */
  private def fracDigits(s0: String): Int = {
    val dot = s0.indexOf('.')
    var digits = 0
    if (dot >= 0) {
      var k = dot + 1
      while (k < s0.length && Character.isDigit(s0.charAt(k))) { digits += 1; k += 1 }
    }
    digits
  }

  private def padMicrosFor(digits: Int): Long =
    if (digits >= 6) 0L
    else {
      var p = 1L; var d = digits
      while (d < 6) { p *= 10L; d += 1 }
      p - 1L
    }

  private def padHi(iv: ColInterval, dt: DataType): Option[Any] =
    iv.hi.map { h =>
      if (iv.hiExact) h
      else dt match {
        case TimestampType => h match {
          case i: java.time.Instant => i
          case other =>
            val s0 = str(other)
            tsInstant(s0)
              .map(_.plusNanos(padMicrosFor(fracDigits(s0)) * 1000L))
              .getOrElse(h)
        }
        case TimestampNTZType => h match {
          case l: java.time.LocalDateTime => l
          case other =>
            val s0 = str(other)
            ntzLocal(s0)
              .map(_.plusNanos(padMicrosFor(fracDigits(s0)) * 1000L))
              .getOrElse(h)
        }
        case _ => h
      }
    }

  private val Unknown = ColInterval(None, None, nullsPossible = true, allNull = false)

  /** The column's interval in `file`: exact from partitionValues for
    * partition columns, else from the add action's stats JSON.
    */
  def interval(s: DeltaLog.Snapshot, f: DeltaLog.AddFile, colName: String): ColInterval = {
    // column-mapped tables key partitionValues and stats by PHYSICAL name
    val key = s.physicalName(colName)
    if (s.partitionColumns.contains(colName))
      return f.partitionValues.get(key).orElse(f.partitionValues.get(colName)) match {
        case Some(null) => ColInterval(None, None, nullsPossible = true, allNull = true)
        case Some(v) => ColInterval(Some(v), Some(v), nullsPossible = false,
          allNull = false, hiExact = true)
        case None => Unknown
      }
    f.stats match {
      case None => Unknown
      case Some(js) =>
        try {
          val n = mapper.readTree(js)
          def field(group: String): Option[JsonNode] =
            Option(n.get(group)).flatMap(o => Option(o.get(key))).filterNot(_.isNull)
          val numRecords = Option(n.get("numRecords")).filterNot(_.isNull).map(_.asLong)
          val nullCount = field("nullCount").map(_.asLong)
          val allNull = (numRecords, nullCount) match {
            case (Some(nr), Some(nc)) => nc == nr
            case _ => false
          }
          ColInterval(field("minValues"), field("maxValues"),
            nullsPossible = nullCount.forall(_ > 0L), allNull = allNull)
        } catch { case NonFatal(_) => Unknown }
    }
  }

  /** Could the file hold a value of `dt` in [inMin, inMax] (or a null,
    * when `inHasNull`)? `inMin == null` means the probe side is all-null.
    */
  def mayContain(
      iv: ColInterval, dt: DataType, inMin: Any, inMax: Any, inHasNull: Boolean): Boolean = {
    val nullHit = inHasNull && iv.nullsPossible
    val rangeHit =
      if (inMin == null) false
      else if (iv.allNull) false
      else
        iv.lo.forall(lo => cmp(dt, lo, inMax).forall(_ <= 0)) &&
          padHi(iv, dt).forall(hi => cmp(dt, inMin, hi).forall(_ <= 0))
    nullHit || rangeHit
  }

  /** The add action's recorded row count, when its stats carry one. */
  def numRecords(f: DeltaLog.AddFile): Option[Long] = f.stats.flatMap { js =>
    try Option(mapper.readTree(js).get("numRecords")).filterNot(_.isNull).map(_.asLong)
    catch { case NonFatal(_) => None }
  }

  // --------------------------------------------- predicate-driven pruning

  /** Extract a literal's comparable form for [[cmp]] against stats values
    * (DateType literals are epoch days internally — stats store ISO;
    * TimestampType literals are epoch micros — compared as instants;
    * TimestampNTZ literals are WALL-CLOCK micros — compared as
    * LocalDateTime, r17). None = a form we don't prune on (intervals, …).
    */
  private def literalValue(l: Literal): Option[Any] = l.dataType match {
    case DateType =>
      Option(l.value).map(d => java.time.LocalDate.ofEpochDay(d.asInstanceOf[Int].toLong).toString)
    case TimestampType =>
      Option(l.value).map { v =>
        val us = v.asInstanceOf[Long]
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      }
    case TimestampNTZType =>
      Option(l.value).map { v =>
        val us = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      }
    case _: NumericType | StringType | BooleanType => Option(l.value).map(_.toString)
    case _ => None
  }

  /** Conservative "could any row of this file satisfy `e`": And narrows,
    * Or widens, recognized comparisons consult the column interval,
    * anything else answers true.
    */
  def mayMatch(s: DeltaLog.Snapshot, f: DeltaLog.AddFile, e: Expression): Boolean = {
    def colDt(name: String): Option[DataType] =
      s.schema.fields.find(_.name == name).map(_.dataType)
    def attrName(x: Expression): Option[String] = x match {
      case a: UnresolvedAttribute => Some(a.name)
      case _ => None
    }
    def bound(name: String, v: Literal)(
        test: (ColInterval, DataType, Any) => Boolean): Boolean =
      (colDt(name), literalValue(v)) match {
        case (Some(dt), Some(value)) => test(interval(s, f, name), dt, value)
        case _ => true
      }
    def possible(expr: Expression): Boolean = expr match {
      case And(l, r) => possible(l) && possible(r)
      case Or(l, r) => possible(l) || possible(r)
      case EqualTo(a, v: Literal) if attrName(a).isDefined =>
        bound(attrName(a).get, v)((iv, dt, value) =>
          mayContain(iv, dt, value, value, inHasNull = false))
      case EqualTo(v: Literal, a) if attrName(a).isDefined =>
        possible(EqualTo(a, v))
      case GreaterThan(a, v: Literal) if attrName(a).isDefined => // col > v: need hi > v
        bound(attrName(a).get, v)((iv, dt, value) =>
          !iv.allNull && padHi(iv, dt).forall(hi => cmp(dt, hi, value).forall(_ > 0)))
      case GreaterThan(v: Literal, a) if attrName(a).isDefined => // v > col ⇔ col < v
        possible(LessThan(a, v))
      case GreaterThanOrEqual(a, v: Literal) if attrName(a).isDefined =>
        bound(attrName(a).get, v)((iv, dt, value) =>
          !iv.allNull && padHi(iv, dt).forall(hi => cmp(dt, hi, value).forall(_ >= 0)))
      case GreaterThanOrEqual(v: Literal, a) if attrName(a).isDefined =>
        possible(LessThanOrEqual(a, v))
      case LessThan(a, v: Literal) if attrName(a).isDefined => // col < v: need lo < v
        bound(attrName(a).get, v)((iv, dt, value) =>
          !iv.allNull && iv.lo.forall(lo => cmp(dt, lo, value).forall(_ < 0)))
      case LessThan(v: Literal, a) if attrName(a).isDefined =>
        possible(GreaterThan(a, v))
      case LessThanOrEqual(a, v: Literal) if attrName(a).isDefined =>
        bound(attrName(a).get, v)((iv, dt, value) =>
          !iv.allNull && iv.lo.forall(lo => cmp(dt, lo, value).forall(_ <= 0)))
      case LessThanOrEqual(v: Literal, a) if attrName(a).isDefined =>
        possible(GreaterThanOrEqual(a, v))
      case IsNull(a) if attrName(a).isDefined =>
        interval(s, f, attrName(a).get).nullsPossible
      case IsNotNull(a) if attrName(a).isDefined =>
        !interval(s, f, attrName(a).get).allNull
      case In(a, vs) if attrName(a).isDefined && vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => possible(EqualTo(a, v.asInstanceOf[Literal])))
      case _ => true
    }
    possible(e)
  }

  /** Exact partition-value match for replace pruning: false only when the
    * stored hive value provably differs from the condition value.
    */
  def partitionValueMatches(stored: String, v: String): Boolean = {
    if (stored == v) return true
    def dec(x: String) =
      try Some(new java.math.BigDecimal(x)) catch { case NonFatal(_) => None }
    def date(x: String) =
      try Some(java.sql.Date.valueOf(x).toString) catch { case NonFatal(_) => None }
    (dec(stored), dec(v)) match {
      case (Some(a), Some(b)) => a.compareTo(b) == 0
      case (None, None) =>
        (date(stored), date(v)) match {
          case (Some(a), Some(b)) => a == b
          case (None, None) => false // two plain strings that differ
          case _ => true // mixed forms — can't prove, stay a candidate
        }
      case _ => true // mixed numeric/non-numeric — can't prove
    }
  }
}
