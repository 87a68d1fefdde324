package graft.sources

import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

import IcebergTransforms._

/** Scan-time partition pruning THROUGH Iceberg transforms (what an
  * Iceberg planner's `Projections.inclusive` does): predicates on the
  * SOURCE column are mapped into constraints on the TRANSFORM value, then
  * evaluated at two levels —
  *
  *   1. **manifest level**, against the manifest-list's per-manifest
  *      field summaries (lower/upper bound + contains_null), so
  *      non-overlapping manifests are never even opened (plan cost
  *      proportional to SURVIVING manifests, not total manifest count);
  *   2. **entry level**, against each data file's exact partition tuple.
  *
  * The mapping is inclusive (conservative): `=`/`IN` project through any
  * transform; `<`,`<=`,`>`,`>=` only through order-preserving transforms
  * (`identity`, `year/month/day/hour`, `truncate`) as the floor-adjusted
  * bound; `IS [NOT] NULL` uses every transform's null→null contract
  * (except `void`, which prunes nothing). Anything underivable keeps the
  * file — pruning is a pure subtraction of CANNOT-match files, never a
  * row filter.
  */
private[graft] object IcebergPruning {

  /** One partition-spec field, resolution-ready: `sourceType` is the
    * CLEAN Spark type of the source column. */
  final case class SpecField(
      name: String,
      transform: Transform,
      sourceName: String,
      sourceType: DataType,
      fieldId: Int)

  sealed trait Check
  final case class InSet(vs: Set[Any]) extends Check
  final case class AtLeast(v: Any) extends Check
  final case class AtMost(v: Any) extends Check
  case object NullOnly extends Check
  case object NonNull extends Check

  /** Transform-space checks per spec-field NAME, derived from the
    * predicate's top-level conjuncts. Underivable conjuncts contribute
    * nothing (sound: less pruning).
    */
  def derive(
      conjuncts: Seq[Expression],
      fields: Seq[SpecField],
      timeZone: String): Map[String, Seq[Check]] = {
    val bySource: Map[String, Seq[SpecField]] =
      fields.groupBy(_.sourceName.toLowerCase)
    val out = Seq.newBuilder[(String, Check)]

    def attr(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head.toLowerCase)
      case _ => None
    }
    // literal → transform value in the pruning domain (None = no pruning)
    def tv(f: SpecField, l: Literal): Option[Any] =
      try {
        val casted = Cast(l, f.sourceType, Some(timeZone)).eval(null)
        applyScalar(f.transform, f.sourceType, casted)
      } catch { case scala.util.control.NonFatal(_) => None }
    def add(src: Option[String], mk: SpecField => Option[Check]): Unit =
      src.foreach(s => bySource.getOrElse(s, Nil).foreach { f =>
        mk(f).foreach(c => out += f.name -> c)
      })
    def rangeCheck(
        src: Option[String], l: Literal,
        atMost: Boolean): Unit =
      add(src, f =>
        if (!IcebergTransforms.monotone(f.transform)) None
        else tv(f, l).map(v => if (atMost) AtMost(v) else AtLeast(v)))

    conjuncts.foreach {
      case EqualTo(a, l: Literal) =>
        add(attr(a), f => tv(f, l).map(v => InSet(Set(v))))
      case EqualTo(l: Literal, a) =>
        add(attr(a), f => tv(f, l).map(v => InSet(Set(v))))
      case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        add(attr(a), f => {
          val vs = list.map(l => tv(f, l.asInstanceOf[Literal]))
          if (vs.forall(_.isDefined)) Some(InSet(vs.flatten.toSet)) else None
        })
      case LessThan(a, l: Literal) => rangeCheck(attr(a), l, atMost = true)
      case LessThanOrEqual(a, l: Literal) => rangeCheck(attr(a), l, atMost = true)
      case GreaterThan(a, l: Literal) => rangeCheck(attr(a), l, atMost = false)
      case GreaterThanOrEqual(a, l: Literal) => rangeCheck(attr(a), l, atMost = false)
      case LessThan(l: Literal, a) => rangeCheck(attr(a), l, atMost = false)
      case LessThanOrEqual(l: Literal, a) => rangeCheck(attr(a), l, atMost = false)
      case GreaterThan(l: Literal, a) => rangeCheck(attr(a), l, atMost = true)
      case GreaterThanOrEqual(l: Literal, a) => rangeCheck(attr(a), l, atMost = true)
      case IsNull(a) =>
        add(attr(a), _ => Some(NullOnly)) // null→null for every transform
      case IsNotNull(a) =>
        add(attr(a), f => f.transform match {
          case Void => None // void(c) is null even for non-null c
          case _ => Some(NonNull)
        })
      case _ => () // underivable conjunct: no pruning from it
    }
    out.result().groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  }

  private def test(ch: Check, v: Option[Any]): Boolean = ch match {
    case InSet(vs) => v.exists(vs.contains)
    case AtLeast(b) => v.exists(cmp(_, b) >= 0)
    case AtMost(b) => v.exists(cmp(_, b) <= 0)
    case NullOnly => v.isEmpty
    case NonNull => v.isDefined
  }

  /** Entry-level: may a file with this exact partition tuple match?
    * `pv` is (field name → raw avro value) of the entry's partition
    * record. Unmodeled value types keep the file.
    */
  def entryOk(
      checks: Map[String, Seq[Check]],
      pv: Seq[(String, Option[AnyRef])]): Boolean =
    checks.isEmpty || pv.forall { case (name, raw) =>
      checks.getOrElse(name, Nil).forall { ch =>
        val v = raw.flatMap(normalizeRaw)
        if (raw.isDefined && v.isEmpty) true // unmodeled type: keep
        else test(ch, v)
      }
    }

  /** Manifest-level: may ANY entry of a manifest with these field
    * summaries match? `partitions` is the manifest-list record's
    * `partitions` array (spec-field order); absent summaries keep the
    * manifest.
    */
  /** Per-FILE column-stats pruning over the manifest entry's
    * `lower_bounds`/`upper_bounds`/`null_value_counts` maps (field-id
    * keyed) — the Iceberg analog of Delta's stats skipping, applied to
    * DATA columns rather than partition tuples. `fields` are
    * pseudo-identity SpecFields over the table's top-level primitive
    * columns (named `#<fieldId>` to never collide with spec names).
    * Missing stats keep the file; an all-null column can never satisfy a
    * comparison or IN (the caller re-applies the full predicate, which
    * drops NULL rows), so those files drop.
    */
  def statsOk(
      checks: Map[String, Seq[Check]],
      fields: Seq[SpecField],
      lower: Map[Int, Array[Byte]],
      upper: Map[Int, Array[Byte]],
      nullCounts: Map[Int, Long],
      recordCount: Option[Long]): Boolean = {
    if (checks.isEmpty) return true
    fields.forall { f =>
      val cs = checks.getOrElse(f.name, Nil)
      if (cs.isEmpty) true
      else {
        val lo = lower.get(f.fieldId).flatMap(b =>
          boundValue(f.transform, f.sourceType, b))
        val hi = upper.get(f.fieldId).flatMap(b =>
          boundValue(f.transform, f.sourceType, b))
        val nc = nullCounts.get(f.fieldId)
        val allNull = (nc, recordCount) match {
          case (Some(n), Some(r)) => r > 0 && n >= r
          case _ => false
        }
        val mayHaveNull = nc.forall(_ > 0)
        cs.forall {
          case InSet(vs) =>
            !allNull && ((lo, hi) match {
              case (Some(l), Some(h)) =>
                vs.exists(v => cmp(v, l) >= 0 && cmp(v, h) <= 0)
              case _ => true
            })
          case AtLeast(v) => !allNull && hi.forall(h => cmp(h, v) >= 0)
          case AtMost(v) => !allNull && lo.forall(l => cmp(l, v) <= 0)
          case NullOnly => mayHaveNull
          case NonNull => !allNull
        }
      }
    }
  }

  def manifestOk(
      checks: Map[String, Seq[Check]],
      fields: Seq[SpecField],
      m: GenericRecord): Boolean = {
    if (checks.isEmpty) return true
    val sums: Seq[GenericRecord] = IcebergRead.fieldOpt(m, "partitions")
        .orNull match {
      case null => return true
      case a: java.util.Collection[_] =>
        a.toArray.toSeq.map(_.asInstanceOf[GenericRecord])
      case _ => return true
    }
    fields.indices.forall { i =>
      if (i >= sums.size) true
      else {
        val f = fields(i)
        val cs = checks.getOrElse(f.name, Nil)
        if (cs.isEmpty) true
        else {
          val s = sums(i)
          val containsNull = s.get("contains_null") match {
            case b: java.lang.Boolean => b.booleanValue()
            case _ => true // unknown: assume nulls possible
          }
          def bnd(k: String): (Boolean, Option[Any]) = s.get(k) match {
            case null => (false, None)
            case bb: java.nio.ByteBuffer =>
              val arr = new Array[Byte](bb.remaining())
              bb.duplicate().get(arr)
              (true, boundValue(f.transform, f.sourceType, arr))
            case b: Array[Byte] => (true, boundValue(f.transform, f.sourceType, b))
            case _ => (true, None)
          }
          val (hasLo, lo) = bnd("lower_bound")
          val (hasHi, hi) = bnd("upper_bound")
          cs.forall {
            case InSet(vs) => (lo, hi) match {
              case (Some(l), Some(h)) =>
                vs.exists(v => cmp(v, l) >= 0 && cmp(v, h) <= 0)
              case _ => true
            }
            case AtLeast(v) => hi.forall(h => cmp(h, v) >= 0)
            case AtMost(v) => lo.forall(l => cmp(l, v) <= 0)
            case NullOnly => containsNull
            // prune on contains_null with NO bounds = every value in the
            // manifest is null — the Iceberg Java ManifestEvaluator's
            // notNull() convention (a summary records bounds whenever any
            // non-null value exists). EXCEPT floating sources: bounds are
            // also omitted when only NaN values exist, so nulls + NaNs
            // would pass IS NOT NULL — there, additionally require
            // contains_nan KNOWN false (ManifestEvaluator does the same).
            case NonNull =>
              val floating =
                f.sourceType == FloatType || f.sourceType == DoubleType
              val nanKnownAbsent = IcebergRead.fieldOpt(s, "contains_nan")
                .exists {
                  case b: java.lang.Boolean => !b.booleanValue()
                  case _ => false
                }
              !(containsNull && !hasLo && !hasHi &&
                (!floating || nanKnownAbsent))
          }
        }
      }
    }
  }
}
