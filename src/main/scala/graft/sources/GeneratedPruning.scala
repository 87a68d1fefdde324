package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.DateType

/** Generated-column partition pruning (delta-spark's partition-filter
  * derivation, public behavior): when a PARTITION column is generated from
  * a data column by a MONOTONE expression — `CAST(src AS DATE)`,
  * `date_trunc(unit, src)`, `year(src)`, `substring(src, 1, n)` — a
  * predicate on the SOURCE column implies a predicate on the partition
  * column, and THAT prunes whole partitions before any file stats are
  * consulted.
  *
  * This is the 100 TB time-series shape: tables partition on
  * `p_date GENERATED ALWAYS AS (CAST(ts AS DATE))` and queries filter on
  * `ts` — without derivation the partition layout buys nothing for those
  * queries (stats still prune per-file, but every partition's file list
  * is evaluated); with it the pruning is exact at the partition level.
  *
  * PERIODIC shapes — `month(src)`, `day(src)`, `hour(src)` — are monotone
  * only within one parent period (year / month / day); they derive
  * two-sided bounds from a TWO-SIDED source range whose endpoints share
  * the parent period (delta-spark derives the same shapes).
  *
  * Soundness: derivation only looks at TOP-LEVEL conjuncts of the
  * predicate (an `Or` branch never contributes), only comparisons between
  * the source column and a literal, and derived bounds are widened to
  * non-strict (`src > a` ⇒ `g(src) >= g(a)` — monotone non-decreasing g
  * preserves order only weakly). The derived conjunct is appended with
  * `And`, so it can only REMOVE files the original predicate could never
  * match. `g(literal)` is evaluated once, driver-side, by Spark itself
  * (the same evaluator that wrote the partition values), so the
  * derivation can never disagree with the writer about g's semantics.
  */
object GeneratedPruning {

  /** One derivable generated partition column: partition col `name`
    * generated as `genSql` over source data column `source`. `guard` is
    * None for a MONOTONE shape; for a PERIODIC shape it is the format of
    * the parent-period expression (`year(%s)` for month, …) — g is
    * non-decreasing only WITHIN one parent period, so range derivation
    * additionally requires both endpoints to share the parent period.
    */
  private final case class Derivable(
      name: String, source: String, genSql: String, guard: Option[String])

  private def attrNames(e: Expression): Seq[String] = e.collect {
    case a: UnresolvedAttribute => a.name
  }

  /** Monotone-shape whitelist over the PARSED generation expression. Every
    * function argument standing in for the source must be the BARE
    * attribute — `year(f(src))` with non-monotone f is a single-source,
    * monotone-outer shape whose derived bound would be unsound.
    */
  private def monotone(e: Expression): Boolean = e match {
    case Cast(_: UnresolvedAttribute, DateType, _, _) => true
    case f: UnresolvedFunction =>
      val name = f.nameParts.last.toLowerCase
      name match {
        case "date_trunc" => f.arguments match {
          case Seq(Literal(_, _), _: UnresolvedAttribute) => true
          case _ => false
        }
        case "year" => f.arguments match {
          case Seq(_: UnresolvedAttribute) => true
          case _ => false
        }
        case "substring" | "substr" => f.arguments match {
          case Seq(_: UnresolvedAttribute, Literal(pos, _), Literal(_, _)) =>
            pos == 1 // only a PREFIX is lexicographically monotone
          case _ => false
        }
        case _ => false
      }
    case _ => false
  }

  /** Periodic-shape whitelist: `month`/`day`/`hour` of the bare source are
    * non-decreasing within one parent period (year / month / day), so a
    * TWO-SIDED source range whose endpoints share the parent period
    * derives two-sided partition bounds (delta-spark derives the same
    * shapes). Returns the parent-period guard format.
    */
  private def periodicGuard(e: Expression): Option[String] = e match {
    case f: UnresolvedFunction =>
      f.arguments match {
        case Seq(_: UnresolvedAttribute) =>
          f.nameParts.last.toLowerCase match {
            case "month" => Some("year(%s)")
            case "day" | "dayofmonth" => Some("date_trunc('MONTH', %s)")
            case "hour" => Some("cast(%s as date)")
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  private def derivables(spark: SparkSession, s: DeltaLog.Snapshot): Seq[Derivable] =
    s.partitionColumns.flatMap { p =>
      s.schema.fields.find(_.name == p)
        .filter(_.metadata.contains("delta.generationExpression"))
        .flatMap { f =>
          val genSql = f.metadata.getString("delta.generationExpression")
          try {
            val parsed = spark.sessionState.sqlParser.parseExpression(genSql)
            val srcs = attrNames(parsed).distinct
            val shape: Option[Option[String]] =
              if (monotone(parsed)) Some(None)
              else periodicGuard(parsed).map(Some(_))
            if (srcs.sizeIs == 1 && shape.isDefined &&
                !s.partitionColumns.contains(srcs.head))
              Some(Derivable(p, srcs.head, genSql, shape.get))
            else None
          } catch { case scala.util.control.NonFatal(_) => None }
        }
    }

  /** Evaluate `g(lit)` by Spark itself; None when it fails or yields null. */
  private def applyGen(spark: SparkSession, d: Derivable, lit: Literal): Option[Literal] =
    try {
      val df = spark.sql(
        s"SELECT (${d.genSql}) FROM (SELECT ${lit.sql} AS ${quoted(d.source)})")
      val row = df.head()
      if (row.isNullAt(0)) None
      else Some(Literal.create(row.get(0), df.schema.head.dataType))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"

  /** Append derived partition conjuncts to `expr`. Identity when the table
    * has no derivable generated partition columns or the predicate has no
    * usable source-column comparisons.
    */
  def augment(spark: SparkSession, s: DeltaLog.Snapshot, expr: Expression): Expression = {
    val ds = derivables(spark, s)
    if (ds.isEmpty) return expr
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def isSrc(e: Expression, d: Derivable): Boolean = e match {
      case a: UnresolvedAttribute => a.name.equalsIgnoreCase(d.source)
      case _ => false
    }
    val cs = conjuncts(expr)
    val derived = ds.flatMap { d =>
      val p = UnresolvedAttribute.quoted(d.name)
      def ge(l: Literal) = applyGen(spark, d, l).map(GreaterThanOrEqual(p, _))
      def le(l: Literal) = applyGen(spark, d, l).map(LessThanOrEqual(p, _))
      def eq(l: Literal) = applyGen(spark, d, l).map(EqualTo(p, _))
      // equality/In derivation is sound for ANY deterministic g (the
      // protocol requires generation expressions to be deterministic):
      // src = l ⇒ g(src) = g(l), no monotonicity needed
      val eqDerived = cs.flatMap {
        case EqualTo(a, l: Literal) if isSrc(a, d) => eq(l)
        case EqualTo(l: Literal, a) if isSrc(a, d) => eq(l)
        case In(a, vs) if isSrc(a, d) && vs.forall(_.isInstanceOf[Literal]) =>
          val mapped = vs.map(v => applyGen(spark, d, v.asInstanceOf[Literal]))
          if (mapped.forall(_.isDefined)) Some(In(p, mapped.map(_.get).distinct))
          else None
        case _ => None
      }
      // range bounds: every conjunct bounding the source from below/above
      // (strict bounds widen to non-strict before g is applied)
      val los = cs.collect {
        case GreaterThan(a, l: Literal) if isSrc(a, d) => l
        case GreaterThanOrEqual(a, l: Literal) if isSrc(a, d) => l
        case LessThan(l: Literal, a) if isSrc(a, d) => l
        case LessThanOrEqual(l: Literal, a) if isSrc(a, d) => l
      }
      val his = cs.collect {
        case LessThan(a, l: Literal) if isSrc(a, d) => l
        case LessThanOrEqual(a, l: Literal) if isSrc(a, d) => l
        case GreaterThan(l: Literal, a) if isSrc(a, d) => l
        case GreaterThanOrEqual(l: Literal, a) if isSrc(a, d) => l
      }
      val rangeDerived = d.guard match {
        case None =>
          // monotone: each bound derives independently
          los.flatMap(ge) ++ his.flatMap(le)
        case Some(guardFmt) =>
          // periodic: only a (lo, hi) PAIR sharing the parent period
          // derives — g is non-decreasing within that period only. All
          // conjuncts hold simultaneously, so every valid pair is sound.
          for {
            lo <- los
            hi <- his
            if samePeriod(spark, guardFmt, lo, hi)
            bound <- ge(lo).toSeq ++ le(hi).toSeq
          } yield bound
      }
      eqDerived ++ rangeDerived
    }
    derived.foldLeft(expr)(And(_, _))
  }

  /** True iff `guardFmt(lo)` and `guardFmt(hi)` evaluate equal and
    * non-null — evaluated by Spark itself, driver-side, once per pair.
    */
  private def samePeriod(
      spark: SparkSession, guardFmt: String, lo: Literal, hi: Literal): Boolean =
    try {
      val row = spark.sql(
        s"SELECT (${guardFmt.format(lo.sql)}) <=> (${guardFmt.format(hi.sql)})" +
          s" AND (${guardFmt.format(lo.sql)}) IS NOT NULL").head()
      !row.isNullAt(0) && row.getBoolean(0)
    } catch { case scala.util.control.NonFatal(_) => false }
}
