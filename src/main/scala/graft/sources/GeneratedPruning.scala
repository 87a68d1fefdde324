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
    * generated as `genSql` over source data column `source`.
    */
  private final case class Derivable(name: String, source: String, genSql: String)

  private def attrNames(e: Expression): Seq[String] = e.collect {
    case a: UnresolvedAttribute => a.name
  }

  /** Monotone-shape whitelist over the PARSED generation expression. */
  private def monotone(e: Expression): Boolean = e match {
    case Cast(_: UnresolvedAttribute, DateType, _, _) => true
    case f: UnresolvedFunction =>
      val name = f.nameParts.last.toLowerCase
      name match {
        case "date_trunc" => f.arguments.sizeIs == 2
        case "year" => f.arguments.sizeIs == 1
        case "substring" | "substr" => f.arguments match {
          case Seq(_: UnresolvedAttribute, Literal(pos, _), Literal(_, _)) =>
            pos == 1 // only a PREFIX is lexicographically monotone
          case _ => false
        }
        case _ => false
      }
    case _ => false
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
            if (srcs.sizeIs == 1 && monotone(parsed) &&
                !s.partitionColumns.contains(srcs.head))
              Some(Derivable(p, srcs.head, genSql))
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
    val derived = for {
      d <- ds
      c <- conjuncts(expr)
      out <- {
        val p = UnresolvedAttribute.quoted(d.name)
        def ge(l: Literal) = applyGen(spark, d, l).map(GreaterThanOrEqual(p, _))
        def le(l: Literal) = applyGen(spark, d, l).map(LessThanOrEqual(p, _))
        def eq(l: Literal) = applyGen(spark, d, l).map(EqualTo(p, _))
        c match {
          case EqualTo(a, l: Literal) if isSrc(a, d) => eq(l)
          case EqualTo(l: Literal, a) if isSrc(a, d) => eq(l)
          case GreaterThan(a, l: Literal) if isSrc(a, d) => ge(l)
          case GreaterThanOrEqual(a, l: Literal) if isSrc(a, d) => ge(l)
          case LessThan(a, l: Literal) if isSrc(a, d) => le(l)
          case LessThanOrEqual(a, l: Literal) if isSrc(a, d) => le(l)
          case GreaterThan(l: Literal, a) if isSrc(a, d) => le(l) // l > src
          case GreaterThanOrEqual(l: Literal, a) if isSrc(a, d) => le(l)
          case LessThan(l: Literal, a) if isSrc(a, d) => ge(l)
          case LessThanOrEqual(l: Literal, a) if isSrc(a, d) => ge(l)
          case In(a, vs) if isSrc(a, d) && vs.forall(_.isInstanceOf[Literal]) =>
            val mapped = vs.map(v => applyGen(spark, d, v.asInstanceOf[Literal]))
            if (mapped.forall(_.isDefined)) Some(In(p, mapped.map(_.get).distinct))
            else None
          case _ => None
        }
      }
    } yield out
    derived.foldLeft(expr)(And(_, _))
  }
}
