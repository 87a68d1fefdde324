package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParseException
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, ParsedStatement}

/** Load-time SQL validation + statement-type guard.
  *
  * Mirrors the reference's two layers: parse every stage query up front with
  * position-carrying errors (aqueducts/core/src/templating.rs:286-330) and
  * refuse DDL/DML/statements inside stages — stage SQL is SELECT-only
  * (SQLOptions with ddl/dml/statements disallowed, core/src/stages/mod.rs:53-56).
  */
object SqlGuard {

  final case class SqlValidationError(stage: String, message: String)
    extends RuntimeException(s"Invalid SQL in stage '$stage': $message")

  /** Parse the query and reject anything that is not a pure relational query. */
  def validate(spark: SparkSession, stageName: String, query: String): LogicalPlan = {
    val plan =
      try spark.sessionState.sqlParser.parsePlan(query)
      catch {
        case e: ParseException => throw SqlValidationError(stageName, e.getMessage)
      }
    if (isForbidden(plan))
      throw SqlValidationError(stageName,
        s"DDL/DML statements are not allowed in stages (got ${plan.getClass.getSimpleName})")
    plan
  }

  private def isForbidden(plan: LogicalPlan): Boolean = plan match {
    case _: Command => true          // DDL/utility commands (CREATE/DROP/SET/...)
    case _: ParsedStatement => true  // unresolved DDL statements
    case other =>
      // DML nodes that don't share a marker trait across Spark versions
      val n = other.getClass.getSimpleName
      n == "InsertIntoStatement" || n == "DeleteFromTable" || n == "UpdateTable" || n == "MergeIntoTable"
  }
}
