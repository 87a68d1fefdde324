package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Rounds 2+ query surface, combined from the per-family gate files
  * (each holds its queries AND the matching DuckDB oracle SQL side by
  * side). Exactness rules for oracle parity live in
  * [[QueryHelpers]]'s scaladoc.
  */
object EngineQueries {

  // def, not val: several oracle builders embed state captured while their
  // query RUNS (trained centroids/codebooks/quotas in QueryHelpers), so the
  // oracle map must be re-evaluated when the driver dumps it, never frozen
  // at object init
  private def families = Seq(
    (SqlSurfaceQueries.queries, SqlSurfaceQueries.oracleSql),
    (PipelineQueries.queries, PipelineQueries.oracleSql),
    (TextQueries.queries, TextQueries.oracleSql),
    (DedupQueries.queries, DedupQueries.oracleSql),
    (AnnQueries.queries, AnnQueries.oracleSql),
    (LangModelQueries.queries, LangModelQueries.oracleSql),
    (SamplingQueries.queries, SamplingQueries.oracleSql),
    (DeltaQueries.queries, DeltaQueries.oracleSql),
    (StreamingQueries.queries, StreamingQueries.oracleSql)
  )

  def queries: ListMap[String, (SparkSession, String) => DataFrame] =
    families.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    families.map(_._2).reduce(_ ++ _)
}
