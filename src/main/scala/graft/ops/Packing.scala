package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign each document to
  * the fixed-size token chunk its first token lands in when the corpus is
  * concatenated in a deterministic order — the concat-then-chunk packing
  * used for LLM pre-training batches.
  *
  * One window (running token sum per partition), no state, no driver data:
  * `bin = floor(offset / budget)` where offset is the cumulative token
  * count of all earlier documents in the partition. Deterministic given the
  * ordering column, and exact in integer arithmetic, so any engine
  * reproduces the same assignment. Partitioning (e.g. by language/source)
  * bounds the sort scope — packing is inherently order-defined, so the sort
  * inside each partition is the work, not overhead.
  */
object Packing {

  /** Adds `tok` (the token count), `offset` (tokens before this doc) and
    * `bin` (chunk index) columns.
    *
    * @param partitionCols independent packing streams (e.g. lang); empty ⇒
    *                      one global stream (single-partition window — fine
    *                      for bounded corpora, shard first at scale)
    * @param orderCol      deterministic concatenation order within a stream
    * @param tokens        token-count expression (e.g. Text.tokenCount)
    * @param budget        tokens per chunk
    */
  def concatChunkBins(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCol: String,
      tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    val w = w0.orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tok", tokens.cast("long"))
      .withColumn("offset", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("offset") / budget))
  }
}
