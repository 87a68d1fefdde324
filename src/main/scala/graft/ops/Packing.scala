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

  /** Greedy token-budget selection — "take the best documents until the
    * budget fills": within each partition stream, documents are admitted in
    * priority order (ties broken by `orderCol` for determinism) while the
    * cumulative token count of already-admitted documents is below
    * `budget`. One window per stream, no driver state; the admitted set is
    * deterministic and engine-reproducible when `priority` is (e.g. the
    * 4-dp quality score). The standard data-selection shape for assembling
    * a fixed-size training mix from a quality-ranked corpus.
    *
    * Adds (and overwrites, like [[concatChunkBins]]) a `tok` column with
    * the evaluated token count. Empty `partitionCols` means one GLOBAL
    * stream — a single-partition window sort; fine for bounded corpora,
    * partition by language/source at scale.
    */
  def selectByTokenBudget(
      df: DataFrame,
      partitionCols: Seq[String],
      priority: Column,
      orderCol: String,
      tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    val w = w0.orderBy(priority.desc, col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tok", tokens.cast("long"))
      .withColumn("_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .filter(col("_before") < budget)
      .drop("_before")
  }

  /** Overlapping token windows per document — the RAG / context-window
    * chunker: each doc splits into windows of `window` tokens starting
    * every `stride` tokens, the last start position being the SMALLEST
    * multiple of `stride` ≥ n − window (every token lands in at least one
    * chunk; the final chunk may run short when stride doesn't divide
    * n − window; docs shorter than `window` yield themselves as one chunk;
    * empty docs yield nothing). Pure per-row generate — tokenize once,
    * explode the start indices, slice — no shuffle at any corpus size.
    *
    * Output: (idCol, chunk_idx, chunk, n_tokens).
    */
  def tokenWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    require(stride <= window,
      "stride beyond window leaves inter-window gaps (and a phantom final chunk)")
    // empty docs fall out via explode_outer + null filter rather than a
    // size() pre-filter: the pushed-down pre-filter (and a plain explode's
    // inferred one) re-runs the tokenization split inside a scan Filter
    // (see Dedup.minePairs); the null filter sits above the Generate where
    // _ws is a computed-once attribute.
    // ceil, not floor: a floor'd last start strands up to stride−1
    // trailing tokens outside every window
    df.select(col(idCol), graft.functions.Text.words(col(textCol)).as("_ws"))
      .select(col(idCol), col("_ws"),
        explode_outer(when(size(col("_ws")) > 0, sequence(lit(0),
          ceil(greatest(size(col("_ws")) - window, lit(0)).cast("double") / stride)
            .cast("int")))).as("chunk_idx"))
      .filter(col("chunk_idx").isNotNull)
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_ws"), col("chunk_idx") * stride + 1, lit(window)), " ").as("chunk"),
        size(slice(col("_ws"), col("chunk_idx") * stride + 1, lit(window))).as("n_tokens"))
  }
}
