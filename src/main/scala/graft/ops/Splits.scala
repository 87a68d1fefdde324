package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable dataset splitting and sharding for
  * training pipelines.
  *
  * Everything here derives from ONE primitive: the first 15 hex digits of
  * `md5(key ++ ":" ++ seed)` compared lexicographically against precomputed
  * hex thresholds. That choice is deliberate:
  *   - **stable** — a row's split/shard never changes when the corpus grows,
  *     shrinks, or repartitions (it depends only on the key and seed), so
  *     incremental ingests extend a split instead of reshuffling it;
  *   - **leakage-safe by construction** — hash the GROUP key (domain, url,
  *     cluster id) rather than the row id and every member of the group
  *     lands in the same split, the standard guard against near-duplicate
  *     train/test contamination;
  *   - **engine-portable** — md5 hex and string comparison are identical in
  *     Spark, DuckDB, Trino, …, so the assignment is auditable outside the
  *     cluster (and oracle-checkable here). A 15-digit prefix stays under
  *     2^63 so thresholds are exact integers in any engine;
  *   - **scan-local** — assignment is a per-row codegen'd expression: no
  *     shuffle, no lookup table, no driver state, at any corpus size.
  */
object Splits {

  /** Cumulative weight → 15-hex-digit threshold string (floor(cum·16^15),
    * left-padded). Exposed so oracle SQL can embed the IDENTICAL literal.
    */
  private[graft] def hexThreshold(cum: Double): String = {
    val space = BigInt(16).pow(15)
    val v = (BigDecimal(cum) * BigDecimal(space)).toBigInt
      .min(space - 1).max(BigInt(0))
    val hex = v.toString(16)
    ("0" * (15 - hex.length)) + hex
  }

  /** The 15-hex-digit assignment hash of a key under a seed. */
  def assignmentHash(key: Column, seed: Long): Column =
    substring(md5(concat(key.cast("string"), lit(s":$seed"))), 1, 15)

  /** The full 32-hex-digit deterministic shuffle rank of a key: sorting by
    * it is a stable, seed-keyed global permutation (the "shuffle the corpus
    * once, identically, on every engine" primitive data loaders want).
    */
  def shuffleOrder(key: Column, seed: Long): Column =
    md5(concat(key.cast("string"), lit(s":$seed")))

  /** Assign each row to a named split by hashing `key`. Weights must sum to
    * 1; each split takes the hash interval of its cumulative weight, so
    * fractions are exact to 16^-15. Pass a group key (domain, dedup
    * component, …) for leakage-safe grouped splits; pass the row id for
    * plain i.i.d. splits.
    */
  def hashSplit(key: Column, splits: Seq[(String, Double)], seed: Long = 42L): Column = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 > 0.0), "split weights must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    if (splits.size == 1) return lit(splits.head._1)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val h = assignmentHash(key, seed)
    var c: Column = null
    for (i <- 0 until splits.size - 1) {
      val t = lit(hexThreshold(cums(i)))
      c = if (c == null) when(h < t, lit(splits(i)._1)) else c.when(h < t, lit(splits(i)._1))
    }
    c.otherwise(lit(splits.last._1))
  }

  /** Assign each row to one of `nShards` equal hash shards of `key`.
    * Expectation-balanced (each shard draws an equal hash interval), stable
    * under corpus growth, and a pure scan expression.
    */
  def shard(key: Column, nShards: Int, seed: Long = 42L): Column = {
    require(nShards >= 1, "nShards must be >= 1")
    if (nShards == 1) return lit(0)
    val h = assignmentHash(key, seed)
    var c: Column = null
    for (i <- 1 until nShards) {
      val t = lit(hexThreshold(i.toDouble / nShards))
      c = if (c == null) when(h < t, lit(i - 1)) else c.when(h < t, lit(i - 1))
    }
    c.otherwise(lit(nShards - 1))
  }

  /** Write `df` as `nShards` deterministic training shards under `path`
    * (hive layout `shard=N/`), each shard's rows in seed-keyed shuffle
    * order.
    *
    * Scale shape: shard assignment and shuffle rank are scan expressions;
    * the one exchange is a `repartitionByRange` over (shard, rank), which
    * (a) routes each output directory's rows to a contiguous task range
    * instead of funneling a shard through one task, and (b) lets AQE split
    * a skewed shard across tasks while `partitionBy` still routes rows to
    * the right directory. Files within a shard are range-ordered, and rows
    * within a file sorted, so reading a shard's files in name order streams
    * the permutation. `maxRecordsPerFile` caps file size for loader
    * parallelism.
    */
  def writeShards(
      df: DataFrame, key: Column, nShards: Int, path: String,
      seed: Long = 42L, maxRecordsPerFile: Long = 0L): Unit = {
    df.withColumn("shard", shard(key, nShards, seed))
      .withColumn("_shuffle_rank", shuffleOrder(key, seed))
      .repartitionByRange(nShards, col("shard"), col("_shuffle_rank"))
      .sortWithinPartitions(col("shard"), col("_shuffle_rank"))
      .drop("_shuffle_rank")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }
}
