package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** How an operator decides which join/group keys are "hot" (skewed).
  *
  * One audited mechanism shared by [[Skew.saltedJoin]] (route hot keys to
  * the salted path), and available to any operator that needs a bounded
  * driver-side hot-key set. The estimate is routing-only in every current
  * caller: misclassifying a key changes the physical plan, never the
  * result.
  */
sealed trait HotKeySpec
object HotKeySpec {

  /** Treat every key as hot (legacy all-keys salting — pays the full
    * replication cost; only right when the key space is tiny AND uniformly
    * huge per key). */
  case object All extends HotKeySpec

  /** Detect hot keys from a seeded sample of the fact side: a key is hot
    * when its sampled share exceeds `minShare` (default 1% — roughly "this
    * key alone would dominate one of O(100) shuffle partitions") with at
    * least `minSampleRows` sampled occurrences to filter sampling noise.
    * The returned set is capped at `maxKeys` (largest first) so the
    * driver-side footprint is bounded by construction.
    */
  final case class Sampled(
      minShare: Double = 0.01,
      fraction: Double = 0.05,
      maxKeys: Int = 256,
      minSampleRows: Long = 8L,
      seed: Long = 42L) extends HotKeySpec {
    require(minShare > 0 && minShare <= 1, "minShare must be in (0, 1]")
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    require(maxKeys >= 1, "maxKeys must be >= 1")
  }

  /** Caller-supplied hot keys (known skew — a null-ish sentinel id, a
    * default tenant, a bot user). */
  final case class Explicit(keys: Seq[Any]) extends HotKeySpec
}

/** Shared hot-key detection. Two shapes:
  *
  *   - [[overCount]]: EXACT distributed count → small hot-key DataFrame,
  *     meant for broadcast anti-/semi-joins (the stop-shingle / mega-bucket
  *     cut shape used across [[Dedup]]). Never collected.
  *   - [[resolve]]: SAMPLED estimate → bounded driver-side key array, for
  *     operators that must branch the plan per key ([[Skew.saltedJoin]]).
  */
object HotKeys {

  /** Keys of `df` whose exact row count exceeds `minCount`, as a DataFrame
    * of the key columns only. Hot keys are few by definition, so the result
    * is broadcastable; the aggregate is map-side combined on the key. */
  def overCount(df: DataFrame, keyCols: Seq[Column], minCount: Long): DataFrame =
    df.groupBy(keyCols: _*).agg(count(lit(1)).as("_hk_cnt"))
      .filter(col("_hk_cnt") > minCount)
      .drop("_hk_cnt")

  /** Resolve a [[HotKeySpec]] against the fact side to a concrete
    * driver-side key list. `None` means "every key is hot" (the
    * [[HotKeySpec.All]] contract); `Some(keys)` is bounded by the spec's
    * `maxKeys`. A non-key-specific estimate: one sampled aggregate job.
    */
  def resolve(fact: DataFrame, key: String, spec: HotKeySpec): Option[Seq[Any]] =
    spec match {
      case HotKeySpec.All => None
      case HotKeySpec.Explicit(keys) => Some(keys)
      case s: HotKeySpec.Sampled =>
        val sampled = fact.select(col(key)).na.drop(Seq(key))
          .sample(withReplacement = false, s.fraction, s.seed)
        // persisted: the per-key aggregate is tiny (distinct keys of a
        // sample), but WITHOUT pinning it the top-k and grand-total jobs
        // would each re-scan the fact column — two full passes at lake scale
        val agg = sampled.groupBy(col(key)).agg(count(lit(1)).as("cnt")).persist()
        try {
          val rows = agg.orderBy(col("cnt").desc).limit(s.maxKeys + 1).collect()
          val total = math.max(1L,
            agg.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0))
          val hot = rows.iterator
            .filter { r =>
              val c = r.getLong(1)
              c >= s.minSampleRows && c.toDouble / total >= s.minShare
            }
            .map(_.get(0)).take(s.maxKeys).toSeq
          Some(hot)
        } finally { agg.unpersist(); () }
    }
}
