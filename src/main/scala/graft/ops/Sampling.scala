package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for reproducible corpus cuts.
  *
  * Training-data pipelines need samples that are (a) reproducible across
  * runs, engines, and partition layouts — `df.sample`'s per-partition RNG is
  * none of those — (b) keyed on CONTENT, so the same document always lands
  * on the same side of the cut no matter where or when it is ingested, and
  * (c) nested: the 1% sample is a subset of the 10% sample, so scaling
  * ablations share documents. Comparing the md5 hex of the content against
  * a fraction-derived cutoff gives all three, in any engine with md5, as a
  * pure scan predicate (no shuffle, no state).
  */
object Sampling {

  /** Rows whose `md5(keyCol)` falls below the cutoff for `fraction` —
    * a deterministic, content-keyed `fraction` sample.
    */
  def byContentHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    if (fraction == 1.0) df
    else df.filter(md5(col(keyCol)) < lit(hexCutoff(fraction)))
  }

  /** Per-stratum deterministic sampling — the domain-mixing primitive: each
    * stratum (source, language, quality bucket, ...) keeps its own fraction
    * of rows, so a training mix like "50% src0, 25% src1, 10% of the rest"
    * is one scan predicate. Same guarantees as [[byContentHash]]
    * (reproducible, content-keyed, nested across fractions) per stratum;
    * strata absent from `fractions` use `defaultFraction`.
    *
    * The per-stratum cutoff is a literal CASE chain (the mix spec is
    * config-sized), so the filter stays a pushable scan predicate — no
    * join, no shuffle, no broadcast at any corpus size.
    */
  def stratifiedByContentHash(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, "fractions must be in [0, 1]"))
    val cutoff = fractions.toSeq.sortBy(_._1) match {
      case Seq() => lit(hexCutoff(defaultFraction))
      case (s0, f0) +: rest =>
        rest.foldLeft(when(col(stratumCol) === s0, lit(hexCutoff(f0)))) {
          case (acc, (s, f)) => acc.when(col(stratumCol) === s, lit(hexCutoff(f)))
        }.otherwise(lit(hexCutoff(defaultFraction)))
    }
    df.filter(md5(col(keyCol)) < cutoff)
  }

  /** Exactly-k-per-group deterministic sample: rank rows within each group
    * by `(md5(keyCol), idCol)` and keep the first k — a uniform
    * without-replacement sample that is reproducible across engines and
    * partition layouts (the hash is the "random" order; the id breaks
    * digest ties, so identical content is still totally ordered). The
    * inspection/eval primitive: "k docs per domain/language", exact count
    * per group where the fraction forms can't promise one.
    *
    * One shuffle on the group key; the window sort is per-group. A group
    * with billions of rows pays its size in sort — pre-thin giant groups
    * with [[byContentHash]] first (nesting makes the composition still
    * deterministic and still uniform).
    */
  def perGroupSample(
      df: DataFrame, groupCols: Seq[String], keyCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // asc_nulls_last: Spark's default NULLS FIRST would rank null-content
    // rows into every sample while DuckDB's default (nulls last) ranks
    // them out — the cross-engine reproducibility contract must pin one
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(keyCol)).asc_nulls_last, col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Temperature-scaled domain mixing — the multilingual sampling rule of
    * XLM-R / mT5 (Conneau et al. 2020; Xue et al. 2021, public method):
    * allocate a document `budget` across domains by the temperature-
    * flattened size distribution p_d ∝ n_d^alpha, then draw each domain's
    * quota as an exactly-k deterministic hash sample ([[perGroupSample]]
    * order: `(md5(key), id)`, nulls last).
    *
    * alpha = 1 keeps natural proportions, alpha = 0 equalizes domains;
    * in between, low-resource domains are upsampled relative to their
    * share. Quotas cap at the domain's size and capped leftovers are NOT
    * redistributed, so every quota is a pure function of
    * (counts, alpha, budget) — reproducible and engine-checkable.
    * Null-domain rows get quota 0 (dropped).
    *
    * Scale: fully distributed — NOTHING proportional to domain cardinality
    * ever reaches the driver (ScaleSpec pins this on a 100k-domain frame).
    * The only driver value is the scalar Σ n_d^alpha, computed as an exact
    * DECIMAL aggregate so it is order-invariant (a double sum would make
    * quotas depend on reduction order; [[temperatureQuotas]] must replay
    * bit-identically for q99's oracle). Selection is hash-threshold, not a
    * per-domain sort: rows are bucketed by their 2-hex-digit md5 prefix, a
    * per-domain cumulative-count window over the ≤257 bucket stats marks
    * each domain's boundary bucket, buckets wholly past the quota are
    * dropped before any sort, and ranks within a surviving bucket are
    * offset by the bucket's exclusive cumulative count — `sample_rank` is
    * the exact global (md5, id) rank, but no task ever sorts more than
    * ~1/256th of one domain. The bucket-stats frame joins back on
    * (domain, bucket) — the window that follows partitions on the same
    * keys, so the shuffle is shared; AQE broadcasts the stats side when it
    * is small (every realistic mix spec) and shuffle-joins otherwise.
    *
    * Returns the sampled rows plus `sample_rank` and `mix_quota`.
    */
  def temperatureMix(
      df: DataFrame, idCol: String, keyCol: String, domainCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    require(budget >= 1L, "budget must be >= 1")
    val h = md5(col(keyCol))
    // null-key rows bucket to "zz" (> every hex prefix): same position the
    // old global asc_nulls_last rank order gave them
    val bucket = coalesce(substring(h, 1, 2), lit("zz"))
    // bcounts is consumed three times (the exact-decimal scalar inside
    // quotaFrame, the quota join, the stats window) — persist it so the
    // input scans ONCE for stats. It is bounded at ≤257 buckets × #domains,
    // and quotaFrame's eager head() fills the cache before any reuse;
    // lifecycle follows the documented service convention (callers /
    // Bench clear the cache between corpora).
    val bcounts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("_mix_d"), bucket.as("_mix_b"))
      .agg(count(lit(1)).as("_mix_n"))
      .persist()
    val quotas = quotaFrame(
      bcounts.groupBy(col("_mix_d")).agg(sum(col("_mix_n")).as("_mix_dn")),
      col("_mix_d"), col("_mix_dn"), alpha, budget)
    import org.apache.spark.sql.expressions.Window
    // exclusive per-domain cumulative count in bucket order → each bucket's
    // global rank offset; buckets contributing nothing to the quota are
    // dropped HERE, so wholly-unselected buckets never reach the data join
    // or the window at all
    val cumW = Window.partitionBy(col("_mix_d")).orderBy(col("_mix_b"))
    val stats = bcounts
      .withColumn("_mix_cum", sum(col("_mix_n")).over(cumW) - col("_mix_n"))
      .join(quotas.select(col("_mix_d"), col("_mix_q")), "_mix_d")
      .filter(col("_mix_q") - col("_mix_cum") > 0L)
    // materialize the hash BEFORE the window exchange: the window sorts by
    // it, and a raw md5(keyCol) sort key would force the (large) key
    // column itself through the shuffle just to recompute the hash on the
    // other side — as a column, pruning ships the 32-char hash instead
    val w = Window.partitionBy(col("_mix_d"), col("_mix_b"))
      .orderBy(col("_mix_h").asc_nulls_last, col(idCol))
    df.withColumn("_mix_h", h)
      .join(stats,
        col(domainCol) === col("_mix_d") &&
          coalesce(substring(col("_mix_h"), 1, 2), lit("zz")) === col("_mix_b"))
      .withColumn("sample_rank",
        (col("_mix_cum") + row_number().over(w)).cast("long"))
      .withColumn("mix_quota", col("_mix_q"))
      .filter(col("sample_rank") <= col("mix_quota"))
      .drop("_mix_d", "_mix_b", "_mix_n", "_mix_cum", "_mix_q", "_mix_h")
  }

  /** The quota table behind [[temperatureMix]] as a DataFrame
    * `(domain, n, quota)` — the scale-safe form (never materialized on the
    * driver). `quota = min(n_d, floor(budget · n_d^alpha / Σ n^alpha))`
    * per non-null domain.
    */
  def temperatureQuotaFrame(
      df: DataFrame, domainCol: String, alpha: Double, budget: Long): DataFrame = {
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("_mix_d")).agg(count(lit(1)).as("_mix_dn"))
    quotaFrame(counts, col("_mix_d"), col("_mix_dn"), alpha, budget)
      .select(col("_mix_d").as("domain"), col("_mix_dn").as("n"),
        col("_mix_q").as("quota"))
  }

  /** [[temperatureQuotaFrame]] collected to a Map — an inspection / oracle
    * convenience for config-sized domain sets (q99 captures it to replay
    * quotas in SQL). The Map return type IS a driver materialization; use
    * the frame form inside pipelines.
    */
  def temperatureQuotas(
      df: DataFrame, domainCol: String, alpha: Double, budget: Long): Map[String, Long] = {
    temperatureQuotaFrame(df, domainCol, alpha, budget)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  /** Distributed quota derivation from a per-domain count frame. The weight
    * sum Σ n_d^alpha is the single driver scalar, aggregated as
    * DECIMAL(38,12) so it is EXACT and therefore reduction-order-invariant:
    * [[temperatureMix]] and [[temperatureQuotas]] each recompute it on
    * separate scans, and q99's oracle replays quotas captured via the
    * latter against a mix drawn via the former — a double sum could differ
    * in the last ulp between the two runs and flip a floor() at a quota
    * boundary. Per-domain floor/min stay columnar (same double arithmetic
    * as `(budget * pow / wsum).toLong` — non-negative, so floor ≡ truncate).
    */
  private def quotaFrame(
      counts: DataFrame, d: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column, alpha: Double, budget: Long): DataFrame = {
    val withW = counts.select(d.as("_mix_d"), n.as("_mix_dn"),
      pow(n.cast("double"), lit(alpha)).as("_mix_w"))
    val wsumRow = withW
      .agg(sum(col("_mix_w").cast("decimal(38,12)")).as("_ws"),
        count(lit(1)).as("_n")).head()
    // null sum with rows present = decimal overflow (unreachable with the
    // enforced alpha <= 1, where sum(n^alpha) <= total rows, but a silent
    // 0.0 here would divide to +Inf and quietly hand every domain its
    // full count — fail loudly instead)
    require(!wsumRow.isNullAt(0) || wsumRow.getLong(1) == 0L,
      "temperature-mix weight sum overflowed decimal(38,12)")
    val wsum: Double =
      if (wsumRow.isNullAt(0)) 0.0 else wsumRow.getDecimal(0).doubleValue()
    withW.withColumn("_mix_q",
      least(col("_mix_dn"),
        floor(lit(budget.toDouble) * col("_mix_w") / lit(wsum))))
  }

  /** 32-hex-digit cutoff = floor(fraction · 16^32), zero-padded — md5 hex
    * strings of equal length compare lexicographically as numbers. Fraction
    * 1.0 yields `"g"`, which every lowercase hex string sorts below (the
    * 33-digit `0x1000…0` would otherwise win the length-sensitive string
    * compare against only 1/16th of the digests).
    */
  private[ops] def hexCutoff(fraction: Double): String = {
    if (fraction >= 1.0) return "g"
    val max = BigInt(1) << 128
    val cut = (BigDecimal(max) * BigDecimal(fraction)).toBigInt
    val hex = cut.toString(16)
    ("0" * (32 - hex.length)) + hex
  }
}
