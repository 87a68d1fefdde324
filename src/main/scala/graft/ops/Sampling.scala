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
    * Scale: selection is hash-threshold, not a per-domain sort. One bounded
    * aggregate counts rows per (domain, 2-hex-digit md5 prefix) — #domains
    * × ≤257 rows to the driver (the aggregate-to-driver scalar contract).
    * The driver locates each domain's selection boundary bucket by
    * cumulative count; buckets strictly before it are selected outright and
    * only the boundary bucket is ranked, so no task ever sorts more than
    * ~1/256th of one domain. A 60%-of-corpus hot domain costs 256 parallel
    * bucket sorts, not one single-reducer domain sort (the round-5 scale
    * flag). The per-bucket stats ride a broadcast join (#domains × 257
    * rows), and ranks within a bucket offset by the bucket's cumulative
    * count, so `sample_rank` is still the exact global (md5, id) rank.
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
    val bcounts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("_mix_d"), bucket.as("_mix_b"))
      .agg(count(lit(1)).as("_mix_n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val counts = bcounts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val quotas = quotasFromCounts(counts, alpha, budget)
    // per (domain, bucket): rows in earlier buckets (cum) and how many of
    // this bucket make the quota; buckets contributing nothing are dropped
    // HERE, so wholly-unselected buckets never reach the window at all
    val stats = bcounts.groupBy(_._1).toSeq.flatMap { case (d, bs) =>
      val q = quotas(d)
      var cum = 0L
      bs.sortBy(_._2).map { case (_, b, n) =>
        val out = (d, b, cum, math.max(0L, math.min(q - cum, n)))
        cum += n; out
      }
    }.filter(_._4 > 0L)
    val spark = df.sparkSession
    import spark.implicits._
    val statsDf = stats.toDF("_mix_d", "_mix_b", "_mix_cum", "_mix_sel")
    val quotaExpr = quotas.toSeq.sortBy(_._1).foldLeft(
      when(lit(false), lit(0L))) {
      case (acc, (d, q)) => acc.when(col(domainCol) === d, lit(q))
    }.otherwise(lit(0L))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_mix_d"), col("_mix_b"))
      .orderBy(h.asc_nulls_last, col(idCol))
    df.join(broadcast(statsDf),
        col(domainCol) === col("_mix_d") && bucket === col("_mix_b"))
      .withColumn("sample_rank",
        (col("_mix_cum") + row_number().over(w)).cast("long"))
      .withColumn("mix_quota", quotaExpr)
      .filter(col("sample_rank") <= col("mix_quota"))
      .drop("_mix_d", "_mix_b", "_mix_cum", "_mix_sel")
  }

  /** The quota table behind [[temperatureMix]]:
    * `min(n_d, floor(budget · n_d^alpha / Σ n^alpha))` per non-null domain.
    */
  def temperatureQuotas(
      df: DataFrame, domainCol: String, alpha: Double, budget: Long): Map[String, Long] = {
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    quotasFromCounts(counts, alpha, budget)
  }

  /** Quotas from domain counts. The weight sum runs in sorted-domain order
    * so [[temperatureMix]] (counts summed from hash-prefix buckets) and
    * [[temperatureQuotas]] (counts aggregated directly) produce
    * bit-identical quotas — q99's oracle replays quotas captured via the
    * latter against a mix drawn via the former.
    */
  private def quotasFromCounts(
      counts: Map[String, Long], alpha: Double, budget: Long): Map[String, Long] = {
    val wsum = counts.toSeq.sortBy(_._1)
      .map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    counts.map { case (d, n) =>
      d -> math.min(n, (budget * math.pow(n.toDouble, alpha) / wsum).toLong)
    }
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
