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
