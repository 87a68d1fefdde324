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

  /** 32-hex-digit cutoff = floor(fraction · 16^32), zero-padded — md5 hex
    * strings of equal length compare lexicographically as numbers.
    */
  private[ops] def hexCutoff(fraction: Double): String = {
    val max = BigInt(1) << 128
    val cut = (BigDecimal(max) * BigDecimal(fraction)).toBigInt
    val hex = cut.toString(16)
    ("0" * (32 - hex.length)) + hex
  }
}
