package graft.destinations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimension Z-order (Morton-curve) clustering for compaction
  * rewrites — the role `OPTIMIZE ... ZORDER BY (a, b)` plays for Delta
  * tables. Linear range clustering tightens ONE column's per-file min/max
  * intervals; interleaving the bits of per-column range-bucket ids orders
  * rows along a space-filling curve instead, so EVERY cluster column's
  * interval shrinks to roughly its bucket width and
  * [[graft.sources.DeltaLog.readWhere]] / upsert pruning skip files for
  * predicates on any of the clustered columns, not just the first.
  *
  * Scale shape: bucket boundaries come from one bounded random sample of
  * the cluster columns (the same sketch Spark's own `RangePartitioner`
  * uses), collected to the driver as ≤ `sampleTarget` rows × k columns and
  * re-emitted as plan literals; the bucket ids and the interleaved z-value
  * are pure codegen-able column arithmetic; the final placement is one
  * `repartitionByRange` on the z-value (distributed range sketch) plus a
  * partition-local sort. No global sort, no driver data proportional to
  * table size. Boundary quality only affects balance, never correctness —
  * rows always carry their exact values; clustering decides layout.
  */
object ZOrder {

  /** Buckets per column: 64 → 6 bits per dimension, giving 64^k distinct
    * z-values — comfortably above any realistic output-file count while
    * keeping the bucket `when`-free filter expression shallow.
    */
  val buckets = 64

  private val zCol = "_graft_z"

  /** Repartition `df` into `nOut` curve-ordered write partitions on
    * `cols`. `curve` picks the space-filling curve: `"zorder"` (Morton
    * interleave — the default, `OPTIMIZE … ZORDER BY`) or `"hilbert"`
    * (the liquid-clustering curve — unit-step locality, so each output
    * file covers a tighter k-d box and box predicates skip strictly more
    * files; see [[graft.functions.HilbertCurve]]). `approxRows` (from
    * add-action numRecords stats) sizes the boundary sample without an
    * extra count job; when absent, one column-pruned count pass runs.
    * Columns with < 2 distinct sampled values contribute no bits; if no
    * column contributes any, falls back to linear range clustering (which
    * then degenerates gracefully the same way).
    */
  def cluster(
      df: DataFrame,
      cols: Seq[String],
      nOut: Int,
      approxRows: Option[Long],
      seed: Long = 7L,
      curve: String = "zorder"): DataFrame = {
    require(curve == "zorder" || curve == "hilbert", s"unknown curve: $curve")
    val bounds = sampleBoundaries(df, cols, approxRows, seed)
    val usable = bounds.filter(_._2.nonEmpty)
    if (usable.isEmpty)
      return df.repartitionByRange(nOut, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*)
    val key = if (curve == "hilbert") hilbertValue(usable) else zValue(usable)
    df.withColumn(zCol, key)
      .repartitionByRange(nOut, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }

  /** One bounded sample of the cluster columns → per-column boundary
    * values (≤ [[buckets]]-1 each, frequency-weighted like
    * `RangePartitioner`'s sketch, deduped). Driver-side ordering uses the
    * values' natural `Comparable` order — for strings that is UTF-16,
    * which can disagree with Spark's UTF-8 binary order on astral
    * characters; that skews only bucket BALANCE, never results, because
    * the runtime bucket comparison below is Spark's own `<=`.
    */
  private def sampleBoundaries(
      df: DataFrame,
      cols: Seq[String],
      approxRows: Option[Long],
      seed: Long,
      sampleTarget: Int = 20000): Seq[(String, Seq[Any])] = {
    val pruned = df.select(cols.map(col): _*)
    val total = approxRows.getOrElse(pruned.count())
    if (total <= 0) return cols.map(_ -> Nil)
    val fraction = math.min(1.0, sampleTarget.toDouble / total)
    val rows = pruned.sample(withReplacement = false, fraction, seed).collect()
    cols.zipWithIndex.map { case (c, i) =>
      val vs = rows.iterator.map(_.get(i)).filter(_ != null).toArray
      if (vs.length < 2) c -> Nil
      else {
        scala.util.Sorting.stableSort(vs, lt _)
        val nb = buckets - 1
        c -> (1 to nb)
          .map(j => vs(math.min(vs.length - 1, j * vs.length / (nb + 1))))
          .distinct
      }
    }
  }

  private def lt(a: Any, b: Any): Boolean = a match {
    case c: java.lang.Comparable[_] =>
      c.asInstanceOf[java.lang.Comparable[Any]].compareTo(b) < 0
    case _ => false
  }

  /** Per-column bucket-id columns: bucket id = how many boundaries are ≤
    * the value (an array-literal filter — nulls land in bucket 0), plus
    * the bit width each id spans (ids run 0..bs.size).
    */
  private def bucketIds(bounds: Seq[(String, Seq[Any])]): Seq[(Column, Int)] =
    bounds.map { case (c, bs) =>
      val bucket = size(filter(array(bs.map(lit): _*), b => b <= col(c)))
      (bucket, 32 - Integer.numberOfLeadingZeros(bs.size))
    }

  /** The interleaved z-value: bit i of column j's bucket id goes to z bit
    * `i * k + j` (Morton order, LSB first; columns with fewer boundaries
    * simply contribute fewer bits).
    */
  private def zValue(bounds: Seq[(String, Seq[Any])]): Column = {
    val k = bounds.size
    val terms = for {
      ((bucket, bits), j) <- bucketIds(bounds).zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(bucket, i).bitwiseAND(lit(1)).cast("long"), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The Hilbert curve position of the bucket ids ([[graft.functions
    * .HilbertIndex]], codegen'd). The curve needs one uniform bit depth
    * across dimensions, so every id rides at the widest column's depth —
    * narrower columns just never set their high bits, which restricts the
    * curve to a sub-box and costs nothing. Dimension count is bounded by
    * the 63-bit key (10 dims at the default 6-bit buckets); beyond that,
    * Morton — whose key packs the same bits — could not fit either, so
    * callers clustering on that many columns have a modeling problem no
    * curve fixes.
    */
  private def hilbertValue(bounds: Seq[(String, Seq[Any])]): Column = {
    val ids = bucketIds(bounds)
    val bits = ids.map(_._2).max
    require(bounds.size * bits <= 63,
      s"hilbert clustering on ${bounds.size} columns at $bits bits/column " +
        "exceeds the 63-bit sort key; cluster on fewer columns")
    graft.functions.HilbertIndex(bits, ids.map(_._1))
  }
}
