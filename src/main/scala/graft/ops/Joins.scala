package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks natively, composed from built-ins.
  *
  * [[asofJoin]] is the union+window formulation of a time-series as-of
  * join: instead of a per-key range join (which Spark would plan as a
  * broadcast-nested-loop or an exploding theta join), both sides are
  * unioned, shuffled ONCE on the key, and each left row picks up the most
  * recent right values via a running `last(ignoreNulls)` window. Cost is
  * one shuffle + one sort over |L|+|R| rows — the optimal distributed
  * shape, and it inherits AQE skew splitting on the key.
  */
object Joins {

  /** As-of (backward) join: for every left row, attach `rightCols` from the
    * latest right row with the same `keys` and `right.timeCol <= left
    * .timeCol` (inclusive). Inner semantics: left rows with no prior right
    * row are dropped; set `keepUnmatched = true` for the left-outer form.
    *
    * The carried right timestamp is exposed as `asof_ts`, each right value
    * column as `<name><suffix>`. Right rows should be unique per
    * (keys, timeCol); on exact ties the carried row is the last in an
    * implementation-defined order — dedupe upstream if it matters.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      suffix: String = "_r",
      keepUnmatched: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    val leftCols = left.columns.toSeq

    // One payload struct carries timeCol + ALL right value columns together,
    // so every carried field comes from the SAME matched right row — a
    // genuine NULL in a right value column stays NULL instead of being
    // back-filled from an older row. (Also one window pass instead of N.)
    val payload = struct(
      (col(timeCol).as("_asof_time") +: rightCols.map(c => col(c).as(c))): _*)
    val payloadType = right.select(payload.as("p")).schema.head.dataType

    val l = left
      .withColumn("_is_left", lit(1))
      .select(
        (keys.map(col) :+ col(timeCol) :+ col("_is_left")) ++
          leftCols.filterNot(c => keys.contains(c) || c == timeCol).map(col) :+
          lit(null).cast(payloadType).as("_payload"): _*)

    val r = right
      .withColumn("_is_left", lit(0))
      .select(
        (keys.map(col) :+ col(timeCol) :+ col("_is_left")) ++
          leftCols.filterNot(c => keys.contains(c) || c == timeCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          payload.as("_payload"): _*)

    // right rows sort before left rows at the same timestamp → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("_carry", last(col("_payload"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", col("_carry").getField("_asof_time"))
    val withVals = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"$c$suffix", col("_carry").getField(c))
    }
    val leftOnly = withVals.filter(col("_is_left") === 1)
    val matched = if (keepUnmatched) leftOnly else leftOnly.filter(col("asof_ts").isNotNull)
    matched.select(
      (leftCols.map(col) :+ col("asof_ts")) ++ rightCols.map(c => col(s"$c$suffix")): _*)
  }

  /** Interval (range-containment) join: pair each left row with every right
    * interval `[startCol, endCol)` of the same `keys` that contains its
    * `timeCol` — e.g. clicks against attribution windows.
    *
    * Spark plans a raw `t >= start AND t < end` predicate as a
    * broadcast-nested-loop (quadratic per key). Here both sides are mapped
    * onto fixed time buckets — each interval exploded into the buckets it
    * overlaps, each left row into its single bucket — so the range predicate
    * becomes one hash equi-join on (keys, bucket) plus an exact residual
    * filter. Cost: |L| + Σ interval bucket spans, shuffled once; AQE skew
    * handling applies. Pick `bucketSeconds` near the typical interval
    * length (≈1 bucket per interval); intervals spanning more than
    * `maxIntervalBuckets` buckets fail fast rather than exploding.
    *
    * Right columns (except `keys`) are carried with `suffix` appended.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      startCol: String,
      endCol: String,
      bucketSeconds: Long = 3600,
      suffix: String = "_r",
      maxIntervalBuckets: Int = 1024): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = bucketSeconds * 1000000L // bucket width in microseconds
    val l = left.withColumn("_gb", floor(unix_micros(col(timeCol)) / w))
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"$c$suffix")
    }
    val s0 = col(s"$startCol$suffix")
    val e0 = col(s"$endCol$suffix")
    val r = renamed
      .withColumn("_b0", floor(unix_micros(s0) / w))
      // end is exclusive: the last overlapped bucket holds end - 1µs
      .withColumn("_b1", floor((unix_micros(e0) - 1) / w))
      .filter(col("_b1") >= col("_b0")) // empty/negative intervals match nothing
      .withColumn("_gb", explode(sequence(col("_b0"),
        when(col("_b1") - col("_b0") < maxIntervalBuckets, col("_b1"))
          .otherwise(raise_error(concat(
            lit(s"intervalJoin: interval spans >= $maxIntervalBuckets buckets of "),
            lit(s"${bucketSeconds}s — raise bucketSeconds or split the interval"))))
      )))
      .drop("_b0", "_b1")
    l.join(r, keys :+ "_gb")
      .filter(col(timeCol) >= s0 && col(timeCol) < e0)
      .drop("_gb")
  }
}
