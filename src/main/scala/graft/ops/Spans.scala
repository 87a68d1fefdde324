package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring span detection — the sub-document exact-dedup
  * granularity of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better", arXiv:2107.06499, public method). Document
  * dedup ([[Dedup]]), near-dup (MinHash/SimHash) and line dedup ([[Lines]])
  * all miss mid-document verbatim repeats that cross line boundaries —
  * licence blocks, quoted passages, templated paragraphs; this finds, for
  * every document, the maximal character spans every position of which is
  * covered by a length-`n` window whose content recurs corpus-wide.
  *
  * The paper builds a corpus suffix array; the Spark-native equivalent
  * needs no global ordered structure: every codepoint position contributes
  * one md5'd length-`n` window (pure scan work), duplicated windows fall
  * out of a bounded-key hash aggregate, and runs of marked positions merge
  * into maximal spans with one per-document window pass. A span reported
  * here is exactly a maximal region assembled from length-`n` substrings
  * each occurring ≥ `minCount` times — the paper's duplicate criterion.
  *
  * Scale design: ONE corpus pass over the posting relation (r19; it was
  * two — dup-set aggregate + equi-join — each re-running the positional
  * hash scan behind its own exchange) —
  *   1. one exchange keyed on the 64-bit window hash; the corpus-wide
  *      occurrence count (and the keepFirst canonical pick) are
  *      whole-partition window aggregates over that keying, so marking
  *      duplicated positions needs no join and no second pass;
  *   2. one window + one aggregate per document id to merge runs — per-key
  *      work is bounded by document length.
  * The posting relation is ~chars-per-doc rows per document (the same
  * fan-out the char-shingle Jaccard miner carries), so the exchanges are
  * linear in corpus size with bounded keys; nothing lands on the driver —
  * a corpus-hot hash's group stays in WindowExec's spillable buffer, the
  * same rows a merge join would stream through a single partition.
  */
object Spans {

  /** Maximal duplicated spans per document. Output: `idCol`,
    * `span_start`/`span_end` (1-based codepoint positions, inclusive),
    * `n_windows` (duplicated length-`n` windows merged into the span).
    * Windows hash `lower(text)`, matching the corpus-dedup convention of
    * the other miners; `minCount` counts total occurrences corpus-wide
    * (a within-document verbatim repeat is a duplicate too, as in the
    * paper). Overlapping or abutting marked windows merge: a new span
    * starts only where the gap between consecutive marked positions
    * exceeds the window length.
    */
  /** With `keepFirst`, the lexicographically first occurrence
    * (`(id, pos)` min, per window hash) is NOT marked — the paper's
    * "keep one copy" dedup semantic at window granularity: a block
    * repeated verbatim across documents yields spans everywhere except
    * the lowest-id document holding it, so `removeDupSpans` on the
    * result deduplicates rather than deletes. The canonical pick is a
    * per-hash aggregate (map-side combined, never a per-key window), and
    * both engines order the `(id, pos)` struct the same way, so the
    * choice is deterministic and oracle-checkable.
    */
  def dupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minCount: Long = 2L,
      keepFirst: Boolean = false): DataFrame = {
    require(n >= 4, "window below 4 chars matches ambient text, not reuse")
    require(minCount >= 2, "minCount < 2 would mark every position")

    // posexplode_outer + null filter on the generator OUTPUT: a plain
    // posexplode's inferred generate filter would re-run the whole
    // positional-hash pass at the scan (see SCALE.md, generate-filter trap).
    // Native one-digest-pass hashes with an 8-byte posting key — the
    // composed md5(substring) form paid interpreted lambdas plus a 32-char
    // string key through both corpus exchanges (13.8s → 3.3s at sf0.1).
    val postings = docs
      .select(col(idCol).as("_id"),
        posexplode_outer(
          graft.functions.PositionalHashes64(lower(col(textCol)), n))
          .as(Seq("_p0", "_h")))
      .filter(col("_h").isNotNull)
      // _pos as INT (a document beyond 2^31 codepoints predates this
      // miner's posting fan-out anyway): the posting relation transits
      // two corpus-wide exchanges and one sort-merge join — 4 bytes per
      // row here is measurable heap headroom at the 2 GiB soak envelope
      .select(col("_id"), (col("_p0") + 1).cast("int").as("_pos"), col("_h"))

    // ONE corpus pass, ONE corpus exchange (r19; guide §2.4/§1.2). The
    // old shape — groupBy(_h) dup-set + merge-join of postings against it
    // — re-ran the whole scan + positional-hash + explode pass TWICE
    // behind two separate corpus-wide exchanges: the groupBy's exchange
    // carries a partial aggregate (and, after column pruning, a narrower
    // projection) below it, so the subtrees never canonicalize equal and
    // exchange reuse cannot fire. The per-hash occurrence count and the
    // keepFirst canonical pick are whole-partition window aggregates over
    // the SAME keying the join needed anyway, so computing them as window
    // functions folds the dup-set build, the probe exchange and the merge
    // join into one exchange + one per-group pass. Identical semantics:
    // same corpus-wide count per hash, same (id, pos) struct-min canonical
    // pick. Every posting row crossed an _h exchange before too (as the
    // join probe), so shuffled bytes strictly shrink (the partials
    // exchange disappears); a corpus-hot window hash buffers its group in
    // WindowExec's spillable buffer — the same rows the merge join
    // streamed through a single partition before, still disk-bounded.
    val byHash = Window.partitionBy(col("_h"))
    val cntCol = count(lit(1)).over(byHash)
    val withAggs = postings
      .withColumn("_cnt", cntCol)
      .transform(df => if (keepFirst)
        df.withColumn("_first",
          min(struct(col("_id"), col("_pos"))).over(byHash))
      else df)
      .filter(col("_cnt") >= minCount)
    // project to (_id, _pos) BEFORE the per-document window: the span
    // merge never looks at the hash (or the canonical struct) again, and
    // this exchange+sort is the memory peak of the whole miner — narrow
    // rows here are what fit the 2 GiB soak heap (r14 q98 OOM)
    val marked =
      (if (keepFirst)
        withAggs.filter(!(col("_id") === col("_first._id") &&
          col("_pos") === col("_first._pos")))
      else withAggs).select(col("_id"), col("_pos"))

    val byDoc = Window.partitionBy(col("_id")).orderBy(col("_pos"))
    marked
      .withColumn("_prev", lag(col("_pos"), 1).over(byDoc))
      .withColumn("_new_span",
        when(col("_prev").isNull || col("_pos") > col("_prev") + n, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_new_span"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // HashPartitioning(_id) already clusters (_id, _sid): no extra shuffle
      .groupBy(col("_id"), col("_sid"))
      .agg(
        min(col("_pos")).cast("long").as("span_start"),
        (max(col("_pos")) + (n - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("_id").as(idCol),
        col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Documents with the given spans cut out — the removal half of
    * sub-document dedup: feed it [[dupSpans]]`(keepFirst = true)` output
    * and every duplicated block survives in exactly one place. `spans`
    * must carry `idCol`/`span_start`/`span_end` (1-based inclusive
    * codepoint positions into THIS frame's `textCol`); unsorted or
    * overlapping spans are tolerated (the cut clamps forward). Documents
    * with no spans pass through unchanged.
    *
    * Output: `idCol`, rebuilt `textCol`, `n_removed` codepoints. One
    * bounded-key aggregate on the span side + an equi-join; the cut is a
    * per-row fold over the document's own spans, so per-key work is
    * bounded by document size and nothing lands on the driver.
    */
  def removeSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spans: DataFrame): DataFrame = {
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(
        struct(col("span_start"), col("span_end")))).as("_spans"))
    val t = col(textCol)
    val cur = (st: org.apache.spark.sql.Column) => st.getField("cur")
    val acc = (st: org.apache.spark.sql.Column) => st.getField("acc")
    docs.join(perDoc, Seq(idCol), "left")
      .withColumn("_cut",
        when(col("_spans").isNull, t).otherwise(
          aggregate(col("_spans"),
            struct(lit(1L).as("cur"), lit("").as("acc")),
            (st, s) => struct(
              greatest(cur(st), s.getField("span_end") + 1).as("cur"),
              concat(acc(st), t.substr(cur(st).cast("int"),
                greatest(s.getField("span_start") - cur(st), lit(0L))
                  .cast("int"))).as("acc")),
            st => concat(acc(st), t.substr(cur(st).cast("int"),
              greatest(length(t) - cur(st) + 1, lit(0L)).cast("int")))))
      )
      .select(col(idCol), col("_cut").as(textCol),
        (length(t) - length(col("_cut"))).cast("long").as("n_removed"))
  }
}
