package graft.ops

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level deduplication (CCNet / RefinedWeb-style): drop individual
  * lines that recur across too many documents — navigation chrome, cookie
  * banners, boilerplate headers — while keeping the documents themselves.
  * Operates below document granularity, so it removes the noise that
  * document-level near-dup (which sees mostly-unique documents) cannot.
  *
  * Reference behavior modeled on the corpus-curation stage of web-scale LLM
  * pipelines (CCNet: Wenzek et al., LREC'20 — paragraph-hash dedup before
  * language scoring).
  *
  * Scale design: three shuffles, all on bounded keys —
  *   1. line-hash aggregate to compute document frequency (map-side
  *      partial aggregation collapses repeats before the exchange);
  *   2. left-anti join of lines against the common-line set (AQE broadcasts
  *      it when small — the common set is by construction the tiny head of
  *      the line-frequency distribution);
  *   3. re-group by document id to reassemble text.
  * Per-document line counts are bounded by document size, so no key in any
  * exchange exceeds max-doc-lines; nothing is ever all-pairs and nothing
  * lands on the driver.
  */
object Lines {

  /** Documents with lines that appear in more than `maxDocFreq` distinct
    * documents removed. Output: the `idCol`, rebuilt `textCol` (empty
    * string when every line was dropped), `n_lines` (original), `n_kept`.
    *
    * `sep` splits AND rejoins, so round-tripping a document with no common
    * lines is the identity. When `normalize` is set, frequency counting and
    * matching key on `lower(trim(line))` — whitespace/case variants of a
    * boilerplate line count as the same line — while the surviving text
    * keeps its original bytes.
    */
  def dropCommonLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Long,
      sep: String = "\n",
      normalize: Boolean = false): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val sepLit = java.util.regex.Pattern.quote(sep)

    // posexplode_outer + null filter: a plain posexplode's inferred generate
    // filter re-runs the split at the scan (see Dedup.minePairs)
    val lines = docs
      .select(col(idCol).as("_id"),
        posexplode_outer(split(col(textCol), sepLit)).as(Seq("_pos", "_line")))
      .filter(col("_line").isNotNull)
      .withColumn("_k",
        xxhash64(if (normalize) lower(trim(col("_line"))) else col("_line")))

    // document frequency per line; only the (rare) common head survives
    val common = lines
      .groupBy(col("_k"))
      .agg(countDistinct(col("_id")).as("_df"))
      .filter(col("_df") > maxDocFreq)
      .select(col("_k"))

    val kept = lines.join(common, Seq("_k"), "left_anti")

    val rebuilt = kept
      .groupBy(col("_id"))
      .agg(
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
            x => x.getField("_line"))).as("_text"),
        count(lit(1)).as("n_kept"))

    docs
      .select(col(idCol), size(split(col(textCol), sepLit)).as("n_lines"))
      .join(rebuilt, col(idCol) === col("_id"), "left")
      .select(
        col(idCol),
        coalesce(col("_text"), lit("")).as(textCol),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** C4-style page cleaning (Raffel et al. 2020, arXiv:1910.10683 §2.2 —
    * public method): keep only lines that end in terminal punctuation AND
    * have at least `minWordsPerLine` words; drop the whole page when it
    * contains "lorem ipsum" or a curly brace (code markers), or when fewer
    * than `minLines` lines survive. Output: survivors only, with the
    * rebuilt text and the kept-line count.
    *
    * Pure per-row expression work — the line predicate is a higher-order
    * `filter` over the split array, no explode, no shuffle at any corpus
    * size (contrast [[dropCommonLines]], whose frequency rule needs a
    * corpus aggregate).
    */
  def c4Clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWordsPerLine: Int = 5,
      minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]\\s*$") &&
        size(Text.words(l)) >= minWordsPerLine)
    docs
      .select(col(idCol), col(textCol), kept.as("_kept"))
      .filter(!lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{") &&
        size(col("_kept")) >= minLines)
      .select(col(idCol),
        array_join(col("_kept"), "\n").as("text_clean"),
        size(col("_kept")).cast("long").as("n_kept"))
  }
}
