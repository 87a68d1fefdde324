package graft.ops

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical relevance scoring for corpus curation — "find the documents
  * about X" without embeddings: BM25 (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework"), the standard retrieval baseline,
  * with Lucene's always-positive idf variant
  * `ln((N − df + 0.5)/(df + 0.5) + 1)`.
  *
  * The curation use case is targeted-domain selection: score every corpus
  * document against a topic keyword list, keep the head. Query terms are
  * config-sized, so term frequencies are per-row array filters over the
  * tokenized text (no inverted index, no shuffle); the corpus statistics
  * (N, avgdl, per-term document frequencies) are ONE aggregate whose
  * scalar row becomes plan literals — the standard aggregate-to-driver
  * contract, never per-row driver state. The stats aggregate runs eagerly
  * at call time (the [[Ann.ivfBuild]] precedent); the tokenized
  * term-frequency frame is persisted across the stats and scoring passes
  * (the pair-miner convention), so the corpus tokenizes once.
  */
object Ranking {

  /** Per-document BM25 score against `terms`. Output: (idCol, doc_len,
    * bm25), every input doc scored (zero when no term matches).
    *
    * Leak-free: the internal term-frequency cache only needs to live
    * across the eager stats aggregate, so this form releases it before
    * returning — the scoring frame recomputes the tokenization in its
    * (single) consumption pass, which costs the same one corpus pass the
    * cached read would. Callers that score AND re-consume repeatedly
    * should use [[bm25WithCache]] and manage the handle themselves.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (scores, handle) = bm25WithCache(docs, idCol, textCol, terms, k1, b)
    // stats already ran (eager aggregate inside bm25WithCache): nothing
    // holds the cache after this, so executor storage is returned now
    handle.unpersist()
    scores
  }

  /** [[bm25]] plus the persisted term-frequency frame backing it, so
    * callers that fully consume the scores can release the cache
    * (`handle.unpersist()`) — the [[Ann.semanticPairs]] convention.
    */
  def bm25WithCache(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): (DataFrame, DataFrame) = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.size <= 64, "terms beyond ~64: build an inverted index instead of per-row filters")
    val base = docs.select(col(idCol), Text.words(col(textCol)).as("_ws"))
      .withColumn("_dl", size(col("_ws")))
    val withTf = base.select(
      col(idCol) +: col("_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("_ws"), w => w === t)).as(s"_tf$i")
        }: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aggExprs =
      sum(col("_dl").cast("long")).as("dlsum") +: count(lit(1)).as("n") +:
        terms.indices.map(i => sum((col(s"_tf$i") > 0).cast("long")).as(s"_df$i"))
    val stats = withTf.agg(aggExprs.head, aggExprs.tail: _*).head()
    val n = stats.getAs[Long]("n")
    require(n > 0, "empty corpus")
    val avgdl = stats.getAs[Long]("dlsum").toDouble / n
    val score = terms.indices.map { i =>
      val df = stats.getAs[Long](s"_df$i")
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val tf = col(s"_tf$i").cast("double")
      lit(idf) * tf * lit(k1 + 1) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("_dl").cast("double") / lit(avgdl)))
    }.reduce(_ + _)
    (withTf.select(col(idCol), col("_dl").cast("long").as("doc_len"), score.as("bm25")),
      withTf)
  }
}
