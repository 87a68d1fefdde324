package graft

import graft.config._
import graft.functions.Text
import graft.ops.{Ann, Dedup, Multimodal}
import graft.run.{CollectingTracker, Runner}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Language-model family: BPE train/encode, n-gram LMs, perplexity, DSIR, BM25, packing/token windows.
  *
  * Split from EngineQueries (round 9) for per-family review; entries are
  * verbatim and the combined key set is unchanged.
  */
private[graft] object LangModelQueries {
  import QueryHelpers._

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // Concat-and-chunk sequence packing: each doc assigned to the 512-token
    // training chunk its first token lands in (per-language streams, doc_id
    // order) — one running-sum window, integer-exact in any engine.
    "q65_sequence_pack" -> ((s, dir) => {
      ops.Packing.concatChunkBins(t(s, dir, "documents"),
          partitionCols = Seq("lang"), orderCol = "doc_id",
          tokens = Text.tokenCount(col("text")), budget = 512L)
        .select(col("doc_id"), col("lang"), col("tok"), col("offset"), col("bin"))
        .orderBy(col("doc_id"))
    }),


    // Overlapping token-window chunking (RAG / context-window prep): each
    // doc → windows of 40 tokens every 20, full coverage, no shuffle.
    "q69_token_windows" -> ((s, dir) => {
      ops.Packing.tokenWindows(t(s, dir, "documents"), "doc_id", "text",
          window = 40, stride = 20)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),


    // Token-budget data selection: best-quality docs per language until a
    // 2000-token budget fills — greedy window admission, deterministic.
    "q71_budget_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("q", Text.qualityScore(col("text")))
      ops.Packing.selectByTokenBudget(docs, Seq("lang"), col("q"), "doc_id",
          Text.tokenCount(col("text")), budget = 2000L)
        .select(col("doc_id"), col("lang"), col("q"), col("tok"))
        .orderBy(col("doc_id"))
    }),


    // Unigram LM perplexity (CCNet-style quality filter, n=1): train the
    // LM in one aggregate over the corpus, score each doc's average token
    // log-prob + perplexity. Both engines compute identical per-token
    // ln(c/N) terms; sums differ only in fp association, absorbed by the
    // 6/4-dp rounding.
    "q80_unigram_ppl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = ops.LangModel.unigramTrain(docs, "text")
      ops.LangModel.unigramScore(docs, "doc_id", "text", lm)
        .select(col("doc_id"), col("n_tok"),
          round(col("avg_logprob"), 6).as("avg_logprob"),
          round(col("ppl"), 4).as("ppl"))
        .orderBy(col("doc_id"))
    }),


    // BPE tokenizer-training step: corpus-wide adjacent-pair frequencies
    // over the BPE-ish pre-tokenization, top-50 merge candidates — exact
    // integer counts, TakeOrdered top-k (never a full sort).
    "q86_bpe_pairs" -> ((s, dir) => {
      ops.LangModel.bpePairCounts(t(s, dir, "documents"), "text")
        .select(concat_ws(" ", col("a"), col("b")).as("pair"), col("n"))
        .orderBy(col("n").desc, col("pair")).limit(50)
    }),


    // Bigram LM with stupid backoff (one step closer to CCNet's KenLM
    // scoring than q80's unigram): per-token CASE over (first | observed
    // bigram | backoff), identical ln-ratio arithmetic in both engines.
    // Trained on the doc_id < 250 slice and scored over the full corpus so
    // the backoff branch has real ground truth (self-scoring never backs
    // off — every bigram is its own training evidence); OOV tokens drop in
    // the inner vocabulary join identically in both engines.
    "q87_bigram_lm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") < 250)
      val uni = ops.LangModel.unigramTrain(train, "text")
      val bi = ops.LangModel.bigramTrain(train, "text")
      ops.LangModel.bigramScore(docs, "doc_id", "text", uni, bi)
        .select(col("doc_id"), col("n_tok"),
          round(col("avg_logscore"), 6).as("avg_logscore"),
          round(col("ppl"), 4).as("ppl"))
        .orderBy(col("doc_id"))
    }),


    // BM25 topic scoring (targeted-domain selection): every doc scored
    // against a 3-term keyword list — term stats from one aggregate, score
    // arithmetic mirrored operation-for-operation by the oracle.
    "q89_bm25" -> ((s, dir) => {
      ops.Ranking.bm25(t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "table", "hash"))
        .select(col("doc_id"), col("doc_len"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("doc_id"))
    }),


    // DSIR-style data selection: importance weights (target-vs-raw unigram
    // log-likelihood ratio, 'en' slice as the target domain) + deterministic
    // Gumbel top-50 resampling keyed on content hashes. Weights are rounded
    // to 6 dp BEFORE the Gumbel key so the selected SET is identical across
    // engines (raw sums differ in final ulps; the key arithmetic after
    // rounding is bit-identical).
    "q93_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tLm = ops.LangModel.unigramTrain(docs.filter(col("lang") === "en"), "text")
      val rLm = ops.LangModel.unigramTrain(docs, "text")
      val wts = ops.LangModel.importanceWeights(docs, "doc_id", "text", tLm, rLm)
        .withColumn("weight", round(col("weight"), 6))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      ops.LangModel.gumbelTopK(wts, "doc_id", "text", "weight", k = 50)
        .select(col("doc_id"), col("n_tok"), col("weight"),
          round(col("gumbel_key"), 6).as("gumbel_key"))
    }),


    // BPE tokenizer TRAINING (Sennrich et al., ACL'16): 20 merge rounds
    // over the vocabulary-sized (word, freq) frame — each round one
    // pair-count aggregate whose argmax row is all the driver sees. The
    // oracle replays the full iterative training independently in DuckDB
    // (20 unrolled merge iterations over the same delimited-token strings),
    // so the learned merge table is hash-checked end to end.
    "q94_bpe_train" -> ((s, dir) => {
      val merges = ops.LangModel.bpeTrain(t(s, dir, "documents"), "text", 20)
      import s.implicits._
      merges.map(m => (m.rank, m.a, m.b, m.n)).toDF("rank", "a", "b", "n")
        .orderBy(col("rank"))
    }),


    // BPE ENCODE with the learned merges applied in rank order (Sennrich's
    // sequential apply-bpe semantics): per-row scan work, merges ride as
    // plan literals. Oracle: DuckDB re-derives the merges itself (same
    // unrolled training) and re-encodes — fully independent.
    "q95_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = ops.LangModel.bpeTrain(docs, "text", 20)
      ops.LangModel.bpeEncode(docs.filter(col("doc_id") < 100), "doc_id", "text", merges)
        // tokens joined on a space (lossless: tokens are substrings of
        // whitespace-free words) — the gate's row compare wants scalars
        .select(col("doc_id"), col("n_tokens"),
          array_join(col("tokens"), " ").as("token_str"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q94_bpe_train" -> bpeTrainOracleSql(20),

    "q95_bpe_encode" -> bpeEncodeOracleSql(20),

    "q65_sequence_pack" ->
      """WITH t AS (
           SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS tok
           FROM documents)
         SELECT doc_id, lang, tok,
           CAST(coalesce(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset,
           CAST(floor(coalesce(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS bin
         FROM t ORDER BY doc_id""",

    "q80_unigram_ppl" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS w
           FROM documents),
         freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
         tot AS (SELECT sum(c) AS n FROM freq),
         sc AS (SELECT t.doc_id, count(*) AS n_tok,
                       sum(ln(f.c / (SELECT n FROM tot))) AS lp
                FROM tok t JOIN freq f ON t.w = f.w GROUP BY t.doc_id)
         SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           round(lp / n_tok, 6) AS avg_logprob,
           round(exp(-lp / n_tok), 4) AS ppl
         FROM sc ORDER BY doc_id""",

    // the content-hash uniform is the hex value of md5's first 8 digits
    // (digit-sum form here = conv() on the engine side; both compute the
    // same exact integer), shifted by +0.5 so u is never 0 or 1
    "q93_dsir_select" ->
      """WITH w0 AS (
           SELECT doc_id, lang, text,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws
           FROM documents),
         tok AS (SELECT doc_id, lang, unnest(ws) AS w FROM w0),
         tlm AS (SELECT w, count(*) AS c FROM tok WHERE lang = 'en' GROUP BY w),
         tN AS (SELECT sum(c) AS n, count(*) AS v FROM tlm),
         rlm AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
         rN AS (SELECT sum(c) AS n, count(*) AS v FROM rlm),
         sc AS (
           SELECT t.doc_id, count(*) AS n_tok,
             sum(ln((coalesce(tl.c, 0) + 0.5)
               / ((SELECT n FROM tN) + 0.5 * (SELECT v FROM tN)))) AS lp_t,
             sum(ln((coalesce(rl.c, 0) + 0.5)
               / ((SELECT n FROM rN) + 0.5 * (SELECT v FROM rN)))) AS lp_r
           FROM tok t
           LEFT JOIN tlm tl ON t.w = tl.w
           LEFT JOIN rlm rl ON t.w = rl.w
           GROUP BY t.doc_id),
         wt AS (SELECT doc_id, n_tok,
                  round(lp_t / n_tok - lp_r / n_tok, 6) AS weight FROM sc),
         g AS (
           SELECT w2.doc_id, w2.n_tok, w2.weight,
             w2.weight - ln(-ln((list_sum(list_transform(range(1, 9),
               i -> (strpos('0123456789abcdef', substr(md5(d.text), i, 1)) - 1)
                    * power(16, 8 - i))) + 0.5) / 4294967296)) AS gkey
           FROM wt w2 JOIN documents d ON d.doc_id = w2.doc_id),
         r AS (SELECT doc_id, n_tok, weight, gkey,
                 row_number() OVER (ORDER BY gkey DESC, doc_id) AS rk FROM g)
         SELECT doc_id, n_tok, weight, round(gkey, 6) AS gumbel_key
         FROM r WHERE rk <= 50 ORDER BY gkey DESC, doc_id""",

    // constants spelled as the same computations ((1.2 + 1), (1 - 0.75)) so
    // both engines evaluate identical doubles; term order + left-assoc sum
    // mirror the Scala reduce
    "q89_bm25" ->
      """WITH d AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws
           FROM documents),
         t AS (
           SELECT doc_id, len(ws) AS dl,
             len(list_filter(ws, x -> x = 'spark')) AS tf0,
             len(list_filter(ws, x -> x = 'table')) AS tf1,
             len(list_filter(ws, x -> x = 'hash')) AS tf2
           FROM d),
         s AS (
           SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, count(*) AS n,
             sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
           FROM t)
         SELECT doc_id, CAST(dl AS BIGINT) AS doc_len,
           round(
             ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * tf0 * (1.2 + 1)
               / (tf0 + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))
             + ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 * (1.2 + 1)
               / (tf1 + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))
             + ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * tf2 * (1.2 + 1)
               / (tf2 + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl)), 6) AS bm25
         FROM t, s ORDER BY doc_id""",

    "q87_bigram_lm" ->
      """WITH tokd AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws
           FROM documents),
         tok AS (
           SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws), 0) + 1),
               i -> {'w': ws[i],
                     'prev': CASE WHEN i = 1 THEN NULL ELSE ws[i-1] END})) AS s
           FROM tokd),
         flat AS (SELECT doc_id, s.w AS w, s.prev AS prev FROM tok WHERE s.w IS NOT NULL),
         uni AS (SELECT w, count(*) AS c FROM flat WHERE doc_id < 250 GROUP BY w),
         tot AS (SELECT sum(c) AS n FROM uni),
         bi AS (SELECT prev, w, count(*) AS c2 FROM flat
                WHERE prev IS NOT NULL AND doc_id < 250
                GROUP BY prev, w),
         sc AS (
           SELECT f.doc_id,
             CASE WHEN f.prev IS NULL THEN ln(u.c / (SELECT n FROM tot))
                  WHEN b.c2 IS NOT NULL THEN ln(b.c2 / up.c)
                  ELSE ln(0.4 * u.c / (SELECT n FROM tot)) END AS lp
           FROM flat f
           JOIN uni u ON f.w = u.w
           LEFT JOIN bi b ON b.prev = f.prev AND b.w = f.w
           LEFT JOIN uni up ON up.w = f.prev)
         SELECT doc_id, count(*) AS n_tok,
           round(sum(lp) / count(*), 6) AS avg_logscore,
           round(exp(-sum(lp) / count(*)), 4) AS ppl
         FROM sc GROUP BY doc_id ORDER BY doc_id""",

    "q86_bpe_pairs" ->
      """WITH tk AS (
           SELECT regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS t
           FROM documents),
         p AS (SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
                 i -> t[i] || ' ' || t[i+1])) AS pair
               FROM tk),
         c AS (SELECT pair, count(*) AS n FROM p GROUP BY pair),
         r AS (SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk FROM c)
         SELECT pair, n FROM r WHERE rk <= 50 ORDER BY n DESC, pair""",

    "q71_budget_select" ->
      """WITH s AS (
           SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS BIGINT) AS tok,
             len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS n_tok,
             len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               w -> w IN ('the','and','of','to','in','is','that','for','with','was',
                          'der','die','und','das','ist','nicht','ein','mit','für','von',
                          'le','la','les','et','des','est','pour','dans','une','que',
                          'el','los','de','en','es','por','con','para'))) AS n_stop,
             greatest(length(text), 1) AS n_chars
           FROM documents),
         c AS (
           SELECT doc_id, lang, tok,
             floor((least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
               + (1.0 - least((CAST(n_punct AS DOUBLE) / n_chars) * 4.0, 1.0)) * 0.3
               + least((CAST(n_stop AS DOUBLE) / greatest(n_tok, 1)) * 5.0, 1.0) * 0.3)
               * 10000 + 0.5) / 10000 AS q
           FROM s),
         b AS (
           SELECT doc_id, lang, q, tok,
             coalesce(sum(tok) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_tok
           FROM c)
         SELECT doc_id, lang, q, tok FROM b
         WHERE before_tok < 2000 ORDER BY doc_id""",

    "q69_token_windows" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws
           FROM documents),
         c AS (
           SELECT doc_id, ws,
             unnest(range(0, CAST(ceil(CAST(greatest(len(ws) - 40, 0) AS DOUBLE) / 20) AS INT) + 1)) AS chunk_idx
           FROM w WHERE len(ws) > 0)
         SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(list_slice(ws, chunk_idx * 20 + 1, chunk_idx * 20 + 40), ' ') AS chunk,
           CAST(len(list_slice(ws, chunk_idx * 20 + 1, chunk_idx * 20 + 40)) AS INT) AS n_tokens
         FROM c ORDER BY doc_id, chunk_idx"""
  )
}
