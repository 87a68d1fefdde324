package graft.ops

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the distributed shape of CCNet-style
  * perplexity filtering (Wenzek et al., LREC'20: docs are kept/binned by LM
  * perplexity; the production model is a 5-gram KenLM, this is the same
  * contract over the n=1 model the engine can train in one aggregate).
  *
  * Scale design: training is one groupBy over exploded tokens (map-side
  * partial aggregation collapses each partition's repeats before the
  * exchange — the shuffle carries vocabulary, not corpus). Scoring joins
  * tokens to the frequency table on the word key — the LM is vocabulary-
  * sized, orders of magnitude smaller than the corpus, so AQE broadcasts
  * it when it fits and hash-joins otherwise — then one groupBy per doc
  * re-aggregates. Hot words ("the" in every doc) are join keys on the
  * BUILD side exactly once; the probe side fans out per occurrence, which
  * is linear in corpus size, never quadratic.
  */
object LangModel {

  /** Train a unigram LM: one row per word with its count, total-corpus
    * token count attached as a column (`n_total`) so the frame is
    * self-contained. */
  def unigramTrain(corpus: DataFrame, textCol: String): DataFrame = {
    // explode_outer + null filter: a plain explode's inferred generate
    // filter re-runs the tokenization split at the scan (see bpePairCounts)
    val freq = corpus
      .select(explode_outer(Text.words(col(textCol))).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // the scalar total rides along as a window-free cross join of one row —
    // Spark plans it as a broadcast nested loop of a single-row relation
    freq.crossJoin(freq.agg(sum(col("c")).as("n_total")))
  }

  /** Score each document under a trained unigram LM: token count, average
    * token log-probability, and perplexity `exp(-avg_logprob)`.
    *
    * `smoothK` is add-k smoothing applied at score time — p(w) =
    * (c + k) / (n_total + k·|V|) — so out-of-vocabulary tokens (scored
    * against an LM trained on a DIFFERENT corpus) get a proper nonzero
    * probability instead of -inf. With k = 0, OOV tokens are dropped from
    * the average (self-scoring never produces them).
    */
  def unigramScore(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, smoothK: Double = 0.0): DataFrame = {
    val tok = docs.select(col(idCol).as("_id"),
      explode_outer(Text.words(col(textCol))).as("w"))
      .filter(col("w").isNotNull)
    val joined =
      if (smoothK == 0.0) tok.join(model, Seq("w"))
        .withColumn("lp", log(col("c").cast("double") / col("n_total")))
      else {
        // two scalars to the driver (an aggregate result, same contract as
        // any count()) — NOT per-row state; they become literals in the plan
        val r = model.agg(max(col("n_total")).as("n"), count(lit(1)).as("v")).head()
        val (nTotal, vsize) = (r.getLong(0), r.getLong(1))
        tok.join(model.select(col("w"), col("c")), Seq("w"), "left")
          .withColumn("lp",
            log((coalesce(col("c"), lit(0L)).cast("double") + lit(smoothK)) /
              lit(nTotal.toDouble + smoothK * vsize)))
      }
    joined.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lp")).as("lp_sum"))
      .select(col("_id").as(idCol), col("n_tok"),
        (col("lp_sum") / col("n_tok")).as("avg_logprob"),
        exp(-col("lp_sum") / col("n_tok")).as("ppl"))
  }

  /** Per-token (prev, w) frame over an arbitrary token-array expression:
    * one generate, position 1's prev is null. explode_outer + null filter
    * (a plain explode's inferred generate filter would re-run the
    * tokenization at the scan — measured 30× slower at sf0.1; see
    * SCALE.md "generate-filter trap").
    */
  private def tokensWithPrev(df: DataFrame, toks: Column, keepNames: Seq[String]): DataFrame = {
    val keep = keepNames.map(col)
    df.select(keep :+ toks.as("_ws"): _*)
      .select(keep :+ explode_outer(when(size(col("_ws")) > 0,
        transform(sequence(lit(1), size(col("_ws"))),
          i => struct(element_at(col("_ws"), i).as("w"),
            when(i === 1, lit(null).cast("string"))
              .otherwise(element_at(col("_ws"), i - 1)).as("prev"))))).as("_s"): _*)
      .filter(col("_s").isNotNull)
      .select(keep :+ col("_s.w").as("w") :+ col("_s.prev").as("prev"): _*)
  }

  /** Train the bigram table: `(prev, w, c2)` adjacent-word counts. Use with
    * [[unigramTrain]]'s output in [[bigramScore]]. Same exchange shape as
    * unigram training: the shuffle carries the bigram vocabulary.
    */
  def bigramTrain(corpus: DataFrame, textCol: String): DataFrame =
    tokensWithPrev(corpus, Text.words(col(textCol)), Seq.empty)
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c2"))

  /** Score documents under a bigram LM with stupid backoff (Brants et al.
    * 2007, "Large Language Models in Machine Translation"): per token,
    *
    *   - first token:        ln(c(w) / N)
    *   - bigram observed:    ln(c(prev,w) / c(prev))
    *   - else (backoff):     ln(α · c(w) / N)
    *
    * Distribution shape matches [[unigramScore]]: tokens join the
    * vocabulary-sized model tables on their word keys (AQE broadcasts
    * when they fit), then one per-doc re-aggregate. Self-corpus scoring
    * only (an OOV token would need unigram smoothing — see `smoothK`
    * there).
    */
  def bigramScore(
      docs: DataFrame, idCol: String, textCol: String,
      unigrams: DataFrame, bigrams: DataFrame, alpha: Double = 0.4): DataFrame = {
    val tok = tokensWithPrev(
      docs.select(col(idCol).as("_id"), col(textCol)),
      Text.words(col(textCol)), Seq("_id"))
    val joined = tok
      .join(unigrams.select(col("w"), col("c"), col("n_total")), Seq("w"))
      .join(bigrams, Seq("prev", "w"), "left")
      .join(unigrams.select(col("w").as("prev"), col("c").as("cprev")), Seq("prev"), "left")
      .withColumn("lp",
        when(col("prev").isNull, log(col("c").cast("double") / col("n_total")))
          .when(col("c2").isNotNull, log(col("c2").cast("double") / col("cprev")))
          .otherwise(log(lit(alpha) * col("c").cast("double") / col("n_total"))))
    joined.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lp")).as("lp_sum"))
      .select(col("_id").as(idCol), col("n_tok"),
        (col("lp_sum") / col("n_tok")).as("avg_logscore"),
        exp(-col("lp_sum") / col("n_tok")).as("ppl"))
  }

  /** DSIR-style importance weight (Xie et al. 2023, arXiv:2302.03169 —
    * "Data Selection for Language Models via Importance Resampling",
    * public method): per document, the average per-token log-likelihood
    * ratio between a TARGET-domain unigram LM and a RAW-corpus unigram LM,
    * `w(d) = avg_t [ln p_target(t) − ln p_raw(t)]`. Positive ⇒ the doc
    * looks more like the target domain than the generic corpus — the
    * standard cheap proxy for "select raw data that resembles the target".
    * Both scores come from [[unigramScore]] with add-k smoothing (OOV
    * tokens get proper nonzero mass under both models).
    *
    * Output: (idCol, n_tok, weight). Two scoring joins against
    * vocabulary-sized models — same distribution shape as unigramScore.
    */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String,
      targetLm: DataFrame, rawLm: DataFrame, smoothK: Double = 0.5): DataFrame = {
    val t = unigramScore(docs, idCol, textCol, targetLm, smoothK)
      .select(col(idCol), col("n_tok"), col("avg_logprob").as("_lp_t"))
    val r = unigramScore(docs, idCol, textCol, rawLm, smoothK)
      .select(col(idCol), col("avg_logprob").as("_lp_r"))
    t.join(r, Seq(idCol))
      .select(col(idCol), col("n_tok"), (col("_lp_t") - col("_lp_r")).as("weight"))
  }

  /** Deterministic Gumbel top-k importance resampling (Vieira 2014's
    * "Gumbel-max trick for top-k sampling" made reproducible): sampling k
    * docs with probability ∝ exp(weight / temperature) is equivalent to
    * taking the top k by `weight/T + G` with independent Gumbel noise
    * `G = −ln(−ln u)`; drawing `u` from the doc's content hash
    * (md5 first 8 hex digits / 16⁸) makes the "noise" a pure function of
    * the content — the same docs are selected on any engine, any partition
    * layout, any run. One TakeOrdered top-k, no shuffle beyond it.
    */
  def gumbelTopK(
      weighted: DataFrame, idCol: String, keyCol: String, weightCol: String,
      k: Int, temperature: Double = 1.0): DataFrame = {
    require(k >= 1 && temperature > 0, "need k >= 1 and temperature > 0")
    val u = (conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("double") + 0.5) /
      lit(4294967296.0) // (int + ½) / 16⁸: u ∈ (0,1), never exactly 0 or 1
    weighted
      .withColumn("gumbel_key", col(weightCol) / temperature - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /** Adjacent-pair frequencies over the BPE-ish pre-tokenization — the core
    * distributed step of BPE tokenizer training (Sennrich et al. 2016): each
    * merge round ranks candidate pairs by corpus frequency; this computes
    * that ranking for the current token stream. Pair generation is pure
    * per-row transform work; the count is one groupBy whose exchange
    * carries the pair vocabulary (map-side combine collapses each
    * partition's repeats), not the corpus — the same shape as
    * [[unigramTrain]]. Pairs never cross document boundaries.
    */
  def bpePairCounts(corpus: DataFrame, textCol: String): DataFrame =
    tokensWithPrev(corpus, Text.bpeishTokens(lower(col(textCol))), Seq.empty)
      .filter(col("prev").isNotNull) // position 1 has no left neighbor
      .groupBy(col("prev").as("a"), col("w").as("b"))
      .agg(count(lit(1)).as("n"))

  // ------------------------------------------------------------------ BPE

  /** Delimiter for the delimited-token string encoding of a word. Every
    * token boundary (both ends included) is a DOUBLE separator:
    * `low` ⇒ `␟␟l␟␟o␟␟w␟␟`. Tokens are substrings of
    * whitespace-delimited words so they can never contain it (and even if
    * dirty text did, both the engine and the oracle build the string the
    * same way, so results stay consistent).
    *
    * The double boundary makes "merge all occurrences of pair (a,b)
    * greedily left-to-right" — the standard BPE merge step (Sennrich's
    * apply_bpe) — a single literal `replace(s, ␟a␟␟b␟, ␟ab␟)`: the
    * pattern consumes only the INNER half of each outer boundary, so
    * back-to-back occurrences keep a leading `␟` to match on and merge
    * in the same pass (`abab` + (a,b) → `ab ab`), while overlapping
    * occurrences still skip (`aaa` + (a,a) → `aa a`). A single-separator
    * encoding would eat the shared delimiter between consecutive
    * occurrences and silently leave `abab` as `ab a b`. The replacement
    * restores both outer halves, so the boundary invariant (always
    * `␟␟` between tokens) survives every merge.
    */
  private[graft] val BpeSep = "\u001f"

  /** A full token boundary. */
  private[graft] val BpeBound: String = BpeSep + BpeSep

  /** A word as its delimited character-token string. `(?s)(.)` matches any
    * codepoint (incl. line separators — identical under Java regex and
    * RE2, which differ on `.` vs U+2028 without the flag).
    */
  private def bpeDelimited(word: Column): Column =
    concat(lit(BpeBound), regexp_replace(word, "(?s)(.)", "$1" + BpeBound))

  /** Greedy-exact merge (pattern, replacement) literals for pair (a, b). */
  private def bpeMergeLits(a: String, b: String): (String, String) =
    (BpeSep + a + BpeBound + b + BpeSep, BpeSep + a + b + BpeSep)

  final case class BpeMerge(rank: Int, a: String, b: String, n: Long)

  /** UTF-8 byte order — Spark's string `orderBy` — for the driver loop's
    * tie-break, so driver and distributed training pick identical argmax
    * pairs even off the ASCII plane. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** The merge loop of [[bpeTrain]], in memory, over the collected
    * `(delimited string, freq)` vocabulary — IDENTICAL arithmetic to the
    * distributed iterations (adjacent-pair counts weighted by freq, argmax
    * by count desc then (a, b) ascending in UTF-8 byte order, Java
    * `String.replace`'s left-to-right non-overlapping apply — the same
    * semantics Spark's `replace` has). BpeTrainSpec pins the two paths'
    * merge lists equal on random corpora.
    */
  private def bpeTrainDriver(
      vocab0: Array[(String, Long)], numMerges: Int): Seq[BpeMerge] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[BpeMerge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      vocab.foreach { case (s, freq) =>
        val toks = s.split(BpeSep).filter(_.nonEmpty)
        var i = 0
        while (i < toks.length - 1) {
          counts.merge((toks(i), toks(i + 1)), freq, (x, y) => x + y)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestA: String = null
        var bestB: String = null
        var bestN = Long.MinValue
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val (a, b) = e.getKey
          val n = e.getValue.longValue()
          if (n > bestN || (n == bestN &&
              (utf8Less(a, bestA) || (a == bestA && utf8Less(b, bestB))))) {
            bestA = a; bestB = b; bestN = n
          }
        }
        merges += BpeMerge(rank, bestA, bestB, bestN)
        val (pat, rep) = bpeMergeLits(bestA, bestB)
        vocab = vocab.map { case (s, f) => (s.replace(pat, rep), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Learn `numMerges` BPE merges (Sennrich et al., ACL'16 — the
    * byte-pair-encoding tokenizer-training loop) over the whitespace words
    * of lowercased `textCol`.
    *
    * Scale design: the corpus collapses ONCE to the distinct-word frame
    * `(word, freq)` — vocabulary-sized, like [[unigramTrain]]'s exchange —
    * and every merge iteration runs on that small frame: one adjacent-pair
    * aggregate (map-side combined, pair-vocabulary-sized) whose argmax row
    * is the only thing the driver sees per round (the aggregate-to-driver
    * scalar convention of BM25/unigram stats). The merge applies as one
    * literal `replace` over the delimited-token string; per-iteration
    * `localCheckpoint` keeps plan analysis linear in rounds (the
    * [[Components.connectedComponents]] precedent). Ties break
    * deterministically: count desc, then (a, b) ascending.
    *
    * Stops early when no adjacent pair remains. `numMerges <= 64` — this
    * is tokenizer TRAINING, whose merge count is a config constant;
    * real-vocab encoders belong in [[bpeEncode]] whose cost is per-row.
    */
  def bpeTrain(corpus: DataFrame, textCol: String, numMerges: Int): Seq[BpeMerge] = {
    require(numMerges >= 1 && numMerges <= 64,
      "numMerges beyond 64: train offline and pass the merge list to bpeEncode")
    val vocab0 = corpus
      .select(explode_outer(Text.words(lower(col(textCol)))).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(bpeDelimited(col("w")).as("s"), col("freq"))
    // Small-vocabulary dispatch (r18): the iteration loop is K sequential
    // Spark jobs over a vocabulary-sized frame — pure fixed job cost when
    // the vocabulary fits the driver comfortably. One bounded collect
    // decides: at or under the cap the SAME algorithm runs in memory
    // (BpeTrainSpec pins the merge lists identical — same pair counting,
    // same count-desc/(a,b)-byte-order tie, same left-to-right replace);
    // over the cap (real tokenizer training over a 100 TB corpus's
    // vocabulary) the distributed loop below is unchanged.
    val cap = corpus.sparkSession.conf
      .getOption("graft.bpe.driverTrainMaxVocab").map(_.toInt).getOrElse(200000)
    val head = vocab0.limit(cap + 1).collect()
    if (head.length <= cap)
      return bpeTrainDriver(
        head.map(r => (r.getString(0), r.getLong(1))), numMerges)
    var vocab = vocab0.localCheckpoint(eager = false)
    val merges = Seq.newBuilder[BpeMerge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val toks = filter(split(col("s"), BpeSep), t => t =!= "")
      val best = vocab
        .select(col("freq"), toks.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("freq"), explode(
          zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
            slice(col("t"), lit(2), size(col("t")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += BpeMerge(rank, a, b, n)
        val (pat, rep) = bpeMergeLits(a, b)
        vocab = vocab.select(
            call_function("replace", col("s"), lit(pat), lit(rep)).as("s"),
            col("freq"))
          .localCheckpoint(eager = false)
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode each document with a learned merge list: every whitespace word
    * of the lowercased text gets the merges applied IN RANK ORDER
    * (Sennrich's sequential apply_bpe semantics), then the document's
    * token stream is the concatenation over its words.
    *
    * Pure per-row scan work with NO cap on the merge count: the whole
    * rank-ordered table rides in one native
    * [[graft.functions.BpeEncodeExpr]] as a single plan reference object
    * (the tokenizer model ships with the serialized plan once, like a
    * broadcast dict), so the expression tree and generated code stay O(1)
    * in table size — production vocabularies of tens of thousands of
    * merges plan identically to the 20-merge demos. No shuffle, no state.
    * `BpeExprSpec` property-checks the native pass against the literal
    * delimited-`replace` chain the DuckDB oracle replays.
    */
  def bpeEncode(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val ordered = merges.sortBy(_.rank).map(m => (m.a, m.b))
    docs.select(col(idCol),
        graft.functions.BpeEncodeExpr(lower(col(textCol)), ordered).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }
}
