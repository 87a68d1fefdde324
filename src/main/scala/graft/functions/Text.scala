package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale document pipelines.
  *
  * Everything here is a pure `Column` expression built from Spark built-ins
  * (split / transform / aggregate / regexp_*), so it stays inside
  * whole-stage codegen and distributes trivially — no Scala UDFs, no
  * collect, no state. At 100 TB these are embarrassingly parallel map
  * operations over the document table.
  */
object Text {

  /** Whitespace word tokenization (empty-token free). */
  def words(c: Column): Column =
    filter(split(trim(c), "\\s+"), w => length(w) > 0)

  def tokenCount(c: Column): Column = size(words(c))

  /** BPE-ish subword-ish tokenization: letter runs, digit runs, and single
    * punctuation marks — the standard pre-tokenizer split (the real merge
    * table of a trained BPE is model-specific; this is the deterministic,
    * engine-side approximation used for token accounting).
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokens(c: Column): Column = regexp_extract_all(c, lit(bpeishPattern), lit(0))
  def bpeishCount(c: Column): Column = size(bpeishTokens(c))

  /** Word n-gram shingles: `["a b c", "b c d", ...]` (distinct). Documents
    * shorter than n words yield an empty array (sequence() would otherwise
    * run backwards on a negative upper bound).
    */
  def wordShingles(c: Column, n: Int): Column = shinglesOf(words(c), n)

  /** Shingles over an already-computed word-array column. Prefer projecting
    * the words into their own column first (`.withColumn("w", Text.words(c))`)
    * and shingling that attribute: higher-order-function lambdas are
    * interpreted, so an embedded words-expression would be re-evaluated per
    * sequence element — O(words²) per row — while an attribute reference is
    * computed once (and CollapseProject keeps multi-referenced non-cheap
    * projections staged).
    */
  def shinglesOf(w: Column, n: Int): Column =
    when(size(w) >= n,
      array_distinct(
        transform(sequence(lit(0), size(w) - n), i => concat_ws(" ", slice(w, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Character n-gram shingles over the lowercased text (distinct).
    *
    * `stride` keeps only every stride-th window position (1 = all) — the
    * winnowing-style downsampling that keeps char-shingle posting lists
    * tractable: a document of L chars has ~L/stride shingles instead of ~L,
    * and Jaccard over the strided universe remains a well-defined exact
    * similarity both engines can mirror.
    */
  def charShingles(c: Column, n: Int, stride: Int = 1): Column = {
    require(stride >= 1, "stride must be >= 1")
    val t = lower(c)
    when(length(t) >= n,
      array_distinct(
        transform(sequence(lit(1), length(t) - (n - 1), lit(stride)),
          i => substring(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(c: Column): Column = {
    val total = greatest(length(c), lit(1))
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") / total
  }

  /** Ratio of uppercase letters to letters. */
  def upperRatio(c: Column): Column = {
    val letters = greatest(size(regexp_extract_all(c, lit("[A-Za-z]"), lit(0))), lit(1))
    size(regexp_extract_all(c, lit("[A-Z]"), lit(0))).cast("double") / letters
  }

  def meanWordLength(c: Column): Column = {
    val w = words(c)
    (length(c) - size(w) + 1).cast("double") / greatest(size(w), lit(1))
  }

  /** Small per-language stopword lists for n-gram-free language ID. Public
    * common words; enough signal for coarse routing (the real system would
    * swap in fastText-style models behind the same column contract).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "pour", "dans", "une", "que"),
    "es" -> Seq("el", "la", "los", "que", "de", "en", "es", "por", "con", "para"))

  /** Count of tokens that appear in `list` (case-insensitive). */
  def stopwordHits(c: Column, list: Seq[String]): Column = {
    val set = array(list.map(lit): _*)
    size(filter(words(lower(c)), w => array_contains(set, w)))
  }

  def stopwordRatio(c: Column, list: Seq[String]): Column =
    stopwordHits(c, list).cast("double") / greatest(tokenCount(c), lit(1))

  /** Heuristic language ID: the language whose stopword list scores the most
    * hits; ties and zero-hit documents resolve to "und" (undetermined).
    * Hit counts come from one native [[TextStats]] pass over the text
    * (hash-set membership) instead of an interpreted filter +
    * array_contains scan per language — same integers, same tie-break.
    */
  def langId(c: Column): Column = {
    val langs = stopwords.toSeq.sortBy(_._1)
    val st = TextStats(c, langs.map(_._2))
    val scored = langs.zipWithIndex.map { case ((lang, _), i) =>
      struct(st.getField("hits").getItem(i).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, known-language stopword density. Deterministic and cheap;
    * the weights are heuristic by design.
    *
    * All three counts come from one native [[TextStats]] pass; each term
    * keeps the exact arithmetic shape of its compositional definition
    * (tokenCount / punctRatio / stopwordRatio), so scores are bit-identical
    * to the pre-native form — q59's oracle mirrors the terms in SQL.
    */
  def qualityScore(c: Column): Column = {
    val st = TextStats(c, Seq(stopwords.values.flatten.toSeq))
    val nWords = st.getField("n_words")
    val lenScore = least(nWords.cast("double") / 20.0, lit(1.0))
    val pRatio = st.getField("n_punct").cast("double") /
      greatest(st.getField("n_chars"), lit(1))
    val punctScore = lit(1.0) - least(pRatio * 4.0, lit(1.0))
    val sRatio = st.getField("hits").getItem(0).cast("double") / greatest(nWords, lit(1))
    val stopScore = least(sRatio * 5.0, lit(1.0))
    // engine-portable half-up rounding (floor(x·10⁴ + 0.5)/10⁴, the q70
    // pattern): round() implementations disagree exactly at half
    // boundaries (BigDecimal-exact vs multiply-round-divide), and the
    // score's rational terms DO land on them — caught by the sf0.1
    // cross-check; the floor form is bit-identical in any engine
    floor((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3) * 10000 + 0.5) / 10000
  }

  /** Unicode script mix: per-script character counts plus the dominant
    * script — the multilingual-corpus router (mixed-script documents are a
    * spam/boilerplate signal; CJK routes to the char-shingle dedup path).
    * Ranges via `\x{...}` classes, shared by Java regex and RE2 so the
    * oracle applies byte-identical patterns. Dominant-script ties break to
    * the lexicographically larger name (the [[langId]] struct-greatest
    * pattern); all-zero counts yield "none".
    */
  def scriptMix(c: Column): Column = {
    val counts = Seq(
      "latin" -> "[A-Za-z]",
      "digit" -> "[0-9]",
      "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
      "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
      "arabic" -> "[\\x{0600}-\\x{06FF}]").map { case (name, re) =>
      name -> size(regexp_extract_all(c, lit(re), lit(0)))
    }
    val best = greatest(counts.map { case (name, n) =>
      struct(n.as("n"), lit(name).as("s"))
    }: _*)
    struct(
      (counts.map { case (name, n) => n.cast("long").as(s"n_$name") } :+
        when(best.getField("n") > 0, best.getField("s")).otherwise(lit("none"))
          .as("main_script")): _*)
  }

  /** Positional (non-distinct, in-order) character n-gram md5s of the
    * lowercased text — the input sequence for [[winnowMinima]]. Bind this
    * into its OWN column before winnowing: as an attribute it computes
    * once per row, while embedding it inside the winnow lambda would
    * re-derive the whole O(L) hash array per window position (O(L²)).
    */
  def positionalShingleHashes(c: Column, n: Int): Column = {
    require(n >= 2, "need n >= 2")
    val t = lower(c)
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)), i => md5(substring(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS local document-fingerprinting algorithm, public
    * method): the distinct minimum hash of each window of `w` consecutive
    * positions of a [[positionalShingleHashes]] column. Guarantees a
    * fingerprint in every w-position gap (any match of length
    * ≥ n + w − 1 chars is detected) while keeping ~2/(w+1) of positions —
    * the density/recall dial the min-md5 [[fingerprint]] (a 1-value
    * MinHash) doesn't have. Empty when fewer than w positions exist.
    * Pure per-row expression work: O(w) per window over the attribute.
    */
  def winnowMinima(hashes: Column, w: Int): Column = {
    require(w >= 1, "need w >= 1")
    when(size(hashes) >= w,
      array_distinct(transform(sequence(lit(1), size(hashes) - (w - 1)),
        j => array_min(slice(hashes, j, lit(w))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Document fingerprint: the minimum md5 over word 3-gram shingles — a
    * 1-value MinHash, stable under shingle reordering, usable as a cheap
    * near-dup blocking key. md5 keeps it portable across engines.
    */
  def fingerprint(c: Column, n: Int = 3): Column =
    array_min(transform(wordShingles(c, n), s => md5(s)))

  /** PII detection/redaction patterns. Kept to constructs shared by Java
    * regex and RE2 (character classes, bounded repetition, `\b`) so the
    * DuckDB oracle can apply the byte-identical pattern. The usual caveat
    * applies: regex PII scrubbing is a coarse first pass, not a guarantee —
    * the patterns are deliberately high-precision (they under-match rather
    * than mangle prose).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Count of PII matches per class as a struct `(n_email, n_ipv4,
    * n_phone)`. One regexp_extract_all per class — three codegen'd scans of
    * the string, no UDF.
    */
  def piiCounts(c: Column): Column = struct(
    size(regexp_extract_all(c, lit(emailPattern), lit(0))).as("n_email"),
    size(regexp_extract_all(c, lit(ipv4Pattern), lit(0))).as("n_ipv4"),
    size(regexp_extract_all(c, lit(phonePattern), lit(0))).as("n_phone"))

  /** Replace each PII class with a typed placeholder. Emails are redacted
    * first: an address like `user@10.0.0.1.net` must not leave an IPv4
    * fragment behind for the later passes; the IP and phone patterns cannot
    * match inside the inserted placeholders (no digits), so the chain is
    * order-safe after that.
    */
  def piiRedact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(emailPattern), lit("<EMAIL>")),
        lit(ipv4Pattern), lit("<IP>")),
      lit(phonePattern), lit("<PHONE>"))

  /** Canonical text-cleaning pass for ingest, applied BEFORE any content
    * hashing / shingling / fingerprinting: Unicode NFC (composed and
    * decomposed spellings of the same string must dedup together — the
    * native [[NfcNormalize]] expression), then collapse every whitespace
    * run to one space and trim. Pure per-row scan work.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(NfcNormalize(c), "\\s+", " "))

  /** Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446,
    * appendix A1.1 — public method). Returns one struct of the rule metrics
    * plus the combined `pass` flag:
    *
    *   - `word_count` in [50, 100000]
    *   - `mean_word_len` in [3, 10]
    *   - `sym_ratio` (hash / ellipsis symbols per word) ≤ 0.1
    *   - `frac_bullet` (lines starting with a bullet) ≤ 0.9
    *   - `frac_ellipsis` (lines ending in an ellipsis) ≤ 0.3
    *   - `frac_alpha` (words containing a letter) ≥ 0.8
    *   - `n_stop` (distinct hits in Gopher's 8-word stop list) ≥ 2
    *
    * Pure per-row expression work (split / filter / regexp), no shuffle —
    * embarrassingly parallel at any corpus size. Every term is arithmetic
    * on exact integer counts, so an external engine reproduces the doubles
    * bit-for-bit.
    */
  def gopherFlags(c: Column): Column = {
    val w = words(c)
    val nw = size(w)
    val nwSafe = greatest(nw, lit(1))
    val meanLen = aggregate(w, lit(0), (acc, x) => acc + length(x)).cast("double") / nwSafe
    val symRatio = size(regexp_extract_all(c, lit("#|\\.\\.\\.|…"), lit(0))).cast("double") / nwSafe
    val lines = split(c, "\n")
    val nLines = greatest(size(lines), lit(1))
    val fracBullet = size(filter(lines, l => l.rlike("^\\s*[-•*]"))).cast("double") / nLines
    val fracEllipsis = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / nLines
    val fracAlpha = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") / nwSafe
    val gopherStops = array(
      Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)
    val nStop = size(array_intersect(transform(w, x => lower(x)), gopherStops))
    struct(
      nw.cast("long").as("word_count"),
      meanLen.as("mean_word_len"),
      symRatio.as("sym_ratio"),
      fracBullet.as("frac_bullet"),
      fracEllipsis.as("frac_ellipsis"),
      fracAlpha.as("frac_alpha"),
      nStop.cast("long").as("n_stop"),
      (nw.between(50, 100000) && meanLen.between(3.0, 10.0) &&
        symRatio <= 0.1 && fracBullet <= 0.9 && fracEllipsis <= 0.3 &&
        fracAlpha >= 0.8 && nStop >= 2).as("pass"))
  }

  /** Fraction of the document's word n-grams that are repeats of an earlier
    * n-gram: `1 − distinct/total` (0 for docs shorter than n words) — the
    * Gopher/RefinedWeb-style intra-document repetition signal; docs above
    * ~0.2-0.3 are templated boilerplate or crawler loops. Distinct count
    * rides the native [[WordShingles]] pass; total is arithmetic on the
    * word count — pure per-row scan work at any corpus size.
    */
  def dupNgramRatio(c: Column, n: Int = 3): Column = {
    val total = greatest(tokenCount(c) - lit(n - 1), lit(0))
    val distinctN = size(WordShingles(c, n))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) - distinctN.cast("double") / total)
  }
}
