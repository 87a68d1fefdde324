package graft

import graft.config._
import graft.functions.Text
import graft.ops.{Ann, Dedup, Multimodal}
import graft.run.{CollectingTracker, Runner}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Text analysis and quality: language id, stats, fingerprints, quality/Gopher/C4/PII filters, script mix, blocklist, multimodal decode.
  *
  * Split from EngineQueries (round 9) for per-family review; entries are
  * verbatim and the combined key set is unchanged.
  */
private[graft] object TextQueries {
  import QueryHelpers._

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // Array explode + top-k word counts over the document corpus.
    // (explode_outer: a plain explode's inferred generate filter re-runs
    // the tokenization split at the scan — see Dedup.minePairs)
    "q24_word_topk" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode_outer(docWords(col("text"))).as("word"))
        .filter(length(col("word")) > 2)
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(25)
    }),


    // ---------------------------------------------------- LLM pipeline ops

    // Text statistics: token counts (whitespace + BPE-ish regex), punctuation
    // counts, exact char sums — pure map + one hash aggregate; all regexes
    // shared verbatim with the oracle.
    "q29_text_stats" -> ((s, dir) => {
      t(s, dir, "documents").groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))).as("n_tokens"),
        sum(size(regexp_extract_all(col("text"), lit(Text.bpeishPattern), lit(0)))).as("n_bpeish"),
        sum(size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0)))).as("n_punct"),
        sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),


    // Stopword-list language ID with an explicit deterministic tie-break
    // chain (en > de > es > fr on equal hits; no hits ⇒ 'und').
    "q30_langid" -> ((s, dir) => {
      def hits(c: Column, ws: Seq[String]): Column =
        size(filter(docWords(c), w => w.isInCollection(ws)))
      val d = t(s, dir, "documents")
        .withColumn("h_en", hits(col("text"), Text.stopwords("en")))
        .withColumn("h_de", hits(col("text"), Text.stopwords("de")))
        .withColumn("h_es", hits(col("text"), Text.stopwords("es")))
        .withColumn("h_fr", hits(col("text"), Text.stopwords("fr")))
        .withColumn("predicted",
          when(col("h_en") >= col("h_de") && col("h_en") >= col("h_es") &&
            col("h_en") >= col("h_fr") && col("h_en") > 0, "en")
            .when(col("h_de") >= col("h_es") && col("h_de") >= col("h_fr") &&
              col("h_de") > 0, "de")
            .when(col("h_es") >= col("h_fr") && col("h_es") > 0, "es")
            .when(col("h_fr") > 0, "fr")
            .otherwise("und"))
      d.groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),


    // Document fingerprint: min-md5 over word 3-gram shingles (1-row MinHash
    // blocking key; md5 keeps it engine-portable).
    "q37_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), graft.functions.WordShingles(lower(col("text")), 3).as("sh"))
        .select(col("doc_id"), array_min(transform(col("sh"), g => md5(g))).as("fp"))
        .orderBy(col("doc_id"))
    }),


    // Multimodal plumbing: opaque binary payload + typed metadata, byte
    // frame-sampling, stub feature extraction (portable columns only).
    "q38_multimodal" -> ((s, dir) => {
      Multimodal.featurize(
          t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
        .select(col("doc_id"), col("format"), col("n_bytes"), col("n_frames"),
          col("features").getField("content_hash").as("content_hash"))
        .orderBy(col("doc_id"))
    }),


    // VP8L (lossless WebP) pixel decode, gated: deterministic fixture
    // images (each pixel a closed-form function of (x, y, i)) are encoded
    // by the independent minimal encoder — mixing subtract-green and
    // row-repeat LZ77 variants — then decoded back through the PRODUCTION
    // decodeImageFeatures path; per-image dims + 4-dp mean luma must
    // hash-match the oracle, which computes the expected mean from the
    // same closed form over a generated pixel grid. A decoder bug
    // anywhere in the Huffman/LZ77/transform chain shifts the luma.
    // Dims stay ≤ 64 so the feature sampler's grid covers every pixel.
    "q130_webp_decode" -> ((s, dir) => {
      import s.implicits._
      val fixtures = (0 until 24).map { i =>
        val w = 8 + (i * 7) % 57
        val h = 8 + (i * 11) % 57
        val px = Array.tabulate(w * h) { j =>
          val x = j % w
          val yv = if (i % 3 == 0) (j / w) / 3 else j / w // repeated row blocks
          (0xff << 24) | (((x * 7 + yv * 13 + i) % 256) << 16) |
            (((x * 3 + yv * 5 + 2 * i) % 256) << 8) | ((x * 11 + yv + 3 * i) % 256)
        }
        (i.toLong, ops.Vp8lEncoder.encode(w, h, px,
          subtractGreen = i % 2 == 1, rowRepeatRefs = i % 3 == 0))
      }
      val df = fixtures.toDF("img_id", "data").repartition(4)
      ops.Multimodal.decodeImageFeatures(df, "img_id", "data")
        .select(col("img_id"), col("ok"), col("width"), col("height"),
          round(col("mean_luma"), 4).as("mean_luma"))
        .orderBy(col("img_id"))
    }),

    // FLAC PCM decode, gated (r13 — the audio analogue of q130):
    // deterministic sawtooth PCM (each sample a closed-form function of
    // (t, channel, i)) is encoded by the independent fixture encoder —
    // rotating stereo decorrelation modes, subframe strategies, Rice
    // widths and partition depths across tracks — then decoded back
    // through the PRODUCTION decodeAudioFeatures path. The 4-dp RMS
    // covers every decoded sample: a bit error anywhere in the
    // predictor/Rice/stereo chain shifts it (and the in-stream PCM MD5
    // check inside the decoder would reject first).
    "q136_flac_decode" -> ((s, dir) => {
      import s.implicits._
      val fixtures = (0 until 12).map { i =>
        val n = 2048 + 256 * i
        val nCh = 1 + (i % 2)
        val rate = 8000 + 500 * i
        val chans = Array.tabulate(nCh)(c => Array.tabulate(n)(t =>
          ((t * (3 + i % 5) + c * 13 + i * 17) % 2048) - 1024 +
            (t % 7) * (1 - 2 * (c % 2))))
        val o = ops.FlacEncoder.Options(
          blockSize = 256 + 128 * (i % 3),
          stereo =
            if (nCh == 2)
              Seq(ops.FlacEncoder.LeftSide, ops.FlacEncoder.RightSide,
                ops.FlacEncoder.MidSide)((i / 2) % 3)
            else ops.FlacEncoder.Independent,
          strategy =
            if (i % 5 == 0) "verbatim" else if (i % 5 == 1) "lpc" else "fixed",
          rice2 = i % 4 == 0,
          maxPartitionOrder = i % 5)
        (i.toLong, ops.FlacEncoder.encode(chans, rate, 16, o))
      }
      val df = fixtures.toDF("track_id", "data").repartition(4)
      ops.Multimodal.decodeAudioFeatures(df, "track_id", "data")
        .select(col("track_id"), col("ok"), col("sample_rate"), col("channels"),
          col("n_frames"), col("duration_ms"), round(col("rms"), 4).as("rms"))
        .orderBy(col("track_id"))
    }),


    // Composite document quality score (length sweet-spot, punctuation,
    // stopword density) — the formula is pure arithmetic over counts, so
    // DuckDB reproduces it exactly.
    "q59_quality_score" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),


    // Intra-document repetition filter (Gopher/RefinedWeb-style): fraction
    // of repeated words / bigrams per doc, docs above 50% word repetition
    // dropped — templated boilerplate detection as pure per-row scan work.
    "q67_repetition_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // The ratios ride through a single-element explode_outer so the
      // filter references a generator output: predicate pushdown cannot
      // substitute through a Generate, so the tokenization+shingle pass
      // runs exactly once per row instead of re-deriving in the scan
      // filter (the generate-filter trap — see the PlanSpec sweep).
      docs.select(col("doc_id"),
          explode_outer(array(struct(
            Text.dupNgramRatio(col("text"), 1).as("word_rep_raw"),
            Text.dupNgramRatio(col("text"), 2).as("bigram_rep_raw")))).as("rep"))
        .filter(col("rep.word_rep_raw") <= 0.5)
        .select(col("doc_id"),
          round(col("rep.word_rep_raw"), 6).as("word_rep"),
          round(col("rep.bigram_rep_raw"), 6).as("bigram_rep"))
        .orderBy(col("doc_id"))
    }),


    // Benchmark-contamination scoring: fraction of each training doc's
    // word 3-grams present anywhere in the "benchmark" reference slice —
    // one corpus pass, reference set broadcast-small.
    "q72_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.ngramOverlapScore(
          docs.filter(col("doc_id") >= 250), "doc_id", "text",
          docs.filter(col("doc_id") < 100), "text", n = 3)
        .select(col("doc_id"), col("n_shingles"), col("n_matched"),
          round(col("overlap"), 6).as("overlap"))
        .orderBy(col("doc_id"))
    }),


    // PII redaction: the corpus has no natural PII, so both engines append
    // the same deterministic synthetic email/IP/phone per doc before
    // counting and redacting — the check has real ground truth (the
    // round-2 "zero-power check" lesson), and the redacted strings are
    // exact text the hash compare verifies byte-for-byte.
    "q73_pii_redact" -> ((s, dir) => {
      val salted = t(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com from 10.0."),
            pmod(col("doc_id"), lit(256)), lit(".7 call 555-"),
            lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-"),
            lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0")).as("txt"))
      salted.select(col("doc_id"),
          Text.piiCounts(col("txt")).as("pii"),
          Text.piiRedact(col("txt")).as("redacted"))
        .select(col("doc_id"),
          col("pii.n_email").cast("bigint").as("n_email"),
          col("pii.n_ipv4").cast("bigint").as("n_ipv4"),
          col("pii.n_phone").cast("bigint").as("n_phone"),
          col("redacted"))
        .orderBy(col("doc_id"))
    }),


    // Gopher quality rules (Rae et al. 2021 A1.1): the seven rule metrics
    // and the combined keep/drop decision per document — all exact integer
    // counts and their ratios, reproduced bit-for-bit by the oracle.
    "q82_gopher_rules" -> ((s, dir) => {
      val g = Text.gopherFlags(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), g.as("g"))
        .select(col("doc_id"),
          col("g.word_count").as("word_count"),
          round(col("g.mean_word_len"), 6).as("mean_word_len"),
          round(col("g.sym_ratio"), 6).as("sym_ratio"),
          round(col("g.frac_bullet"), 6).as("frac_bullet"),
          round(col("g.frac_ellipsis"), 6).as("frac_ellipsis"),
          round(col("g.frac_alpha"), 6).as("frac_alpha"),
          col("g.n_stop").as("n_stop"),
          col("g.pass").as("pass"))
        .orderBy(col("doc_id"))
    }),


    // Ingest text normalization: Unicode NFC (native expression) +
    // whitespace collapse + trim. The corpus is ASCII/single-spaced, so
    // both engines append the same decomposed-accent + messy-whitespace
    // salt per doc before normalizing (the round-2 "zero-power check"
    // lesson) — NFC composition and the collapse both have real ground
    // truth, and the normalized strings hash-compare byte-for-byte.
    "q83_normalize" -> ((s, dir) => {
      val salted = concat(col("text"),
        lit(" cafe\u0301  du\tmonde \u212B "), col("doc_id").cast("string"), lit("  "))
      t(s, dir, "documents")
        .select(col("doc_id"), Text.normalizeText(salted).as("norm_text"))
        .select(col("doc_id"), col("norm_text"),
          length(col("norm_text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),


    // C4-style page cleaning: line-level keep rules (terminal punctuation +
    // minimum words) and page-level drops (lorem ipsum, braces, too few
    // surviving lines). The corpus has no newlines or punctuation, so both
    // engines build the same deterministic messy page per doc (the salting
    // pattern of q73/q83): some lines pass, some fail each rule, and
    // doc_id-keyed cases exercise both page-drop predicates.
    "q88_c4_clean" -> ((s, dir) => {
      val salted = t(s, dir, "documents")
        .select(col("doc_id"), concat_ws("\n",
          concat(lit("First sentence line number "), col("doc_id"), lit(".")),
          lit("too short."),
          lit("this line has no terminal punctuation at all"),
          lit("Another proper sentence with enough words here!"),
          concat(col("text"), when(col("doc_id") % 11 === 0,
            lit(" lorem ipsum filler?")).otherwise(lit(" tail words making it long enough?"))),
          when(col("doc_id") % 7 === 0, lit("contains { brace"))
            .otherwise(lit("Clean closing line with plenty of words."))).as("page"))
      ops.Lines.c4Clean(salted, "doc_id", "page")
        .orderBy(col("doc_id"))
    }),


    // Unicode script-mix detection: per-script character counts + dominant
    // script. The corpus is ASCII, so both engines append the same CJK /
    // Cyrillic salt to doc_id-keyed slices (the q83 pattern) — every branch
    // of the router has ground truth, including the tie-break.
    "q91_script_mix" -> ((s, dir) => {
      // salt: doc_id%3==0 gains 12 CJK chars, doc_id%5==0 gains 20 Cyrillic
      val salted = concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" 漢字漢字漢字漢字漢字漢字")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" ддддддддддддддддддд" + "д")).otherwise(lit("")))
      val m = Text.scriptMix(salted)
      t(s, dir, "documents")
        .select(col("doc_id"), m.as("m"))
        .select(col("doc_id"), col("m.n_latin"), col("m.n_digit"),
          col("m.n_cyrillic"), col("m.n_cjk"), col("m.n_arabic"), col("m.main_script"))
        .orderBy(col("doc_id"))
    }),


    // Model-based quality classifier (fastText/GPT-3-style LR filter):
    // trained in Spark ML on hashed bag-of-words features with a weak
    // "looks English" label, scored as pure per-row expression work
    // (coefficients are plan literals, native dot product + sigmoid).
    // Oracle: captured coefficients, features + score re-derived in SQL.
    "q96_quality_classifier" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("_lc", lower(col("text")))
      // null lang must not reach fit(): Spark ML LR rejects null labels,
      // and a null-lang row is simply "not confidently English" → 0
      val labeled = docs.withColumn("label",
        coalesce((col("lang") === "en").cast("int"), lit(0)))
      val model = ops.Quality.train(labeled, "_lc", "label", nFeatures = 64)
      q96ModelCaptured = Some(model)
      ops.Quality.score(docs.filter(col("doc_id") < 200), "doc_id", "_lc", model)
        .select(col("doc_id"), round(col("quality_prob"), 6).as("quality_prob"))
        .orderBy(col("doc_id"))
    }),


    // Blocklist phrase filtering: one Aho–Corasick scan per document
    // (functions/MatchExprs) instead of one contains() pass per pattern —
    // the automaton rides to executors as a single reference object, so a
    // 10k-phrase blocklist stays a single corpus pass with no join. The
    // oracle replays the same pattern list with per-pattern contains() in
    // DuckDB (same result, the quadratic form this replaces).
    "q112_blocklist" -> ((s, dir) => {
      val phrases = QueryHelpers.blocklistPhrases
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.MultiContains(col("text"), phrases).as("m"))
        .filter(size(col("m")) > 0)
        // joined string, not array<string>: the oracle hash compare is
        // scalar-typed (no other gated query emits arrays)
        .select(col("doc_id"), array_join(col("m"), "|").as("matched"),
          size(col("m")).as("n_matched"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q24_word_topk" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word FROM documents) w
         WHERE length(word) > 2
         GROUP BY word ORDER BY n DESC, word LIMIT 25""",

    "q29_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens,
         CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpeish,
         CAST(sum(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))) AS BIGINT) AS n_punct,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    "q30_langid" ->
      """WITH scored AS (
           SELECT lang,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               w -> w IN ('the','and','of','to','in','is','that','for','with','was'))) AS h_en,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               w -> w IN ('der','die','und','das','ist','nicht','ein','mit','für','von'))) AS h_de,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               w -> w IN ('el','la','los','que','de','en','es','por','con','para'))) AS h_es,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               w -> w IN ('le','la','les','et','des','est','pour','dans','une','que'))) AS h_fr
           FROM documents)
         SELECT lang,
           CASE WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
                WHEN h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
                WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
                WHEN h_fr > 0 THEN 'fr'
                ELSE 'und' END AS predicted,
           count(*) AS n
         FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""",

    "q96_quality_classifier" -> q96ModelCaptured
      .map(m => qualityOracleSql(m, nDocs = 200))
      .getOrElse(
        """SELECT NULL AS doc_id, NULL AS quality_prob WHERE FALSE"""),

    "q37_fingerprint" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 1, 1)),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2])) AS grams
           FROM documents WHERE doc_id < 100)
         SELECT doc_id, list_min(list_transform(grams, g -> md5(g))) AS fp
         FROM sh ORDER BY doc_id""",

    // the same closed-form pixel grid the Spark side encoded, re-derived
    // over generate_series — dims and mean luma from first principles
    "q130_webp_decode" ->
      """WITH imgs AS (SELECT unnest(generate_series(0, 23)) AS i),
           dims AS (SELECT i, 8 + (i*7) % 57 AS w, 8 + (i*11) % 57 AS h FROM imgs),
           px AS (
             SELECT i, w, h, xs.x AS x, ys.y AS y,
               CASE WHEN i % 3 = 0 THEN y // 3 ELSE y END AS yv
             FROM dims, LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
                        LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys),
           lum AS (
             SELECT i, w, h,
               0.299 * ((x*7 + yv*13 + i) % 256) + 0.587 * ((x*3 + yv*5 + 2*i) % 256)
                 + 0.114 * ((x*11 + yv + 3*i) % 256) AS l
             FROM px)
         SELECT CAST(i AS BIGINT) AS img_id, TRUE AS ok, CAST(w AS INT) AS width,
                CAST(h AS INT) AS height, round(avg(l), 4) AS mean_luma
         FROM lum GROUP BY i, w, h ORDER BY img_id""",

    // the same closed-form PCM the Spark side encoded, re-derived over
    // generate_series — every decoded sample participates in the RMS
    "q136_flac_decode" ->
      """WITH tracks AS (SELECT unnest(generate_series(0, 11)) AS i),
           params AS (SELECT i, 2048 + 256*i AS n, 1 + (i % 2) AS nch,
                             8000 + 500*i AS rate FROM tracks),
           samples AS (
             SELECT i, n, nch, rate,
               ((ts.t * (3 + i % 5) + ch.c * 13 + i * 17) % 2048) - 1024
                 + (ts.t % 7) * (1 - 2 * (ch.c % 2)) AS s
             FROM params,
               LATERAL (SELECT unnest(generate_series(0, nch - 1)) AS c) ch,
               LATERAL (SELECT unnest(generate_series(0, n - 1)) AS t) ts),
           agg AS (
             SELECT i, n, nch, rate,
               sqrt(sum((CAST(s AS DOUBLE)/32768.0)*(CAST(s AS DOUBLE)/32768.0))
                 / (n * nch)) AS rms
             FROM samples GROUP BY i, n, nch, rate)
         SELECT CAST(i AS BIGINT) AS track_id, TRUE AS ok,
                CAST(rate AS DOUBLE) AS sample_rate, CAST(nch AS INT) AS channels,
                CAST(n AS BIGINT) AS n_frames,
                CAST(floor(n * 1000.0 / rate) AS BIGINT) AS duration_ms,
                round(rms, 4) AS rms
         FROM agg ORDER BY track_id""",

    "q38_multimodal" ->
      """SELECT doc_id, 'text/utf-8' AS format,
         octet_length(encode(text)) AS n_bytes,
         greatest(octet_length(encode(text)) - 256, 0) // 128 + 1 AS n_frames,
         md5(text) AS content_hash
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",

    // mirrors Text.qualityScore term by term (same op order for fp identity)
    "q59_quality_score" ->
      """WITH s AS (
           SELECT doc_id,
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
           SELECT doc_id,
             least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) AS len_score,
             1.0 - least((CAST(n_punct AS DOUBLE) / n_chars) * 4.0, 1.0) AS punct_score,
             least((CAST(n_stop AS DOUBLE) / greatest(n_tok, 1)) * 5.0, 1.0) AS stop_score
           FROM s)
         SELECT doc_id,
                floor((len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3)
                  * 10000 + 0.5) / 10000 AS quality
         FROM c ORDER BY doc_id""",

    "q67_repetition_filter" ->
      """WITH t AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS nw,
             len(list_distinct(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0))) AS d1,
             len(list_distinct(list_transform(range(1, greatest(len(string_split_regex(trim(text), '\s+')), 1)),
               i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                    string_split_regex(trim(text), '\s+')[i+1]))) AS d2
           FROM documents),
         r AS (
           SELECT doc_id,
             CASE WHEN nw <= 0 THEN 0.0
                  ELSE 1.0 - CAST(d1 AS DOUBLE) / nw END AS word_rep_raw,
             CASE WHEN nw - 1 <= 0 THEN 0.0
                  ELSE 1.0 - CAST(d2 AS DOUBLE) / (nw - 1) END AS bigram_rep_raw
           FROM t)
         SELECT doc_id, round(word_rep_raw, 6) AS word_rep,
                round(bigram_rep_raw, 6) AS bigram_rep
         FROM r WHERE word_rep_raw <= 0.5 ORDER BY doc_id""",

    "q72_contamination" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
               i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                    string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(text), '\s+')[i+2])) AS grams
           FROM documents),
         ref AS (SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id < 100),
         d AS (SELECT doc_id, grams FROM sh WHERE doc_id >= 250),
         inv AS (SELECT doc_id, unnest(grams) AS g FROM d),
         m AS (SELECT i.doc_id, count(*) AS n_matched
               FROM inv i JOIN ref r ON i.g = r.g GROUP BY i.doc_id)
         SELECT d.doc_id, CAST(len(d.grams) AS BIGINT) AS n_shingles,
                CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
                round(CAST(coalesce(m.n_matched, 0) AS DOUBLE) /
                      greatest(len(d.grams), 1), 6) AS overlap
         FROM d LEFT JOIN m ON d.doc_id = m.doc_id ORDER BY d.doc_id""",

    "q73_pii_redact" ->
      """WITH salted AS (
           SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com from 10.0.' ||
             (doc_id % 256) || '.7 call 555-' ||
             lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
             lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS txt
           FROM documents WHERE doc_id < 200)
         SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(txt, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(txt, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g') AS redacted
         FROM salted ORDER BY doc_id""",

    // salt armored with chr() codepoints (28450/23383 = 漢字, 1076 = д);
    // tie-break CASE order = struct-greatest name-desc (latin > digit >
    // cyrillic > cjk > arabic)
    "q91_script_mix" ->
      """WITH s AS (
           SELECT doc_id,
             text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' ' || repeat(chr(28450) || chr(23383), 6) ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' ' || repeat(chr(1076), 20) ELSE '' END AS t
           FROM documents),
         c AS (
           SELECT doc_id,
             len(regexp_extract_all(t, '[A-Za-z]')) AS n_latin,
             len(regexp_extract_all(t, '[0-9]')) AS n_digit,
             len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]')) AS n_cyrillic,
             len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]')) AS n_cjk,
             len(regexp_extract_all(t, '[\x{0600}-\x{06FF}]')) AS n_arabic
           FROM s)
         SELECT doc_id,
           CAST(n_latin AS BIGINT) AS n_latin, CAST(n_digit AS BIGINT) AS n_digit,
           CAST(n_cyrillic AS BIGINT) AS n_cyrillic, CAST(n_cjk AS BIGINT) AS n_cjk,
           CAST(n_arabic AS BIGINT) AS n_arabic,
           CASE WHEN coalesce(greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic), 0) = 0 THEN 'none'
                WHEN n_latin = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'latin'
                WHEN n_digit = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'digit'
                WHEN n_cyrillic = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'cyrillic'
                WHEN n_cjk = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'cjk'
                ELSE 'arabic' END AS main_script
         FROM c ORDER BY doc_id""",

    "q88_c4_clean" ->
      """WITH salted AS (
           SELECT doc_id,
             'First sentence line number ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) ||
             'too short.' || chr(10) ||
             'this line has no terminal punctuation at all' || chr(10) ||
             'Another proper sentence with enough words here!' || chr(10) ||
             text || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum filler?'
                          ELSE ' tail words making it long enough?' END || chr(10) ||
             CASE WHEN doc_id % 7 = 0 THEN 'contains { brace'
                  ELSE 'Clean closing line with plenty of words.' END AS page
           FROM documents),
         k AS (
           SELECT doc_id, page,
             list_filter(string_split(page, chr(10)),
               l -> regexp_matches(l, '[.!?"]\s*$')
                 AND len(list_filter(string_split_regex(trim(l), '\s+'),
                       x -> len(x) > 0)) >= 5) AS kept
           FROM salted)
         SELECT doc_id,
           array_to_string(kept, chr(10)) AS text_clean,
           CAST(len(kept) AS BIGINT) AS n_kept
         FROM k
         WHERE NOT contains(lower(page), 'lorem ipsum')
           AND NOT contains(page, '{')
           AND len(kept) >= 3
         ORDER BY doc_id""",

    // the salt is spelled with chr() codepoints so no tool in the chain can
    // silently re-normalize the SQL text: chr(769) = combining acute,
    // chr(8491) = angstrom sign (an NFC singleton that composes to U+00C5)
    "q83_normalize" ->
      """WITH salted_n AS (
           SELECT doc_id,
             text || ' cafe' || chr(769) || '  du' || chr(9) || 'monde ' || chr(8491)
               || ' ' || CAST(doc_id AS VARCHAR) || '  ' AS t
           FROM documents)
         SELECT doc_id,
           trim(regexp_replace(nfc_normalize(t), '\s+', ' ', 'g')) AS norm_text,
           CAST(length(trim(regexp_replace(nfc_normalize(t), '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
         FROM salted_n ORDER BY doc_id""",

    "q82_gopher_rules" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws,
             string_split(text, chr(10)) AS lines,
             len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym
           FROM documents),
         m AS (
           SELECT doc_id,
             len(ws) AS word_count,
             CAST(coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS DOUBLE)
               / greatest(len(ws), 1) AS mean_word_len,
             CAST(n_sym AS DOUBLE) / greatest(len(ws), 1) AS sym_ratio,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-•*]'))) AS DOUBLE)
               / greatest(len(lines), 1) AS frac_bullet,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
               / greatest(len(lines), 1) AS frac_ellipsis,
             CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
               / greatest(len(ws), 1) AS frac_alpha,
             len(list_distinct(list_intersect(list_transform(ws, x -> lower(x)),
               ['the','be','to','of','and','that','have','with']))) AS n_stop
           FROM w)
         SELECT doc_id,
           CAST(word_count AS BIGINT) AS word_count,
           round(mean_word_len, 6) AS mean_word_len,
           round(sym_ratio, 6) AS sym_ratio,
           round(frac_bullet, 6) AS frac_bullet,
           round(frac_ellipsis, 6) AS frac_ellipsis,
           round(frac_alpha, 6) AS frac_alpha,
           CAST(n_stop AS BIGINT) AS n_stop,
           (word_count BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
            AND sym_ratio <= 0.1 AND frac_bullet <= 0.9 AND frac_ellipsis <= 0.3
            AND frac_alpha >= 0.8 AND n_stop >= 2) AS pass
         FROM m ORDER BY doc_id""",

    "q112_blocklist" -> {
      val lits = blocklistPhrases.map(p => s"'${p.replace("'", "''")}'").mkString(", ")
      s"""SELECT doc_id,
            array_to_string(list_filter([$lits], p -> contains(text, p)), '|') AS matched,
            CAST(len(list_filter([$lits], p -> contains(text, p))) AS INT) AS n_matched
          FROM documents
          WHERE len(list_filter([$lits], p -> contains(text, p))) > 0
          ORDER BY doc_id"""
    }
  )
}
