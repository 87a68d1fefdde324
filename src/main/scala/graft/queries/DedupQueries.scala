package graft

import graft.config._
import graft.functions.Text
import graft.ops.{Ann, Dedup, Multimodal}
import graft.run.{CollectingTracker, Runner}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Deduplication family: exact, bloom-incremental, n-gram/char Jaccard, MinHash-LSH, SimHash, connected components, line/span dedup, winnowing, fuzzy edit-distance join.
  *
  * Split from EngineQueries (round 9) for per-family review; entries are
  * verbatim and the combined key set is unchanged.
  */
private[graft] object DedupQueries {
  import QueryHelpers._

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // Exact dedup by key columns over documents (hash-shuffle groupBy; the
    // generic operator behind it is Dedup.exactGroups).
    "q31_dedup_docs" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), Seq("lang", "source"), "doc_id")
        .orderBy(col("lang"), col("source"))
    }),


    // Exact n-gram Jaccard near-dup pairs via inverted-index join (never
    // all-pairs), through the library operator: persisted inverted index
    // (both self-join sides share one shingling pass) and the default
    // corpus-derived stop-shingle cap (a no-op at oracle scale — the cap
    // floor of 1000 exceeds the sf0.01 doc count). j >= 0.5 in double is
    // exact here: c/u >= 0.5 ⟺ 2c >= u for integers (u = 2c gives exactly
    // representable 0.5), matching the oracle's integer HAVING.
    "q32_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("text_lc"))
      Dedup.ngramJaccardPairs(docs, "doc_id", "text_lc",
          n = 3, threshold = 0.5, withCounts = true)
        .select(col("id_a"), col("id_b"), col("common"), col("union_size"))
        .orderBy(col("id_a"), col("id_b"))
    }),


    // MinHash + banded LSH near-dup. 16 bands × 2 rows puts the S-curve
    // candidate probability at ≈ 0.99 for a pair at j = 0.5 (and ≥ 1-1e-4
    // at j ≥ 0.7), and the exact-verify step re-scores candidates with true
    // Jaccard — at oracle scale the output equals the exact inverted-index
    // pair set and is hash-checked against it (deterministic seeded hashes,
    // verified at sf0.01; recall on harder corpora is asserted in OpsSpec).
    "q33_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 32, bands = 16, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),


    // SimHash near-dup pairs over the portable md5-derived word hash.
    // Pigeonhole blocking is COMPLETE for hamming ≤ maxDistance, so the
    // output is exactly "all pairs at distance ≤ 3" — and with the portable
    // hash DuckDB recomputes the fingerprints bit-for-bit (hash-checked,
    // was rows-only).
    "q34_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxDistance = 3, portableHash = true)
        .orderBy(col("id_a"), col("id_b"))
    }),


    // Incremental exact dedup — the ingest-time shape: new docs (id ≥ 250)
    // anti-joined against the existing corpus's content digests. All texts
    // in the corpus are distinct, so this checks the everything-passes
    // identity path; q75 (which plants real duplicates) checks the drop
    // path of the same contract.
    "q60_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.exactNewOnly(
          docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250), "text")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),


    // Incremental near-dup: fresh docs vs the existing corpus via the
    // cross-corpus inverted-index join (exact jaccard, hash-checked).
    "q61_cross_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("text_lc"))
      Dedup.ngramJaccardAgainst(
          docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250),
          "doc_id", "text_lc", n = 3, threshold = 0.5)
        .orderBy(col("id_in"), col("id_corpus"))
    }),


    // Character n-gram Jaccard near-dup — the tokenization-free dedup path
    // (CJK/code/URLs); same inverted-index machinery as q32, exact oracle.
    // Stride 4 (winnowing-style): ~L/4 shingles per doc instead of ~L keeps
    // the posting list tractable at any corpus size.
    "q63_char_jaccard" -> ((s, dir) => {
      Dedup.charJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 8, threshold = 0.5, stride = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),


    // Near-dup GROUP resolution: jaccard pairs (as in q32) contracted to
    // connected components via alternating large-star/small-star — every
    // document labeled with the min doc_id of its transitive near-dup
    // cluster (itself when isolated). The full pairs→groups dedup pipeline
    // in one query, exact-oracle-checked against a recursive-CTE closure.
    "q66_dedup_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("text_lc"))
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text_lc",
        n = 3, threshold = 0.5)
      ops.Components.labelNodes(
          docs.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b")
        .select(col("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    }),


    // Line-level dedup (CCNet-style): the corpus has no newlines, so both
    // engines insert one every 5 words with the same regex, then drop lines
    // shared by more than 3 documents and reassemble. Rebuilt text, line
    // counts and kept counts are all exact.
    "q74_line_dedup" -> ((s, dir) => {
      val withLines = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "((\\S+\\s+){4}\\S+)\\s+", "$1\n").as("text"))
      ops.Lines.dropCommonLines(withLines, "doc_id", "text", maxDocFreq = 3)
        .select(col("doc_id"), col("text"),
          col("n_lines").cast("bigint").as("n_lines"), col("n_kept"))
        .orderBy(col("doc_id"))
    }),


    // Bloom-prefiltered incremental dedup: same exact semantics as q60's
    // anti-join (the oracle is the plain NOT IN), but rows the broadcast
    // Bloom filter proves new never reach the shuffle — the steady-state
    // ingest path where almost everything is new. The corpus has no exact
    // duplicate texts at any sf, so a fifth of the corpus is re-keyed into
    // the incoming side — those rows MUST be dropped, giving the check
    // non-trivial ground truth on both the keep and drop paths.
    "q75_bloom_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val corpus = docs.filter(col("doc_id") < 250)
      val incoming = docs.filter(col("doc_id") >= 250)
        .unionAll(corpus.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.exactNewOnlyBloom(incoming, corpus, "text", expectedItems = 100000L)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),


    // Winnowing fingerprints (MOSS): the native one-pass expression
    // (digest-byte window minima; the composed HOF form was 12.7s at
    // sf0.1, this is scan work). Output stays compact as a per-doc digest
    // over the sorted fingerprint set + the count.
    "q92_winnow" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.WinnowFingerprints(lower(col("text")), 8, 4).as("fp"))
        .select(col("doc_id"),
          size(col("fp")).cast("long").as("n_fp"),
          md5(array_join(array_sort(col("fp")), ",")).as("fp_digest"))
        .orderBy(col("doc_id"))
    }),


    // Exact duplicated-substring spans (Lee et al. 2022 sub-document
    // dedup): maximal character regions assembled from 20-char windows
    // recurring corpus-wide. Bounded-key hash aggregate + equi-join +
    // per-doc run merge; oracle re-derives the identical window hashes,
    // duplicate set and span merge in SQL.
    "q97_dup_spans" -> ((s, dir) => {
      ops.Spans.dupSpans(t(s, dir, "documents"), "doc_id", "text", n = 20)
        .orderBy(col("doc_id"), col("span_start"))
    }),


    // Sub-document dedup end-to-end: keep-first duplicated spans cut from
    // every non-canonical location (the Lee et al. "keep one copy"
    // semantic). Runs over the lowercased text so span positions and the
    // cut text share one coordinate system; oracle re-derives the
    // canonical pick (struct min — both engines order (id, pos)
    // lexicographically), the span merge, and a per-character rebuild.
    "q98_dedup_spans_removed" -> ((s, dir) => {
      val docsLc = t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("text"))
      val spans = ops.Spans.dupSpans(docsLc, "doc_id", "text", n = 20,
        keepFirst = true)
      ops.Spans.removeSpans(docsLc, "doc_id", "text", spans)
        .select(col("doc_id"), md5(col("text")).as("clean_digest"),
          col("n_removed"))
        .orderBy(col("doc_id"))
    }),


    // Fuzzy key matching: Levenshtein ≤ 1 pairs over part names via
    // Ed-Join q-gram prefix filtering (candidates only from each side's
    // rarest maxDist·q+1 grams — never a plain gram join, which TPC-H's
    // dense 92-word name vocabulary would blow up). The oracle is the
    // definitionally-exact quadratic form with the same length prefilter;
    // the prefix filter must lose nothing.
    "q117_editdist_join" -> ((s, dir) => {
      val parts = t(s, dir, "part").filter(col("p_partkey") % 8 === 0)
      ops.Dedup.editDistancePairs(parts, "p_partkey", "p_name", maxDist = 1)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q31_dedup_docs" ->
      """SELECT lang, source, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY lang, source HAVING count(*) >= 2
         ORDER BY lang, source""",

    "q32_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 1, 1)),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2])) AS grams
           FROM documents),
         inv AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS g FROM sh WHERE len(grams) > 0)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common,
                a.n + b.n - count(*) AS union_size
         FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id, a.n, b.n
         HAVING count(*) * 2 >= a.n + b.n - count(*)
         ORDER BY id_a, id_b""",

    // exact ground truth: at (32 bands × 2 rows) + exact-verify, the LSH
    // output provably-with-near-certainty equals the exact j >= 0.5 pair set
    // on this corpus (deterministic seeded hashes; verified at sf0.01)
    "q33_minhash_lsh" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
           FROM w),
         inv AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS g FROM sh WHERE len(grams) > 0)
         SELECT id_a, id_b, round(CAST(common AS DOUBLE) / u, 6) AS jaccard FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common,
                  a.n + b.n - count(*) AS u
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING count(*) * 2 >= a.n + b.n - count(*)) t
         ORDER BY id_a, id_b""",

    // full portable-SimHash recompute: md5-nibble bit decode, ±1 votes,
    // sign bits, hamming — the all-pairs form is fine at oracle scale
    "q34_simhash" ->
      """WITH w AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS word
           FROM documents),
         h AS (SELECT doc_id, substr(md5(word), 1, 16) AS hx FROM w),
         bits AS (
           SELECT doc_id, j,
             CASE WHEN (((strpos('0123456789abcdef', substr(hx, (j // 4) + 1, 1)) - 1)
                         >> (3 - (j % 4))) & 1) = 1 THEN 1 ELSE -1 END AS vote
           FROM h, range(0, 64) r(j)),
         sums AS (SELECT doc_id, j, sum(vote) AS s FROM bits GROUP BY doc_id, j),
         fp AS (
           SELECT doc_id,
             bit_or(CASE WHEN s > 0 THEN
                 (CASE WHEN j = 63 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                       ELSE (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) END)
               ELSE CAST(0 AS BIGINT) END) AS f
           FROM sums GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS distance
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.f, b.f)) <= 3
         ORDER BY id_a, id_b""",

    "q60_incremental_dedup" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE doc_id >= 250
           AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id < 250)
         ORDER BY doc_id""",

    "q61_cross_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
           FROM w),
         inv AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS g FROM sh WHERE len(grams) > 0)
         SELECT id_in, id_corpus, round(CAST(common AS DOUBLE) / u, 6) AS jaccard FROM (
           SELECT a.doc_id AS id_in, b.doc_id AS id_corpus, count(*) AS common,
                  a.n + b.n - count(*) AS u
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id >= 250 AND b.doc_id < 250
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING count(*) * 2 >= a.n + b.n - count(*)) t
         ORDER BY id_in, id_corpus""",

    // models the library's CapSpec.Auto stop-shingle cut exactly: shingles
    // in more than max(1000, ndocs/1000) docs are dropped and sizes are
    // recomputed over the surviving universe. A no-op at sf0.01 (df ≤ 500),
    // ACTIVE at sf0.1 — the sf0.1 cross-check caught the uncapped oracle
    "q63_char_jaccard" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, length(lower(text)) - 6, 4),
               i -> substr(lower(text), i, 8))) AS grams
           FROM documents WHERE length(lower(text)) >= 8),
         inv0 AS (SELECT doc_id, unnest(grams) AS g FROM sh),
         dfreq AS (SELECT g, count(*) AS df FROM inv0 GROUP BY g),
         inv AS (SELECT i.doc_id, i.g FROM inv0 i JOIN dfreq d ON i.g = d.g
                 WHERE d.df <= (SELECT greatest(1000, count(*) // 1000) FROM documents)),
         sz AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY doc_id)
         SELECT id_a, id_b, round(CAST(common AS DOUBLE) / u, 6) AS jaccard FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common,
                  sa.n + sb.n - count(*) AS u
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           JOIN sz sa ON sa.doc_id = a.doc_id
           JOIN sz sb ON sb.doc_id = b.doc_id
           GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
           HAVING count(*) * 2 >= sa.n + sb.n - count(*)) t
         ORDER BY id_a, id_b""",

    // transitive closure of the q32 pair set (threshold via the HAVING) as
    // a recursive CTE — exponentially slower than star contraction but
    // exact at oracle scale, and engine-independent
    "q66_dedup_components" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 1, 1)),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2])) AS grams
           FROM documents),
         inv AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS g FROM sh WHERE len(grams) > 0),
         pairs AS (
           SELECT a.doc_id AS u, b.doc_id AS v
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING count(*) * 2 >= a.n + b.n - count(*)),
         sym AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
         reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.node)
         SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component
         FROM reach GROUP BY node ORDER BY doc_id""",

    "q74_line_dedup" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_replace(text, '((\S+\s+){4}\S+)\s+', '\1' || chr(10), 'g') AS txt
           FROM documents),
         l AS (
           SELECT doc_id,
             unnest(string_split(txt, chr(10))) AS line,
             unnest(range(1, len(string_split(txt, chr(10))) + 1)) AS pos
           FROM t),
         f AS (SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line),
         k AS (SELECT l.doc_id, l.pos, l.line FROM l JOIN f ON l.line = f.line WHERE f.df <= 3),
         r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                      count(*) AS n_kept
               FROM k GROUP BY doc_id),
         n AS (SELECT doc_id, len(string_split(txt, chr(10))) AS n_lines FROM t)
         SELECT n.doc_id, coalesce(r.text, '') AS text,
                CAST(n.n_lines AS BIGINT) AS n_lines,
                CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
         FROM n LEFT JOIN r ON n.doc_id = r.doc_id ORDER BY n.doc_id""",

    "q75_bloom_dedup" ->
      """WITH corpus AS (SELECT * FROM documents WHERE doc_id < 250),
         incoming AS (
           SELECT doc_id, text, lang, source FROM documents WHERE doc_id >= 250
           UNION ALL
           SELECT doc_id + 10000 AS doc_id, text, lang, source
           FROM corpus WHERE doc_id % 5 = 0)
         SELECT doc_id, lang, source FROM incoming
         WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)
         ORDER BY doc_id""",

    // null text propagates null (Spark's null-safe expression semantics),
    // never an empty fingerprint set
    "q97_dup_spans" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
         w AS (SELECT doc_id, t,
                 unnest(range(1, greatest(length(t) - 18, 1))) AS pos
               FROM d),
         p AS (SELECT doc_id, pos,
                 substr(md5(substr(t, pos, 20)), 1, 16) AS h
               FROM w),
         c AS (SELECT h FROM p GROUP BY h HAVING count(*) >= 2),
         m AS (SELECT p.doc_id, p.pos FROM p JOIN c USING (h)),
         f AS (SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                        OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 20
                      THEN 1 ELSE 0 END AS ns
               FROM m),
         g AS (SELECT doc_id, pos,
                 sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS sid
               FROM f)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 19 AS span_end,
                count(*) AS n_windows
         FROM g GROUP BY doc_id, sid ORDER BY doc_id, span_start""",

    "q98_dedup_spans_removed" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
         w AS (SELECT doc_id, t,
                 unnest(range(1, greatest(length(t) - 18, 1))) AS pos
               FROM d),
         p AS (SELECT doc_id, pos,
                 substr(md5(substr(t, pos, 20)), 1, 16) AS h
               FROM w),
         c AS (SELECT h, min({'d': doc_id, 'p': pos}) AS fst
               FROM p GROUP BY h HAVING count(*) >= 2),
         m AS (SELECT p.doc_id, p.pos FROM p JOIN c USING (h)
               WHERE NOT (p.doc_id = c.fst.d AND p.pos = c.fst.p)),
         f AS (SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                        OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 20
                      THEN 1 ELSE 0 END AS ns
               FROM m),
         g AS (SELECT doc_id, pos,
                 sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS sid
               FROM f),
         spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 19 AS e
                   FROM g GROUP BY doc_id, sid),
         cov AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS pos
                 FROM spans),
         chars AS (SELECT doc_id, t,
                     unnest(range(1, length(t) + 1)) AS pos
                   FROM d),
         kept AS (SELECT ch.doc_id,
                    string_agg(CASE WHEN cv.pos IS NULL
                                    THEN substr(ch.t, CAST(ch.pos AS INTEGER), 1) END,
                               '' ORDER BY ch.pos) AS tc
                  FROM chars ch LEFT JOIN cov cv
                    ON ch.doc_id = cv.doc_id AND ch.pos = cv.pos
                  GROUP BY ch.doc_id)
         SELECT d.doc_id,
           md5(CASE WHEN k.doc_id IS NULL THEN d.t
                    ELSE coalesce(k.tc, '') END) AS clean_digest,
           length(d.t) - length(CASE WHEN k.doc_id IS NULL THEN d.t
                                     ELSE coalesce(k.tc, '') END) AS n_removed
         FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id
         ORDER BY d.doc_id""",

    "q92_winnow" ->
      """WITH h AS (
           SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  WHEN length(lower(text)) >= 8 THEN
               list_transform(range(1, length(lower(text)) - 6),
                 i -> md5(substr(lower(text), i, 8)))
             ELSE [] END AS hs
           FROM documents),
         f AS (
           SELECT doc_id,
             CASE WHEN hs IS NULL THEN NULL
                  WHEN len(hs) >= 4 THEN
               list_distinct(list_transform(range(1, len(hs) - 2),
                 j -> list_min(hs[j:j+3])))
             ELSE [] END AS fp
           FROM h)
         SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
           md5(array_to_string(list_sort(fp), ',')) AS fp_digest
         FROM f ORDER BY doc_id""",

    "q117_editdist_join" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         FROM part a JOIN part b
           ON a.p_partkey < b.p_partkey
          AND abs(length(a.p_name) - length(b.p_name)) <= 1
          AND levenshtein(a.p_name, b.p_name) <= 1
         WHERE a.p_partkey % 8 = 0 AND b.p_partkey % 8 = 0
         ORDER BY id_a, id_b"""
  )
}
