package graft

import graft.config._
import graft.functions.Text
import graft.ops.{Ann, Dedup, Multimodal}
import graft.run.{CollectingTracker, Runner}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Sampling/splits/skew: deterministic samples, temperature mixing, heavy hitters, hash splits, shard assignment, salted skew join.
  *
  * Split from EngineQueries (round 9) for per-family review; entries are
  * verbatim and the combined key set is unchanged.
  */
private[graft] object SamplingQueries {
  import QueryHelpers._

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // Deterministic content-hash sampling: reproducible in any engine with
    // md5, stable under repartitioning, nested across fractions.
    "q64_deterministic_sample" -> ((s, dir) => {
      ops.Sampling.byContentHash(t(s, dir, "documents"), "text", 0.25)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),


    // Domain mixing: per-source deterministic content-hash sampling — 50%
    // of src0, 25% of src1, 10% of everything else, reproducible in any
    // engine with md5 and pushable to the scan as one predicate.
    "q68_domain_mix" -> ((s, dir) => {
      ops.Sampling.stratifiedByContentHash(t(s, dir, "documents"),
          "text", "source", Map("src0" -> 0.5, "src1" -> 0.25),
          defaultFraction = 0.1)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),


    // Heavy hitters via the SpaceSaving aggregate: per-language top-10
    // words from capacity-bounded summaries (map-side partials ship
    // ≤ capacity entries each — never the full vocabulary). Capacity 4096
    // far exceeds the corpus vocabulary, so the sketch is provably exact
    // (err = 0) and the oracle compares against true counts.
    "q84_heavy_hitters" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hh = graft.functions.HeavyHitters.topK(4096)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("word"))
      t(s, dir, "documents")
        .select(col("lang"), explode_outer(Text.words(col("text"))).as("word"))
        .filter(col("word").isNotNull)
        .groupBy(col("lang")).agg(hh(col("word")).as("summary"))
        .select(col("lang"), explode(col("summary")).as("h"))
        .select(col("lang"), col("h.term").as("word"),
          col("h.count").as("n"), col("h.err").as("err"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .orderBy(col("lang"), col("rank"))
    }),


    // Exactly-k-per-group deterministic sample (hash-ranked): 10 docs per
    // language, reproducible in any engine with md5 — the eval/inspection
    // primitive the fraction-based samplers can't provide.
    "q85_group_sample" -> ((s, dir) => {
      ops.Sampling.perGroupSample(t(s, dir, "documents"),
          Seq("lang"), keyCol = "text", idCol = "doc_id", k = 10)
        .select(col("doc_id"), col("lang"), col("sample_rank"))
        .orderBy(col("lang"), col("sample_rank"))
    }),


    // Temperature-scaled domain mixing (XLM-R/mT5 sampling rule): quotas
    // from the alpha-flattened language distribution, drawn as exact-k
    // deterministic hash samples. Oracle replays the captured quota table
    // and re-derives the rank and the cut in SQL.
    "q99_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      q99QuotasCaptured =
        Some(() => ops.Sampling.temperatureQuotas(docs, "lang", alpha = 0.5, budget = 300L))
      ops.Sampling.temperatureMix(docs, "doc_id", "text", "lang",
          alpha = 0.5, budget = 300L)
        .select(col("doc_id"), col("lang"), col("sample_rank"), col("mix_quota"))
        .orderBy(col("lang"), col("sample_rank"))
    }),


    // SpaceSaving in its APPROXIMATE regime (capacity 32 ≪ vocabulary) —
    // the regime where the r4 merge-floor bug lived, previously gated only
    // by property tests. Summary CONTENTS are stream/merge-order dependent
    // there, so the query emits order-invariant guarantees only (the q27
    // within-bound pattern): overcount-only (est ≥ true), error window
    // (est − err ≤ true), err ≤ N/capacity, and the frequent-item promise
    // (every word with true count > N/capacity present in the summary).
    // All four are theorems of the (fixed) merge, so the oracle states
    // them as literals beside the exact per-language word totals.
    "q101_heavy_hitters_approx" -> ((s, dir) => {
      val cap = 32
      val words = t(s, dir, "documents")
        .select(col("lang"), explode_outer(Text.words(col("text"))).as("word"))
        .filter(col("word").isNotNull)
      val sk = words.groupBy(col("lang"))
        .agg(graft.functions.HeavyHitters.topK(cap)(col("word")).as("summary"),
          count(lit(1)).as("n_words"))
        .select(col("lang"), col("n_words"), explode(col("summary")).as("h"))
        .select(col("lang"), col("n_words"), col("h.term").as("word"),
          col("h.count").as("est"), col("h.err").as("err"))
      val exact = words.groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("true_n"))
      // coalesce(…, FALSE): bool_and ignores NULLs, and a sketch term
      // missing from the exact counts must fail loudly, not slip through
      val bounds = sk.join(exact, Seq("lang", "word"), "left")
        .groupBy(col("lang")).agg(
          max(col("n_words")).as("n_words"),
          expr("bool_and(coalesce(est >= true_n, FALSE))").as("never_undercounts"),
          expr("bool_and(coalesce(est - err <= true_n, FALSE))").as("err_window_holds"),
          expr(s"bool_and(coalesce(err * $cap <= n_words, FALSE))").as("err_bounded"))
      val missed = exact
        .join(sk.select(col("lang"), col("word")), Seq("lang", "word"), "left_anti")
        .join(bounds.select(col("lang"), col("n_words").as("nw")), Seq("lang"))
        .filter(col("true_n") * cap > col("nw"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_missed"))
      bounds.join(missed, Seq("lang"), "left")
        .select(col("lang"), col("n_words"),
          col("never_undercounts"), col("err_window_holds"), col("err_bounded"),
          (coalesce(col("n_missed"), lit(0L)) === 0L).as("heavy_all_found"))
        .orderBy(col("lang"))
    }),


    // Deterministic train/valid/test splitting, both i.i.d. (hash the row
    // id) and leakage-safe grouped (hash the `source` group key, so every
    // document of a group lands in one split — the near-dup contamination
    // guard). Assignment is a pure scan expression on a portable md5-prefix
    // interval, so the oracle recomputes it from scratch in DuckDB.
    "q106_hash_split" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("source"),
        ops.Splits.hashSplit(col("doc_id"),
          Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05), seed = 7L).as("split"),
        ops.Splits.hashSplit(col("source"),
          Seq("train" -> 0.8, "holdout" -> 0.2), seed = 7L).as("group_split"))
        .orderBy(col("doc_id"))
    }),


    // Deterministic global shuffle + balanced shard assignment for training
    // shards: shard = equal md5-interval bucket of the id, shuffle_rank =
    // the full seed-keyed hash (sorting by it is the stable corpus-wide
    // permutation a data loader consumes). Same portable primitive as q106.
    "q107_shard_assign" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        ops.Splits.shard(col("doc_id"), nShards = 8, seed = 11L).as("shard"),
        ops.Splits.shuffleOrder(col("doc_id"), seed = 11L).as("shuffle_rank"))
        .orderBy(col("doc_id"))
    }),


    // Salted skew join through the oracle gate: the salt layer (split HOT
    // fact keys `salts` ways, replicate their dim rows per salt, plain-join
    // the cold majority, union) must be RESULT-invisible — DuckDB computes
    // the plain join. Explicit hot keys so both halves of the routed plan
    // are deterministically exercised at every scale factor; the sampled
    // detector is pinned separately in ScaleSpec.
    "q118_salted_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_orderkey"),
          col("l_extendedprice"))
      val dim = t(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      ops.Skew.saltedJoin(fact, dim, "suppkey", spreadCol = "l_orderkey", salts = 8,
        hotKeys = ops.HotKeySpec.Explicit(Seq(1L, 2L, 3L, 5L, 8L)))
        .groupBy(col("suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("total_price"))
        .orderBy(col("suppkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // split/shard assignment recomputed from scratch: identical md5-prefix
    // thresholds embedded from the same hexThreshold the engine plans
    "q106_hash_split" -> {
      val t1 = ops.Splits.hexThreshold(0.9)
      val t2 = ops.Splits.hexThreshold(0.95)
      val tg = ops.Splits.hexThreshold(0.8)
      s"""SELECT doc_id, source,
            CASE WHEN substr(md5(doc_id::VARCHAR || ':7'), 1, 15) < '$t1' THEN 'train'
                 WHEN substr(md5(doc_id::VARCHAR || ':7'), 1, 15) < '$t2' THEN 'valid'
                 ELSE 'test' END AS split,
            CASE WHEN substr(md5(source || ':7'), 1, 15) < '$tg' THEN 'train'
                 ELSE 'holdout' END AS group_split
          FROM documents ORDER BY doc_id"""
    },

    "q107_shard_assign" -> {
      val cases = (1 until 8).map { i =>
        s"WHEN substr(md5(doc_id::VARCHAR || ':11'), 1, 15) < '${ops.Splits.hexThreshold(i / 8.0)}' THEN ${i - 1}"
      }.mkString("\n                 ")
      s"""SELECT doc_id,
            CASE $cases
                 ELSE 7 END AS shard,
            md5(doc_id::VARCHAR || ':11') AS shuffle_rank
          FROM documents ORDER BY doc_id"""
    },

    "q99_temperature_mix" -> q99QuotasCaptured
      .map { qsThunk =>
        val qs = qsThunk()
        // domain values come from DATA — escape for the SQL literal
        val vals = qs.toSeq.sortBy(_._1)
          .map { case (d, q) => s"('${d.replace("'", "''")}', CAST($q AS BIGINT))" }
          .mkString(", ")
        s"""WITH q(lang, quota) AS (VALUES $vals),
           r AS (SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY md5(text) ASC NULLS LAST, doc_id) AS sample_rank
                 FROM documents WHERE lang IS NOT NULL)
           SELECT r.doc_id, r.lang, r.sample_rank, q.quota AS mix_quota
           FROM r JOIN q USING (lang) WHERE r.sample_rank <= q.quota
           ORDER BY lang, sample_rank"""
      }
      .getOrElse(
        """SELECT NULL AS doc_id, NULL AS lang, NULL AS sample_rank,
                  NULL AS mix_quota WHERE FALSE"""),

    // approximate-regime guarantees are theorems — stated as literals
    // beside the exact totals (the q27 pattern)
    "q101_heavy_hitters_approx" ->
      """WITH w AS (
           SELECT lang,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS word
           FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
           TRUE AS never_undercounts, TRUE AS err_window_holds,
           TRUE AS err_bounded, TRUE AS heavy_all_found
         FROM w GROUP BY lang ORDER BY lang""",

    // cutoff = 0.25 × 16^32 in hex; md5 hex strings of equal length compare
    // lexicographically as numbers
    "q64_deterministic_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE md5(text) < '40000000000000000000000000000000'
         ORDER BY doc_id""",

    "q68_domain_mix" ->
      """SELECT doc_id, source, lang FROM documents
         WHERE md5(text) < CASE
           WHEN source = 'src0' THEN '80000000000000000000000000000000'
           WHEN source = 'src1' THEN '40000000000000000000000000000000'
           ELSE '19999999999999999999999999999999' END
         ORDER BY doc_id""",

    "q85_group_sample" ->
      """WITH r AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS sample_rank
           FROM documents)
         SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
         FROM r WHERE sample_rank <= 10 ORDER BY lang, sample_rank""",

    // capacity ≫ vocabulary ⇒ SpaceSaving counts are exact with err 0, so
    // the oracle is plain exact top-10 word counts per language
    "q84_heavy_hitters" ->
      """WITH w AS (
           SELECT lang,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS word
           FROM documents),
         c AS (SELECT lang, word, count(*) AS n FROM w GROUP BY lang, word),
         r AS (SELECT lang, word, n, CAST(0 AS BIGINT) AS err,
                 row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rank
               FROM c)
         SELECT lang, word, n, err, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 10 ORDER BY lang, rank""",

    "q118_salted_join" ->
      """SELECT l_suppkey AS suppkey, s_name, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY l_suppkey, s_name ORDER BY suppkey"""
  )
}
