package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression tests: the properties that make these queries scale
  * (pushdown, pruning, broadcast choice, top-k physical operator, partial
  * aggregation) asserted against the actual Catalyst plans, so a future
  * "correct but 10× slower" rewrite fails loudly.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity"), p)
    // pruned read schema: only the 5 projected columns + filter columns
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"), readSchema)
  }

  test("q03: dimension side broadcast, top-k via TakeOrderedAndProject") {
    val p = plan("q03_top_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05: snowflake dims broadcast; no cartesian/BNL joins") {
    val p = plan("q05_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q01: hash aggregation with map-side partial aggregates") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), p) // map-side combine before the shuffle
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
  }

  test("q16: global top-k never materializes a full sort") {
    val p = plan("q16_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("\nSort "), p)
  }

  test("q32: inverted-index join is an equi-join on the shingle key, not a cartesian") {
    val p = plan("q32_ngram_jaccard")
    // tiny sf broadcasts a side; at scale the same plan shuffles on `g` —
    // either way it must be a hash-keyed equi-join, never all-pairs
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  // the only allowed exchange is the final rangepartitioning sort the
  // oracle-determinism orderBy adds — the operator itself must not shuffle
  // (joins/aggregations would show a hashpartitioning exchange)
  private def onlyOutputSortExchanges(p: String): Boolean =
    !p.contains("hashpartitioning") && !p.contains("SinglePartition")

  test("q69: token-window chunking never shuffles (pure per-row generate)") {
    val p = plan("q69_token_windows")
    assert(onlyOutputSortExchanges(p), p)
    assert(p.contains("Generate"), p) // explode of window starts
  }

  test("q68: domain-mix sampling is a single scan filter, no join or shuffle") {
    val p = plan("q68_domain_mix")
    assert(onlyOutputSortExchanges(p), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("Filter"), p)
  }

  test("q66: component contraction joins stay hash-keyed (no cartesian at any round)") {
    val p = plan("q66_dedup_components")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q35: ANN brute force broadcasts the query set (single corpus scan)") {
    val p = plan("q35_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q58: IVF search joins broadcast probes against the cell-assigned corpus") {
    val p = plan("q58_ann_ivf_reuse")
    // the probed (query, cell) side is explicitly broadcast: the corpus is
    // never shuffled for a search, only filtered by the equi-join on cell
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q105: PQ ADC search streams the encoded corpus against a broadcast LUT side") {
    val p = plan("q105_ann_pq")
    // the deliberate full-code scan of flat PQ: query+LUT rows are the
    // broadcast side, the encoded corpus is never shuffled for scoring —
    // the only exchange is the per-query top-k window
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // distinct shuffle nodes: the top-k window + the presentation orderBy —
    // nothing shuffles the encoded corpus for scoring itself
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges <= 2, s"expected only window + orderBy shuffles, got $exchanges:\n$p")
  }

  test("q108: IVF-PQ search equi-joins broadcast probe LUTs on cell — no corpus shuffle, no all-pairs") {
    val p = plan("q108_ann_ivfpq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q46: cosine pair mining is an equi-join on the LSH bucket, never all-pairs") {
    val p = plan("q46_embed_neardup")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q62: interval join plans as a hash equi-join on (key, bucket), not a nested loop") {
    val p = plan("q62_interval_join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q47: sessionize composes lag→flag→sum windows + aggregate in ONE hash shuffle") {
    val p = plan("q47_sessionize")
    // both window passes and the groupBy key on user_id: the aggregate must
    // reuse the window's hashpartitioning — the only other exchange allowed
    // is the output orderBy's range partitioning
    assert("Arguments: hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q44: as-of join is one shuffle on the key + window, no range-join explosion") {
    val p = plan("q44_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q49: IN/EXISTS/NOT EXISTS rewrite to semi/anti joins, no per-row subqueries") {
    val p = plan("q49_in_exists")
    assert(p.contains("LeftSemi") || p.contains("Semi"), p)
    assert(p.contains("LeftAnti") || p.contains("Anti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q50: correlated scalar subquery decorrelates to one aggregate join") {
    val p = plan("q50_scalar_correlated")
    // decorrelated: orders is aggregated once and joined — not executed per
    // customer row (no nested subquery execution nodes in the physical plan)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Join") || p.contains("HashJoin"), p)
    assert(!p.toLowerCase.contains("subquery"), p)
  }

  test("q84: SpaceSaving aggregate ships bounded partials (partial + final object agg)") {
    val p = plan("q84_heavy_hitters")
    // map-side partial summary then one exchange on lang then final merge —
    // the exchange carries capacity-bounded summaries, not the vocabulary
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q112: blocklist matching is pure scan work via one automaton expression") {
    val p = plan("q112_blocklist")
    assert(p.contains("multi_contains"), p)
    assert(onlyOutputSortExchanges(p), p)
  }

  test("q108: IVF-PQ runs on the native index expressions, not literal trees") {
    val p = plan("q108_ann_ivfpq")
    // encode + scoring are single native expressions; the composed forms
    // they replaced inlined one literal sub-tree per centroid/codebook
    // entry (megabytes of plan, multi-MiB task binaries — r8 fix)
    assert(p.contains("pq_encode"), p)
    assert(p.contains("adc_score"), p)
    assert(p.contains("nearest_cell"), p)
    assert(!p.contains("least(struct"), p)
    assert(p.length < 200000, s"plan blew up to ${p.length} chars")
  }

  test("q83: NFC normalization is pure scan work (no operator shuffle)") {
    val p = plan("q83_normalize")
    assert(p.contains("nfc_normalize"), p)
    assert(onlyOutputSortExchanges(p), p)
  }

  test("semanticPairs: within-cell mining is an equi-join on the cell key, never all-pairs") {
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    import spark0.implicits._
    val emb = (1L to 40L).map(i => (i, Seq.fill(8)(i.toDouble % 5))).toDF("id", "v")
    val index = ops.Ann.ivfBuild(emb, "id", "v", nlist = 2, maxTrainVectors = 40)
    val p = ops.Ann.semanticPairs(index, threshold = 0.9)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q86: pair generation tokenizes each doc once (no generate-filter re-derivation)") {
    val p = plan("q86_bpe_pairs")
    // the regex tokenization must appear in exactly one Project node: a
    // plain explode's inferred size-filter used to inline it (and the full
    // pair transform) into a scan-level Filter — 30× slower at sf0.1
    assert("regexp_extract_all".r.findAllIn(p).size == 1, p)
    assert(p.contains("HashAggregate"), p) // map-side combine: pair vocab, not corpus
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q95: BPE encode is pure per-row scan work (no shuffle, merges as plan literals)") {
    val p = plan("q95_bpe_encode")
    // encode = transform+replace chain per row; the only exchange allowed
    // is the output ordering's range partitioning (node header and its
    // Arguments line are separate in formatted explain, so count blocks)
    val exchangeNodes = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    val rangeParts = "Arguments: rangepartitioning".r.findAllIn(p).size
    assert(exchangeNodes == rangeParts,
      s"unexpected non-range shuffle in encode ($exchangeNodes exchanges, $rangeParts range):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q27: sketch aggregates never run keyed by the DISTINCT column") {
    // Mixing countDistinct with TypedImperativeAggregates (percentile_approx,
    // HLL) in ONE agg makes the distinct rewrite group by the distinct key
    // first — materializing a partial percentile buffer PER KEY (20k
    // QuantileSummaries at sf0.1, ~21s vs ~0.7s split). q27 runs them as
    // separate one-row passes; this pins that every aggregate node holding
    // a sketch function stays global (Keys: []).
    val blocks = plan("q27_approx_agg").split("\\n\\(\\d+\\) ")
    val sketchBlocks = blocks.filter(b =>
      b.contains("percentile_approx") || b.contains("approx_count_distinct"))
    assert(sketchBlocks.nonEmpty)
    sketchBlocks.foreach { b =>
      assert(!b.contains("Keys [1]"),
        s"sketch aggregate is keyed (distinct-rewrite trap):\n$b")
    }
  }

  test("q96: classifier scoring is pure scan work — no hash exchange, one range sort") {
    // training runs its own Spark ML jobs when the query is BUILT; the
    // returned frame is the scoring side, which must stay a projection
    // over the scan (coefficients are plan literals) plus the final
    // order-by. A hash exchange here would mean the featurizer or the dot
    // product grew a shuffle.
    val p = plan("q96_quality_classifier")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    val range = "rangepartitioning".r.findAllIn(p).size
    assert(exchanges == 1 && range >= 1,
      s"scoring grew a non-sort exchange ($exchanges exchanges, $range range):\n$p")
    assert(p.contains("hashed_bow"), p)
  }

  test("q99: temperature mix never sorts a whole domain in one task") {
    val p = plan("q99_temperature_mix")
    // selection is hash-threshold: every window partitions by (or orders
    // on) the md5-prefix bucket — the data-rank window on (domain, bucket)
    // spreads a hot domain over 256 tasks instead of one reducer (round-5
    // scale flag), and the cumulative-stats window sorts ≤257 bucket rows
    // per domain, never data rows (round-9 driver-collect flag)
    val winSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.nonEmpty, p)
    winSpecs.foreach(s => assert(s.contains("_mix_b"), s))
    // all equi-joins; the stats side is un-hinted (AQE broadcasts small
    // stats at runtime, shuffle-joins at extreme domain cardinality)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // ... and at gate scale AQE does turn the data-side stats join into a
    // broadcast in the executed plan
    val df = SparkEntry.queries("q99_temperature_mix")(spark, dir)
    df.queryExecution.toRdd.foreach(_ => ())
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin"), executed)
  }

  test("text/sketch passes never re-derive inside scan filters (generate-filter trap)") {
    // InferFiltersFromGenerate + predicate pushdown can clone an expensive
    // expression (tokenization, shingling, sketching) into a scan-level
    // Filter below its staged projection — the whole pass then runs twice
    // (or more) per row. Every explode over a computed array uses
    // explode_outer + a generator-output null filter instead; this pins it.
    val heavy = Seq("word_shingles", "char_shingles", "simhash64", "minhash_sig",
      "regexp_extract_all", "split(", "text_stats", "winnow_fingerprints",
      "nfc_normalize", "md5(substring", "positional_hashes64")
    for (q <- Seq("q24_word_topk", "q32_ngram_jaccard", "q33_minhash_lsh",
        "q34_simhash", "q59_quality_score", "q61_cross_jaccard", "q63_char_jaccard",
        "q66_dedup_components", "q67_repetition_filter", "q69_token_windows",
        "q71_budget_select", "q72_contamination", "q74_line_dedup",
        "q80_unigram_ppl", "q82_gopher_rules", "q84_heavy_hitters",
        "q86_bpe_pairs", "q88_c4_clean", "q91_script_mix", "q92_winnow",
        "q97_dup_spans", "q98_dedup_spans_removed")) {
      val bad = plan(q).linesIterator.filter(_.contains("Condition :"))
        .filter(l => heavy.exists(l.contains)).toSeq
      assert(bad.isEmpty, s"$q re-derives a heavy pass in a filter:\n${bad.mkString("\n")}")
    }
  }

  test("engine pipeline stages keep scan pushdown through temp-view boundaries") {
    val df = SparkEntry.queries("p01_pipeline_agg")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // single-consumer stage was NOT materialized: filter fused into the scan
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q135: row-id derivation is a broadcast lookup join with no per-row UDF") {
    val p = plan("q135_delta_rowtracking")
    // the file→(baseRowId, defaultRowCommitVersion) lookup joins the RAW
    // _metadata.file_path against a multi-spelling driver-side key table —
    // a scan-side path-normalizing UDF would break codegen on every row
    assert(!p.contains("UDF"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
