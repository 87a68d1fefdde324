package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark main: one JSON line with per-query wall times.
  *
  * Round-1 verdict fixes baked in:
  *   - queries materialize through the `noop` sink (full evaluation of the
  *     exact graded plan) instead of `.count()`, which let Catalyst prune
  *     most of the work;
  *   - one untimed warm-up pass absorbs session/codegen/first-scan costs so
  *     per-query numbers are attributable;
  *   - failures are recorded explicitly (`errors` map + 1e9-second sentinel)
  *     instead of silently improving the total.
  */
object Bench {

  private def materialize(spark: SparkSession, sfDir: String,
      name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] =
    try {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // pair-mining queries persist signature frames (documented lifecycle:
      // services clear between corpora); without this, cached blocks pile up
      // across 60+ queries and later queries pay eviction/GC pressure that
      // is not theirs — per-query attribution wants per-query isolation
      spark.catalog.clearCache()
      None
    }
    catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}") }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()

    // attribution tooling (driver contract untouched when unset): run only
    // queries whose name contains one of the comma-separated substrings —
    // lets a regression be timed in isolation vs inside the full run
    val subset = sys.env.get("SPARK_GRAFT_BENCH_SUBSET")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = subset match {
      case Some(pats) => SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }
      case None => SparkEntry.queries
    }

    // untimed warm-up: JVM/codegen/parquet-footer costs land here, not on q01
    selected.foreach { case (name, fn) => materialize(spark, sfDir, name, fn) }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = materialize(spark, sfDir, name, fn)
      val sec = err match {
        case None => (System.nanoTime() - t0) / 1e9
        case Some(msg) => errors += name -> msg; 1e9 // sentinel: failures must hurt the metric
      }
      name -> sec
    }

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // the driver keeps only the tail of this process's output (~2000 chars),
    // so the contract line must stay short: per-query keys are the "q07"/
    // "p03" prefixes (unique by construction) and seconds carry 3 decimals.
    // The full-name per-query map goes to bench_full.json alongside, for
    // human/judge consumption.
    val qs = results.map { case (k, v) => s""""${k.takeWhile(_ != '_')}":${f3(v)}""" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = results.values.sum
    // like-for-like trend vs BENCH_r01 (which covered only the 19 round-1
    // queries): the same subset's total, so totals compare apples-to-apples
    // even as the query count grows round over round
    val r1Names = Set("q01_pricing_summary", "q02_filter_pushdown", "q03_top_orders",
      "q04_priority_semi", "q05_nation_revenue", "q06_forecast_revenue",
      "q08_window_topn", "q09_window_running", "q10_rollup", "q11_intersect",
      "q12_except", "q13_case_buckets", "q14_scalar_subquery", "q15_union_cte",
      "q16_topk", "q17_strings", "q18_monthly_revenue", "q19_json_extract",
      "q20_dedup_exact")
    val r1Subset = results.collect { case (k, v) if r1Names(k) => v }.sum
    // same idea one round later: the 62-query round-2 surface = everything
    // except the queries added in round 3
    val r3New = Set("q57_ann_lsh_exhaustive", "q58_ann_ivf_reuse",
      "q59_quality_score", "q60_incremental_dedup", "q61_cross_jaccard",
      "q62_interval_join", "q63_char_jaccard", "q64_deterministic_sample",
      "q65_sequence_pack",
      "p07_pipeline_json_ops", "p08_pipeline_csv", "p09_pipeline_dirsource",
      "p10_pipeline_textprep", "p11_pipeline_vector")
    // queries added in round 4 — excluded from BOTH earlier subsets so each
    // round's subset total stays the same query set forever
    val r4New = Set("q66_dedup_components", "q67_repetition_filter",
      "q68_domain_mix", "q69_token_windows", "q70_quantize_int8",
      "q71_budget_select", "q72_contamination", "q73_pii_redact",
      "q74_line_dedup", "q75_bloom_dedup", "q76_hof_arrays", "q77_stats_agg",
      "q78_ignore_nulls", "q79_filter_clause", "q80_unigram_ppl",
      "p12_pipeline_curation")
    // queries added in round 5
    val r5New = Set("q81_semantic_dedup", "q82_gopher_rules", "q83_normalize",
      "q84_heavy_hitters", "q85_group_sample", "q86_bpe_pairs", "q87_bigram_lm",
      "q88_c4_clean", "q89_bm25", "q90_group_centroids", "q91_script_mix",
      "q92_winnow", "q93_dsir_select", "q94_bpe_train", "q95_bpe_encode",
      "p13_pipeline_stats")
    val r2Subset = results.collect { case (k, v) if !r3New(k) && !r4New(k) && !r5New(k) => v }.sum
    val r3Subset = results.collect { case (k, v) if !r4New(k) && !r5New(k) => v }.sum
    val r4Subset = results.collect { case (k, v) if !r5New(k) => v }.sum
    val subsets = s""""r1_subset_sec":${f3(r1Subset)},"r2_subset_sec":${f3(r2Subset)},"r3_subset_sec":${f3(r3Subset)},"r4_subset_sec":${f3(r4Subset)}"""
    try {
      val full = results.map { case (k, v) => s""""$k":${f3(v)}""" }.mkString("{", ",", "}")
      val fw = new java.io.FileWriter("bench_full.json")
      fw.write(s"""{"metric":"total","value":${f3(total)},"unit":"sec",$subsets,"queries":$full,"errors":$errJson,"sf":"$sfDir"}""")
      fw.write("\n")
      fw.close()
    } catch { case _: java.io.IOException => () } // best-effort side artifact
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec",$subsets,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
