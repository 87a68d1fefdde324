package graft

import graft.config._
import graft.functions.Text
import graft.ops.{Ann, Dedup, Multimodal}
import graft.run.{CollectingTracker, Runner}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** SQL-surface gates: joins, aggregation/grouping-set/window families, set ops, subqueries, JSON/array/map/struct functions, time windows, as-of/interval joins, LATERAL, sketches, recursive CTEs, VARIANT.
  *
  * Split from EngineQueries (round 9) for per-family review; entries are
  * verbatim and the combined key set is unchanged.
  */
private[graft] object SqlSurfaceQueries {
  import QueryHelpers._

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q07_outer_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_custkey") < 300)
      val ord = t(s, dir, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
        .orderBy(col("c_custkey"))
    }),


    // SELECT DISTINCT + COUNT(DISTINCT ...) single and multi column.
    "q21_distinct_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"),
        count(lit(1)).as("n_rows"))
    }),


    // GROUPING SETS with grouping() markers (not value coalescing — the
    // round-1 advice: labels must distinguish super-aggregate rows).
    "q22_grouping_sets" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT n_name, c_mktsegment,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(c_mktsegment) AS INT) AS g_segment,
               count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
        ORDER BY g_nation, g_segment, n_name NULLS FIRST, c_mktsegment NULLS FIRST""")
    }),


    // lag/lead analytics + RANGE frame over a numeric ordering key.
    "q23_lag_lead" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice, 1) OVER w AS prev_price,
               lead(o_totalprice, 1) OVER w AS next_price,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")
    }),


    // Array functions + struct build/access (flattened output).
    "q25_struct_array" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_partkey") <= 200)
        .withColumn("words", split(col("p_type"), " "))
        .withColumn("info", struct(col("p_brand").as("brand"), col("p_retailprice").as("price")))
      p.select(
        col("p_partkey"),
        element_at(col("words"), 1).as("first_word"),
        size(col("words")).as("n_words"),
        array_contains(col("words"), "BRUSHED").as("has_brushed"),
        element_at(sort_array(col("words")), 1).as("min_word"),
        col("info").getField("brand").as("brand"),
        col("info").getField("price").as("price"))
        .orderBy(col("p_partkey"))
    }),


    // VALUES literal table joined against a real table.
    "q26_values_join" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT r_regionkey, t.rname, t.bonus
        FROM region JOIN (VALUES ('ASIA', 10), ('EUROPE', 20), ('AFRICA', 30)) AS t(rname, bonus)
          ON r_name = t.rname
        ORDER BY r_regionkey""")
    }),


    // Approximate aggregates, oracle-checkable form: the HLL++ estimate is
    // emitted as a within-tolerance boolean against the exact distinct
    // count (which DuckDB cross-checks independently), and the approximate
    // median is emitted raw — at default accuracy the rank error (±n/104)
    // is far smaller than any value's run length in this data, so
    // percentile_approx returns exactly the discrete median DuckDB computes.
    // The sketch aggs and the DISTINCT agg run as SEPARATE one-row passes
    // joined at the end: mixing them makes Spark's distinct rewrite group
    // by l_partkey first, which materializes a partial percentile_approx
    // buffer PER DISTINCT KEY (20k QuantileSummaries at sf0.1, ~20s; the
    // split form is ~1s and each pass stays a flat scan at any scale).
    // Both approx sketches emit within-tolerance booleans against exact
    // counterparts the oracle recomputes: percentile_approx's rank error
    // is tiny (±n/10⁴) but when the target rank falls on a value-run
    // boundary the returned ELEMENT legitimately differs (observed at
    // sf0.1: 26 vs 25 with quantity≤25 cumulating to exactly n/2), so the
    // raw estimate can never be hash-gated across engines. The exact
    // median is type-7 interpolated on both sides and hash-checked.
    "q27_approx_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sketches = li.agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts_raw"),
        expr("percentile_approx(l_quantity, 0.5)").as("approx_median_raw"),
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        count(lit(1)).as("n_rows"))
      val exact = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
      sketches.crossJoin(exact)
        .select(
          (abs(col("approx_parts_raw") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.05).as("parts_within_5pct"),
          col("exact_parts"),
          (abs(col("approx_median_raw") - col("median_qty")) <= lit(1.0))
            .as("median_within_1"),
          col("median_qty"), col("n_rows"))
    }),


    // Math function pack restricted to cross-engine-exact ops: abs/ceil/
    // floor (int results), decimal round, IEEE sqrt, power-of-two, pmod.
    "q28_math_funcs" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 100)
        .select(
          col("p_partkey"),
          abs(col("p_retailprice") - 1000).as("abs_diff"),
          ceil(col("p_retailprice")).as("ceil_price"),
          floor(col("p_retailprice")).as("floor_price"),
          round(col("p_retailprice").cast(DecimalType(12, 2)), 1).as("round_price"),
          sqrt(col("p_partkey").cast("double")).as("sqrt_key"),
          pow(lit(2.0), pmod(col("p_partkey"), lit(10))).as("pow2"),
          pmod(col("p_partkey"), lit(7)).as("mod7"))
        .orderBy(col("p_partkey"))
    }),


    // Reference JSON UDF pack (json_get_int / json_get_str aliases).
    "q39_json_udfs" -> ((s, dir) => {
      graft.functions.JsonUdfs.register(s)
      t(s, dir, "events")
        .select(col("event_type"),
          expr("json_get_int(props, 'k')").as("k"),
          expr("json_get_str(props, 'k')").as("k_str"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"), max(col("k_str")).as("k_max_str"))
        .orderBy(col("event_type"))
    }),


    // Map functions: build, access, keys/values (flattened exact output).
    "q40_map_funcs" -> ((s, dir) => {
      val r = t(s, dir, "region")
        .withColumn("m", map_from_arrays(
          array(lit("name"), lit("comment")),
          array(col("r_name"), lit("x"))))
      r.select(
        col("r_regionkey"),
        element_at(col("m"), "name").as("name_val"),
        size(col("m")).as("m_size"),
        array_join(map_keys(col("m")), ",").as("keys_joined"))
        .orderBy(col("r_regionkey"))
    }),


    // UNION with dedup semantics (vs the UNION ALL already covered in q15).
    "q41_union_dedup" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val a = ord.filter(col("o_totalprice") >= 100000).select(col("o_custkey").as("k"))
      val b = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      a.union(b).distinct().orderBy(col("k"))
    }),


    // INTERSECT ALL / EXCEPT ALL (bag semantics; counts preserved).
    "q42_set_ops_all" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        WITH f AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
             o AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
        SELECT 'intersect_all' AS op, k, count(*) AS n
        FROM (SELECT k FROM f INTERSECT ALL SELECT k FROM o) t1 GROUP BY k
        UNION ALL
        SELECT 'except_all' AS op, k, count(*) AS n
        FROM (SELECT k FROM f EXCEPT ALL SELECT k FROM o) t2 GROUP BY k
        ORDER BY op, k""")
    }),


    // Time-window aggregation over the events stream table (batch form of
    // the streaming tumbling window; window() → bucketed hash aggregate).
    "q43_time_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("value_sum"))
        .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("value_sum"))
        .orderBy(col("bucket"), col("event_type"))
    }),


    // As-of join: every click picks up the latest prior purchase of the
    // same user — union + single key shuffle + running window (Joins.asofJoin),
    // checked against DuckDB's native ASOF JOIN.
    "q44_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
      val purchases = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      ops.Joins.asofJoin(clicks, purchases,
          keys = Seq("user_id"), timeCol = "ts", rightCols = Seq("purchase_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("purchase_ts"), col("purchase_value_r").as("purchase_value"))
        .orderBy(col("event_id"))
    }),


    // Theta (non-equi) join: small side broadcast → nested-loop over 5 rows.
    "q45_theta_join" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      nation.join(broadcast(region), nation("n_regionkey") =!= region("r_regionkey"))
        .select(col("n_name"), col("r_name"))
        .orderBy(col("n_name"), col("r_name"))
    }),


    // Gap-based sessionization: a new session starts after >30 min of user
    // inactivity; composed windows (lag → flag → running sum) in one shuffle.
    "q47_sessionize" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        WITH e AS (
          SELECT user_id, event_id, unix_micros(ts) AS us FROM events),
        flagged AS (
          SELECT user_id, event_id, us,
            CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT user_id,
               CAST(sum(new_sess) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM flagged GROUP BY user_id ORDER BY user_id""")
    }),


    // SQL-level IN / EXISTS / NOT EXISTS subqueries (Catalyst rewrites all
    // three to semi/anti joins — the declarative form users actually write).
    "q49_in_exists" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
          AND EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),


    // Correlated scalar subquery in the SELECT list (decorrelated to a
    // left outer aggregate join by Catalyst — no per-row execution).
    "q50_scalar_correlated" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT c_custkey, c_acctbal,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""")
    }),


    // Window-function completion: ntile / first_value / last_value /
    // nth_value over explicit ROWS frames (deterministic: unique order key).
    "q51_window_funcs" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT o_custkey, o_orderkey,
               ntile(4) OVER w AS quartile,
               first_value(o_orderkey) OVER w AS first_ok,
               last_value(o_orderkey) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
               nth_value(o_orderkey, 2) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey""")
    }),


    // CUBE: all 2^n grouping combinations (completes the ROLLUP q10 /
    // GROUPING SETS q22 family), grouping() labels per survey advice.
    "q52_cube" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    }),


    // Pivot: long → wide on a known domain (DataFrame pivot; the oracle is
    // the equivalent conditional aggregation — what pivot compiles to).
    "q53_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    }),


    // Sorted list aggregation: collect_list is order-nondeterministic, so
    // sort_array + array_join makes it exact — the standard trick for
    // deterministic grouped concatenation (e.g. doc grouping in LLM prep).
    "q54_collect_sorted" -> ((s, dir) => {
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    }),


    // unnest_json_array (reference U1) end-to-end in SQL: explode the
    // element texts with positions; oracle is the expected literal rows.
    "q55_unnest_json" -> ((s, dir) => {
      graft.functions.JsonUdfs.register(s)
      s.sql("""
        SELECT id, pos, el
        FROM (SELECT id, posexplode(unnest_json_array(c)) AS (pos, el)
              FROM VALUES (1, '["a", 1, {"k": 2}, [3]]'),
                          (2, '[true, null]') AS t(id, c))
        ORDER BY id, pos""")
    }),


    // Ranking-function completion: rank / dense_rank over ties, plus
    // percent_rank and cume_dist (exact small-integer divisions in double).
    "q56_rank_funcs" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cdist
        FROM lineitem WHERE l_orderkey < 100
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity)
        ORDER BY l_orderkey, l_linenumber""")
    }),


    // Interval-containment join (attribution windows): every click paired
    // with the 1-hour purchase windows containing it — bucketized equi-join
    // instead of the nested-loop theta join Spark would otherwise plan.
    "q62_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("w_start"), (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      ops.Joins.intervalJoin(clicks, windows, Seq("user_id"), "ts", "w_start", "w_end")
        .select(col("event_id"), col("user_id"), col("purchase_id_r").as("purchase_id"))
        .orderBy(col("event_id"), col("purchase_id"))
    }),


    // Higher-order array functions (transform/filter/aggregate/exists) —
    // the codegen-fused per-row array path mirrored by DuckDB list_* calls.
    "q76_hof_arrays" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("bigint").as("n_words"),
          size(filter(col("w"), x => length(x) > 4)).cast("bigint").as("n_long"),
          aggregate(col("w"), lit(0L), (acc, x) => acc + length(x)).as("total_len"),
          aggregate(col("w"), lit(0L), (acc, x) => acc + length(x) * length(x)).as("sq_len"),
          exists(col("w"), x => length(x) >= 7).cast("bigint").as("has_long"),
          array_max(transform(col("w"), x => length(x))).cast("bigint").as("max_len"))
        .orderBy(col("doc_id"))
    }),


    // Statistical aggregates: stddev/variance/corr/covar/exact median per
    // group — rounded at 6 dp so both engines land on the same double.
    "q77_stats_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("cov_qp"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),


    // IGNORE NULLS window carry-forward: per event, the most recent click
    // value for the user — `last(col, ignoreNulls) OVER (... ROWS UNBOUNDED
    // PRECEDING)`, the gap-fill idiom.
    "q78_ignore_nulls" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("click_val",
          when(col("event_type") === "click", col("value")))
        .select(col("event_id"), col("user_id"),
          round(last(col("click_val"), ignoreNulls = true).over(w), 6)
            .as("last_click_val"))
        .filter(col("user_id") < 20)
        .orderBy(col("event_id"))
    }),


    // FILTER-clause aggregates (SQL surface): conditional counts/sums
    // without CASE scaffolding — exercised through spark.sql so the parser
    // path is what's graded.
    "q79_filter_clause" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("q79_events")
      s.sql("""
        SELECT user_id,
          count(*) AS n,
          count(*) FILTER (WHERE event_type = 'click') AS n_click,
          count(*) FILTER (WHERE event_type = 'view') AS n_view,
          CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_sum
        FROM q79_events GROUP BY user_id ORDER BY user_id""")
    }),


    // UNPIVOT (wide → long), the inverse of q53's pivot: measures melt to
    // (name, value) rows with the id column repeated — Spark's native
    // unpivot operator, which plans as a Generate/Expand over the input
    // (per-row scan work, no shuffle beyond the source aggregate).
    "q109_unpivot" -> ((s, dir) => {
      val agg = t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_discount"), 2).as("sum_disc"))
      agg.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy(col("l_returnflag"), col("measure"))
    }),


    // LATERAL correlated subquery join (SQL surface): per-customer top-2
    // orders via a correlated ORDER BY…LIMIT subquery in FROM — Catalyst
    // plans the decorrelated form; DuckDB runs the identical SQL.
    "q113_lateral" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey < 200
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""")
    }),


    // Mergeable distinct sketches (DataSketches HLL, built into Spark 4):
    // one sketch per source partition, union-aggregated for the corpus
    // total — the incremental pattern where each new day/partition
    // aggregates once into a few-KB binary sketch and history is NEVER
    // re-scanned (contrast q27's one-shot approx_count_distinct). Estimates
    // are approximate by design, so the gate is q27-style: exact counts
    // hash-gated beside within-2% booleans.
    "q114_sketch_union" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        WITH per_source AS (
          SELECT source,
            hll_sketch_agg(doc_id) AS sk,
            count(DISTINCT doc_id) AS exact_distinct
          FROM documents GROUP BY source),
        total AS (SELECT count(DISTINCT doc_id) AS td FROM documents),
        uni AS (SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est
                FROM per_source),
        rows_out AS (
          SELECT source, exact_distinct,
            abs(hll_sketch_estimate(sk) - exact_distinct)
              <= 0.02 * exact_distinct AS est_within_2pct
          FROM per_source
          UNION ALL
          SELECT '__total__', td, abs(est - td) <= 0.02 * td
          FROM uni CROSS JOIN total)
        SELECT source, exact_distinct, est_within_2pct
        FROM rows_out ORDER BY source""")
    }),


    // Recursive CTE (Spark 4 WITH RECURSIVE): binary-tree ancestry walk —
    // every customer key < 64 halves repeatedly to the root, accumulating
    // depth and path sum. A genuine iterate-to-fixpoint in pure SQL (the
    // shape behind org hierarchies / BOM explosions), executed by Spark's
    // recursion operator rather than a driver loop. DuckDB runs the same
    // recursion (// is its integer division; Spark spells it DIV).
    "q115_recursive_cte" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        WITH RECURSIVE anc(start_key, cur_key, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 64
          UNION ALL
          SELECT start_key, cur_key DIV 2, depth + 1 FROM anc WHERE cur_key > 1)
        SELECT start_key, max(depth) AS root_depth,
               CAST(sum(cur_key) AS BIGINT) AS path_sum
        FROM anc GROUP BY start_key ORDER BY start_key""")
    }),


    // VARIANT semi-structured path (Spark 4): props parsed ONCE into the
    // binary variant encoding, then typed variant_get extraction per
    // access — at scale this replaces re-parsing the JSON string per
    // field (q19's get_json_object path) with one parse + O(1) typed
    // reads. The oracle reads the same fields with DuckDB's JSON
    // extraction, so the variant layer must be value-invisible.
    "q116_variant" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        WITH v AS (SELECT event_type, parse_json(props) AS pv FROM events)
        SELECT event_type,
               count(*) AS n,
               sum(variant_get(pv, '$.k', 'long')) AS k_sum,
               min(variant_get(pv, '$.k', 'long')) AS k_min,
               max(variant_get(pv, '$.k', 'long')) AS k_max,
               min(schema_of_variant(pv)) AS v_schema
        FROM v GROUP BY event_type ORDER BY event_type""")
    }),

    // GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB agree on the
    // semantics: group on every non-aggregate select item, order on the
    // whole select list) — the analyst shorthand that removes the
    // copy-the-select-list failure mode from wide rollups.
    "q126_group_by_all" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY ALL ORDER BY ALL""")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q126_group_by_all" ->
      """SELECT l_returnflag, l_linestatus,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem
         GROUP BY ALL ORDER BY ALL""",
    "q07_outer_join" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
         coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         WHERE c_custkey < 300
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",

    "q21_distinct_agg" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
         (SELECT count(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) t) AS n_flag_status,
         count(*) AS n_rows FROM lineitem""",

    "q22_grouping_sets" ->
      """SELECT n_name, c_mktsegment,
         CAST(grouping(n_name) AS INT) AS g_nation,
         CAST(grouping(c_mktsegment) AS INT) AS g_segment,
         count(*) AS n_cust,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
         ORDER BY g_nation, g_segment, n_name NULLS FIRST, c_mktsegment NULLS FIRST""",

    "q23_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey
                    ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q25_struct_array" ->
      """SELECT p_partkey,
         string_split(p_type, ' ')[1] AS first_word,
         len(string_split(p_type, ' ')) AS n_words,
         list_contains(string_split(p_type, ' '), 'BRUSHED') AS has_brushed,
         list_sort(string_split(p_type, ' '))[1] AS min_word,
         p_brand AS brand, p_retailprice AS price
         FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",

    "q26_values_join" ->
      """SELECT r_regionkey, t.rname, t.bonus
         FROM region JOIN (VALUES ('ASIA', 10), ('EUROPE', 20), ('AFRICA', 30)) t(rname, bonus)
           ON r_name = t.rname
         ORDER BY r_regionkey""",

    "q28_math_funcs" ->
      """SELECT p_partkey,
         abs(p_retailprice - 1000) AS abs_diff,
         CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
         CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
         round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS round_price,
         sqrt(CAST(p_partkey AS DOUBLE)) AS sqrt_key,
         power(2.0, p_partkey % 10) AS pow2,
         p_partkey % 7 AS mod7
         FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""",

    "q109_unpivot" ->
      """WITH a AS (
           SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, measure, value
         FROM (UNPIVOT a ON sum_qty, sum_price, sum_disc
               INTO NAME measure VALUE value)
         ORDER BY l_returnflag, measure""",

    "q27_approx_agg" ->
      """SELECT TRUE AS parts_within_5pct,
                count(DISTINCT l_partkey) AS exact_parts,
                TRUE AS median_within_1,
                quantile_cont(l_quantity, 0.5) AS median_qty,
                count(*) AS n_rows
         FROM lineitem""",

    "q39_json_udfs" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
         max(json_extract_string(props, '$.k')) AS k_max_str
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q40_map_funcs" ->
      """SELECT r_regionkey, r_name AS name_val, 2 AS m_size,
         'name,comment' AS keys_joined
         FROM region ORDER BY r_regionkey""",

    "q41_union_dedup" ->
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice >= 100000
         UNION
         SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
         ORDER BY k""",

    "q42_set_ops_all" ->
      """WITH f AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
              o AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
         SELECT 'intersect_all' AS op, k, count(*) AS n
         FROM (SELECT k FROM f INTERSECT ALL SELECT k FROM o) t1 GROUP BY k
         UNION ALL
         SELECT 'except_all' AS op, k, count(*) AS n
         FROM (SELECT k FROM f EXCEPT ALL SELECT k FROM o) t2 GROUP BY k
         ORDER BY op, k""",

    "q43_time_window" ->
      """SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS bucket, event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
         FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""",

    "q44_asof_join" ->
      """WITH clicks AS (
           SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
         p0 AS (
           SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'purchase'),
         purchases AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
         SELECT c.event_id, c.user_id, c.ts,
                p.ts AS purchase_ts, p.value AS purchase_value
         FROM clicks c ASOF JOIN purchases p
           ON c.user_id = p.user_id AND c.ts >= p.ts
         ORDER BY c.event_id""",

    "q45_theta_join" ->
      """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey <> r_regionkey
         ORDER BY n_name, r_name""",

    "q47_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         flagged AS (
           SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
         SELECT user_id,
                CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                count(*) AS n_events
         FROM flagged GROUP BY user_id ORDER BY user_id""",

    "q49_in_exists" ->
      """SELECT o_orderpriority, count(*) AS n
         FROM orders
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
           AND EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q50_scalar_correlated" ->
      """SELECT c_custkey, c_acctbal,
         (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
         FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""",

    "q51_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
         ntile(4) OVER w AS quartile,
         first_value(o_orderkey) OVER w AS first_ok,
         last_value(o_orderkey) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
         nth_value(o_orderkey, 2) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
         FROM orders WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",

    "q52_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(grouping(o_orderstatus) AS INT) AS g_status,
         CAST(grouping(o_orderpriority) AS INT) AS g_prio,
         count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q53_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
         count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
         count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q54_collect_sorted" ->
      """SELECT n_regionkey,
         string_agg(n_name, ',' ORDER BY n_name) AS nations,
         count(*) AS n
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "q55_unnest_json" ->
      """SELECT id, pos, el FROM (VALUES
           (1, 0, 'a'), (1, 1, '1'), (1, 2, '{"k":2}'), (1, 3, '[3]'),
           (2, 0, 'true'), (2, 1, 'null')) AS t(id, pos, el)
         ORDER BY id, pos""",

    "q56_rank_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         percent_rank() OVER w AS prnk,
         cume_dist() OVER w AS cdist
         FROM lineitem WHERE l_orderkey < 100
         WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity)
         ORDER BY l_orderkey, l_linenumber""",

    "q62_interval_join" ->
      """WITH clicks AS (
           SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p AS (
           SELECT user_id, event_id AS purchase_id, ts AS w_start,
                  ts + INTERVAL 1 HOUR AS w_end
           FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, p.purchase_id
         FROM clicks c JOIN p
           ON c.user_id = p.user_id AND c.ts >= p.w_start AND c.ts < p.w_end
         ORDER BY c.event_id, p.purchase_id""",

    "q76_hof_arrays" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents)
         SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(list_filter(ws, x -> len(x) > 4)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(ws, x -> len(x))) AS BIGINT) AS total_len,
           CAST(list_sum(list_transform(ws, x -> len(x) * len(x))) AS BIGINT) AS sq_len,
           CAST(CASE WHEN len(list_filter(ws, x -> len(x) >= 7)) > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_long,
           CAST(list_max(list_transform(ws, x -> len(x))) AS BIGINT) AS max_len
         FROM w ORDER BY doc_id""",

    "q78_ignore_nulls" ->
      """SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS last_click_val
         FROM events WHERE user_id < 20 ORDER BY event_id""",

    "q79_filter_clause" ->
      """SELECT user_id,
           count(*) AS n,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'view') AS n_view,
           CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_sum
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q77_stats_agg" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qp,
           round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q115_recursive_cte" ->
      """WITH RECURSIVE anc(start_key, cur_key, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 64
           UNION ALL
           SELECT start_key, cur_key // 2, depth + 1 FROM anc WHERE cur_key > 1)
         SELECT start_key, max(depth) AS root_depth,
                CAST(sum(cur_key) AS BIGINT) AS path_sum
         FROM anc GROUP BY start_key ORDER BY start_key""",

    "q116_variant" ->
      """SELECT event_type,
                count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
                CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
                CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
                'OBJECT<k: BIGINT>' AS v_schema
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q114_sketch_union" ->
      """SELECT source, count(DISTINCT doc_id) AS exact_distinct,
                TRUE AS est_within_2pct
         FROM documents GROUP BY source
         UNION ALL
         SELECT '__total__', count(DISTINCT doc_id), TRUE FROM documents
         ORDER BY source""",

    "q113_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         FROM customer c JOIN LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON TRUE
         WHERE c.c_custkey < 200
         ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"""
  )
}
