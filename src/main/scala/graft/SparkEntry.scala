package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is written DataFrame-first (declarative plans → Catalyst picks
  * the physical strategy) and is paired in [[oracleSql]] with bit-exact DuckDB
  * SQL. Floating-point aggregates are made order-independent by summing
  * through fixed-scale decimals (exact, associative) and casting the final
  * value back to double — both engines round the same exact rational to the
  * nearest double, so results compare hash-equal.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(spark, dir, name)

  /** Exact money sum: decimal accumulate, final cast to double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  /** Full query surface: round-1 SQL core (below) + round-2 engine/LLM-ops
    * queries ([[EngineQueries]]). Ordering is stable (ListMap ++ ListMap).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ EngineQueries.queries

  private[graft] def coreQueries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

      // TPC-H Q1 flavor: wide hash aggregate with partial (map-side) combine.
      "q01_pricing_summary" -> ((s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

      // Selective filter + narrow projection: both should reach the parquet
      // scan (PushedFilters + 5-column ReadSchema).
      "q02_filter_pushdown" -> ((s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_quantity") >= 48 &&
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      }),

      // TPC-H Q3 flavor: 3-way join, small side broadcast, top-k.
      "q03_top_orders" -> ((s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }),

      // EXISTS → left-semi join; aggregation over the semi-join result.
      "q04_priority_semi" -> ((s, dir) => {
        val ord = t(s, dir, "orders")
        val late = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        ord.join(late, ord("o_orderkey") === late("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      }),

      // TPC-H Q5 flavor: 6-way snowflake join, dims broadcast.
      "q05_nation_revenue" -> ((s, dir) => {
        val region = t(s, dir, "region")
        val nation = t(s, dir, "nation")
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val supp = t(s, dir, "supplier")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(supp, li("l_suppkey") === supp("s_suppkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey") &&
            cust("c_nationkey") === supp("s_nationkey"))
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

      // TPC-H Q6 flavor: fully-pushed selective scan + global agg.
      "q06_forecast_revenue" -> ((s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_items"))
      }),

      // Ranking window: top-3 orders per customer (deterministic tiebreak).
      "q08_window_topn" -> ((s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      }),

      // Running-frame window: cumulative spend per customer (exact decimal).
      "q09_window_running" -> ((s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_date"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast("double").as("cum_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      }),

      // ROLLUP super-aggregates (coalesced labels keep null-ordering portable).
      "q10_rollup" -> ((s, dir) => {
        val cust = t(s, dir, "customer")
        val nation = t(s, dir, "nation")
        cust.join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
          .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("n_cust"), col("total_bal"))
          .orderBy(col("nation"), col("segment"))
      }),

      // INTERSECT: customers that both placed an order and hold bal > 4000.
      "q11_intersect" -> ((s, dir) => {
        val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
        val b = t(s, dir, "customer").filter(col("c_acctbal") > 4000)
          .select(col("c_custkey").as("k"))
        a.intersect(b).orderBy(col("k"))
      }),

      // EXCEPT (anti set-op): customers with a filled order but no open one.
      "q12_except" -> ((s, dir) => {
        val ord = t(s, dir, "orders")
        val a = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        val b = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
        a.except(b).orderBy(col("k"))
      }),

      // CASE WHEN bucketing + conditional aggregation.
      "q13_case_buckets" -> ((s, dir) => {
        t(s, dir, "orders")
          .select(
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 150000, "medium")
              .otherwise("large").as("bucket"),
            col("o_orderstatus"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_filled"))
          .orderBy(col("bucket"))
      }),

      // Scalar subquery: parts above mean retail price (exact mean).
      "q14_scalar_subquery" -> ((s, dir) => {
        val part = t(s, dir, "part")
        val avgPrice = part.agg(
          (dsum(col("p_retailprice")) / count(lit(1))).as("m"))
        part.join(broadcast(avgPrice))
          .filter(col("p_retailprice") > col("m"))
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
          .orderBy(col("p_partkey"))
      }),

      // CTE + UNION ALL of two branches, re-aggregated.
      "q15_union_cte" -> ((s, dir) => {
        Tables.register(s, dir)
        s.sql("""
          WITH hi AS (SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS v
                      FROM orders WHERE o_totalprice >= 100000),
               lo AS (SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS v
                      FROM orders WHERE o_totalprice < 100000)
          SELECT k, CAST(sum(v) AS DOUBLE) AS spend, count(*) AS n
          FROM (SELECT * FROM hi UNION ALL SELECT * FROM lo)
          GROUP BY k HAVING count(*) >= 8 ORDER BY k""")
      }),

      // Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (no full sort).
      "q16_topk" -> ((s, dir) => {
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      }),

      // String function pack over part names.
      "q17_strings" -> ((s, dir) => {
        t(s, dir, "part")
          .filter(col("p_name").like("%re%"))
          .select(col("p_partkey"),
            upper(col("p_brand")).as("brand_uc"),
            length(col("p_name")).as("name_len"),
            substring(col("p_name"), 1, 4).as("name_pre"),
            concat_ws("#", col("p_type"), col("p_brand")).as("type_brand"))
          .orderBy(col("p_partkey"))
      }),

      // Date functions: month truncation + exact revenue by month.
      "q18_monthly_revenue" -> ((s, dir) => {
        t(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy(col("month"))
      }),

      // JSON extraction over the events.props payload column.
      "q19_json_extract" -> ((s, dir) => {
        t(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k_val")).as("k_sum"),
            min(col("k_val")).as("k_min"), max(col("k_val")).as("k_max"))
          .orderBy(col("event_type"))
      }),

      // Exact duplicate-group detection (hash groupBy dedup).
      "q20_dedup_exact" -> ((s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_orderkey")).as("first_order"), count(lit(1)).as("n_copies"))
          .filter(col("n_copies") >= 3)
          .orderBy(col("l_partkey"), col("l_suppkey"))
      })
    )

  // ---------------------------------------------------------------- oracle

  def oracleSql: Map[String, String] = coreOracle ++ EngineQueries.oracleSql

  private def coreOracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         sum(l_quantity)/count(*) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_quantity >= 48 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         ORDER BY l_orderkey, l_linenumber""",
    "q03_top_orders" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
         CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q04_priority_semi" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders WHERE EXISTS (
           SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_nation_revenue" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q06_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "q08_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders WHERE o_custkey < 200) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
         FROM orders WHERE o_custkey < 100
         ORDER BY o_custkey, o_orderkey""",
    "q10_rollup" ->
      """SELECT coalesce(n_name,'ALL') AS nation, coalesce(c_mktsegment,'ALL') AS segment,
         count(*) AS n_cust,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(n_name, c_mktsegment)
         ORDER BY nation, segment""",
    "q11_intersect" ->
      """SELECT o_custkey AS k FROM orders
         INTERSECT
         SELECT c_custkey AS k FROM customer WHERE c_acctbal > 4000
         ORDER BY k""",
    "q12_except" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
         ORDER BY k""",
    "q13_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket,
         count(*) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "q14_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         WHERE p_retailprice > (
           SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) FROM part)
         ORDER BY p_partkey""",
    "q15_union_cte" ->
      """WITH hi AS (SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS v
                     FROM orders WHERE o_totalprice >= 100000),
              lo AS (SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS v
                     FROM orders WHERE o_totalprice < 100000)
         SELECT k, CAST(sum(v) AS DOUBLE) AS spend, count(*) AS n
         FROM (SELECT * FROM hi UNION ALL SELECT * FROM lo) u
         GROUP BY k HAVING count(*) >= 8 ORDER BY k""",
    "q16_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q17_strings" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc, length(p_name) AS name_len,
         substring(p_name, 1, 4) AS name_pre,
         concat_ws('#', p_type, p_brand) AS type_brand
         FROM part WHERE p_name LIKE '%re%' ORDER BY p_partkey""",
    "q18_monthly_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY 1 ORDER BY month""",
    "q19_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS k_sum,
         CAST(min(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS k_min,
         CAST(max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS k_max
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q20_dedup_exact" ->
      """SELECT l_partkey, l_suppkey, CAST(min(l_orderkey) AS BIGINT) AS first_order,
         count(*) AS n_copies
         FROM lineitem GROUP BY l_partkey, l_suppkey HAVING count(*) >= 3
         ORDER BY l_partkey, l_suppkey"""
  )
}
