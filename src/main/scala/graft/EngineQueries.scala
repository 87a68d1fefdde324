package graft

import graft.config._
import graft.functions.Text
import graft.ops.{Ann, Dedup, Multimodal}
import graft.run.{CollectingTracker, Runner}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Rounds 2-3 query surface: SQL-operator gap fillers (q07, q21-q28), the
  * LLM-data-pipeline operators over `documents`/`embeddings` (q29-q48),
  * exhaustive-probe exact twins of the pruned ANN configs (q57/q58),
  * quality scoring / incremental dedup / interval join (q59-q62), and
  * engine-executed pipelines (p01-p10) that push Runner/sources/
  * destinations/extensions through the DuckDB oracle gate.
  *
  * Exactness rules for oracle parity (same as SparkEntry): money sums go
  * through fixed-scale decimals; ratios that must filter exactly are compared
  * in integer arithmetic (or at thresholds where the double comparison is
  * provably equivalent, e.g. j >= 0.5); fp outputs are either exact copies,
  * IEEE-exact ops, or formulas mirrored operation-for-operation so both
  * engines round the same double.
  */
object EngineQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(spark, dir, name)

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Engine-run helper: quiet tracker, returns the final stage frame. */
  private def pipe(spark: SparkSession, aq: Aqueduct): DataFrame =
    Runner.run(spark, aq, new CollectingTracker).get

  private def tmp(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  // words of the lowercased text, identical construction on the oracle side
  private def docWords(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** q48's trained k-means centroids, captured when the query runs.
    * Verify dumps oracle_sql.json AFTER running every query, so the
    * dynamically-built q48 oracle embeds the exact centroids this run
    * assigned cells with; everything downstream of training (assignment,
    * probing, candidate generation, top-k) is then independently
    * re-derived by DuckDB. Falls back to the exhaustive brute-force form
    * when q48 never ran (nothing to compare in that case anyway).
    */
  @volatile private[graft] var q48CentroidsCaptured: Option[Array[Array[Double]]] = None

  /** q96's trained LR model, captured like the centroids above: the oracle
    * embeds the coefficients and re-derives features + sigmoid in DuckDB,
    * so everything downstream of LBFGS training is hash-checked.
    */
  @volatile private[graft] var q96ModelCaptured: Option[ops.Quality.LinearModel] = None

  /** q99's computed quota table, captured like the centroids/model above:
    * the quotas involve cross-libm pow() whose last ulp could flip a
    * floor(), so the oracle replays the captured integers rather than
    * re-deriving them.
    */
  @volatile private[graft] var q99QuotasCaptured: Option[Map[String, Long]] = None

  /** q105's trained PQ codebooks, captured like the IVF centroids: the
    * oracle embeds them and independently re-derives the per-block argmin
    * encode, the query distance tables, and the ADC ranking in DuckDB —
    * everything downstream of the per-block k-means fits is hash-checked.
    */
  @volatile private[graft] var q105CodebooksCaptured: Option[Array[Array[Array[Double]]]] = None

  /** q108's coarse centroids + residual codebooks, captured together: the
    * oracle replays cell assignment, residuals, residual encode, probe
    * ranking, residual LUTs, and the ADC sum — the full IVFADC pipeline
    * downstream of the two k-means fits — in DuckDB.
    */
  @volatile private[graft] var q108IvfPqCaptured:
    Option[(Array[Array[Double]], Array[Array[Array[Double]]])] = None

  /** q110's fitted PCA basis (mean + components), captured like the other
    * trained models: the oracle embeds them and re-derives the centered
    * projection per row in DuckDB.
    */
  @volatile private[graft] var q110PcaCaptured: Option[ops.Pca.PcaModel] = None

  // shortest-round-trip double literal: both JVM and DuckDB parse it back
  // to the identical bits, so embedded plane/centroid constants are exact
  private def dlit(d: Double): String =
    if (d == Math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  /** Unrolled DuckDB replay of BPE training (q94/q95): K merge iterations
    * as chained CTEs (recursive CTEs cannot aggregate over the recursive
    * table, so the fixed iteration count unrolls instead). Each iteration
    * counts adjacent pairs over the delimited-token strings, picks the
    * argmax (count desc, pair asc — the engine's tie-break), and applies
    * the merge with the same literal `replace` on the chr(31)-delimited
    * encoding, so DuckDB re-learns the merge table from the raw parquet
    * with zero constants captured from the engine.
    */
  private def bpeTrainCtes(k: Int): String = {
    val sep = "chr(31)"
    // double-separator boundaries (see LangModel.BpeBound): the merge
    // pattern consumes only the inner half of each outer boundary, making
    // replace() exactly the greedy left-to-right standard BPE merge
    val iters = (1 to k).map { i =>
      s"""t$i AS (SELECT list_filter(string_split(s, $sep), x -> x <> '') AS t, freq FROM v${i - 1}),
              p$i AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS n FROM (
                SELECT unnest(list_transform(range(1, len(t)), j -> [t[j], t[j+1]])) AS p, freq FROM t$i)
                GROUP BY 1, 2),
              b$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
              v$i AS MATERIALIZED (SELECT CASE WHEN b.a IS NULL THEN v.s
                       ELSE replace(v.s, $sep||b.a||$sep||$sep||b.b||$sep, $sep||b.a||b.b||$sep) END AS s,
                       v.freq
                     FROM v${i - 1} v LEFT JOIN b$i b ON TRUE)"""
    }.mkString(",\n              ")
    s"""w0 AS (SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                x -> len(x) > 0)) AS w FROM documents),
              v0 AS MATERIALIZED (SELECT $sep || $sep ||
                         list_aggregate(list_transform(string_split(w, ''),
                           c -> c || $sep || $sep), 'string_agg', '') AS s,
                       count(*) AS freq
                     FROM w0 GROUP BY w),
              $iters"""
  }

  private def bpeTrainOracleSql(k: Int): String = {
    val union = (1 to k)
      .map(i => s"SELECT $i AS rank, a, b, n FROM b$i")
      .mkString("\n              UNION ALL ")
    s"""WITH ${bpeTrainCtes(k)}
         SELECT rank, a, b, n FROM (
              $union)
         ORDER BY rank"""
  }

  private def bpeEncodeOracleSql(k: Int): String = {
    val sep = "chr(31)"
    val sepsep = s"$sep || $sep" // identity fallback: pattern = replacement
    val mcols = (1 to k).map { i =>
      s"""coalesce((SELECT $sep||a||$sep||$sep||b||$sep FROM b$i), $sepsep) AS pat$i,
                coalesce((SELECT $sep||a||b||$sep FROM b$i), $sepsep) AS rep$i"""
    }.mkString(",\n                ")
    val nested = (1 to k).foldLeft(
      s"$sep || $sep || list_aggregate(list_transform(string_split(w, ''), " +
        s"c -> c || $sep || $sep), 'string_agg', '')") {
      (acc, i) => s"replace($acc, m.pat$i, m.rep$i)"
    }
    s"""WITH ${bpeTrainCtes(k)},
              mrow AS (SELECT
                $mcols),
              docs0 AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> len(x) > 0) AS ws
                FROM documents WHERE doc_id < 100),
              encd AS (SELECT doc_id, flatten(list_transform(ws, w ->
                  list_filter(string_split($nested, $sep), x -> x <> ''))) AS tokens
                FROM docs0 CROSS JOIN mrow m)
         SELECT doc_id, CAST(len(tokens) AS INT) AS n_tokens,
                array_to_string(tokens, ' ') AS token_str
         FROM encd ORDER BY doc_id"""
  }

  /** DuckDB oracle for the LR quality classifier (q96): coefficients from
    * the captured model as literals; the hashed features (md5-fold bucket
    * per token, the q93 hex-parse trick) and sigmoid re-derived in SQL.
    * Sum order matches the native dot product (left-to-right); round(…, 6)
    * absorbs exp()'s last-ulp libm differences (the q93 ln precedent).
    */
  private def qualityOracleSql(m: ops.Quality.LinearModel, nDocs: Int): String = {
    val n = m.coefficients.length
    val coefs = m.coefficients.map(dlit).mkString(", ")
    s"""WITH d AS (SELECT doc_id,
                list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  x -> len(x) > 0) AS ws
              FROM documents WHERE doc_id < $nDocs),
              f AS (SELECT doc_id, list_transform(range(0, $n), i ->
                CAST(len(list_filter(ws, w ->
                  CAST(list_sum(list_transform(range(1, 9),
                    j -> (strpos('0123456789abcdef', substr(md5(w), j, 1)) - 1)
                         * power(16, 8 - j))) AS BIGINT) % $n = i)) AS DOUBLE)) AS x
              FROM d)
         SELECT doc_id,
           round(1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, ${n + 1}),
             i -> x[i] * ([$coefs])[i])) + ${dlit(m.intercept)}))), 6) AS quality_prob
         FROM f ORDER BY doc_id"""
  }

  /** DuckDB oracle for the PRUNED multi-probe LSH top-k (q36): embeds the
    * seeded hyperplanes as literals (algorithm parameters, like any
    * threshold) and independently recomputes corpus/query signatures, the
    * probe-bucket expansion, the candidate equi-join and the exact cosine
    * re-rank. Sign bits depend on exact dot products: plane literals are
    * shortest-round-trip doubles and both engines sum element-for-element
    * left-to-right, so signatures agree bit-for-bit.
    */
  private def lshOracleSql(
      m: Int, dim: Int, seed: Long, k: Int, probeDistance: Int): String = {
    val planes = Ann.hyperplanes(m, dim, seed)
    val planeRows = planes.zipWithIndex
      .map { case (p, j) => s"($j, [${p.map(dlit).mkString(", ")}])" }
      .mkString(",\n                ")
    val probeList = Ann.probeMasks(m, probeDistance)
      .map(mk => if (mk == 0L) "qsig" else s"xor(qsig, ${mk})")
      .mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              planes(j, p) AS (VALUES
                $planeRows),
              sigs AS (
                SELECT e.vec_id,
                  CAST(sum(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}),
                         i -> e.v[i] * pl.p[i])) >= 0
                       THEN 1::BIGINT << pl.j ELSE 0 END) AS BIGINT) AS sig
                FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
              corpus AS (SELECT e.vec_id AS item_id, e.v AS cv, s.sig AS bucket
                         FROM e JOIN sigs s ON e.vec_id = s.vec_id),
              probes AS (
                SELECT query_id, qv, unnest([$probeList]) AS bucket FROM (
                  SELECT e.vec_id AS query_id, e.v AS qv, s.sig AS qsig
                  FROM e JOIN sigs s ON e.vec_id = s.vec_id WHERE e.vec_id < 5)),
              cand AS (
                SELECT p.query_id, c.item_id,
                       list_cosine_similarity(c.cv, p.qv) AS cosr
                FROM corpus c JOIN probes p ON c.bucket = p.bucket),
              ranked AS (
                SELECT query_id, item_id, round(cosr, 6) AS cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosr DESC, item_id) AS rank
                FROM cand)
         SELECT query_id, rank, item_id, cos FROM ranked
         WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for the PRUNED IVF top-k (q48), built from the captured
    * centroids: re-derives every corpus vector's cell (argmin of the same
    * d2 = |v|^2 - 2 v.c + |c|^2 expression, |c|^2 embedded as the same
    * Scala-computed literal Spark used, ties to the lower cell), each
    * query's nprobe nearest cells, the cell equi-join and the exact cosine
    * top-k.
    */
  /** DuckDB replay of q105's PQ search from the captured codebooks: encode
    * every corpus vector (per-block argmin over `cc − 2·sv·c`, ties by
    * entry index — the engine's exact partial-score form), build each
    * query's per-block distance table (`svv − 2·sv·c + cc`), and rank by
    * the ADC sum. The per-block distances are summed through an ORDERED
    * list with explicit left-associated additions so both engines fold the
    * same doubles in the same order.
    */
  private def pqOracleSql(
      codebooks: Array[Array[Array[Double]]], k: Int): String = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val bookRows = codebooks.zipWithIndex.flatMap { case (book, b) =>
      book.zipWithIndex.map { case (c, j) =>
        s"($b, $j, [${c.map(dlit).mkString(", ")}], ${dlit(c.map(x => x * x).sum)})"
      }
    }.mkString(",\n                ")
    val blockSum = (1 to m).map(i => s"ll[$i]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              books(b, j, c, cc) AS (VALUES
                $bookRows),
              blocks AS (SELECT unnest(range(0, $m)) AS b),
              sub AS (
                SELECT e.vec_id, bs.b,
                       list_slice(e.v, bs.b * $dsub + 1, (bs.b + 1) * $dsub) AS sv
                FROM e CROSS JOIN blocks bs),
              scored AS (
                SELECT s.vec_id, s.b, bk.j,
                  bk.cc - 2 * list_sum(list_transform(range(1, ${dsub + 1}),
                    i -> s.sv[i] * bk.c[i])) AS sc
                FROM sub s JOIN books bk ON bk.b = s.b),
              codes AS (
                SELECT vec_id, b, j AS code FROM (
                  SELECT vec_id, b, j,
                    row_number() OVER (PARTITION BY vec_id, b ORDER BY sc, j) AS rn
                  FROM scored) WHERE rn = 1),
              qsub AS (
                SELECT vec_id AS query_id, b, sv,
                  list_sum(list_transform(range(1, ${dsub + 1}), i -> sv[i] * sv[i])) AS svv
                FROM sub WHERE vec_id < 5),
              lut AS (
                SELECT q.query_id, q.b, bk.j,
                  q.svv - 2 * list_sum(list_transform(range(1, ${dsub + 1}),
                    i -> q.sv[i] * bk.c[i])) + bk.cc AS d2
                FROM qsub q JOIN books bk ON bk.b = q.b),
              cand AS (
                SELECT l.query_id, c.vec_id AS item_id, c.b, l.d2
                FROM codes c JOIN lut l ON l.b = c.b AND l.j = c.code),
              tot AS (
                SELECT query_id, item_id, ll, $blockSum AS ad2 FROM (
                  SELECT query_id, item_id, list(d2 ORDER BY b) AS ll
                  FROM cand GROUP BY query_id, item_id)),
              ranked AS (
                SELECT query_id, item_id, round(ad2, 6) AS ad2,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY ad2, item_id) AS rank
                FROM tot)
         SELECT query_id, rank, item_id, ad2 FROM ranked
         WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** DuckDB replay of q108's IVFADC search from the captured coarse
    * centroids and residual codebooks — [[ivfOracleSql]]'s assignment/probe
    * stages fused with [[pqOracleSql]]'s encode/LUT/ADC stages, with the
    * residual subtraction in between. Every fp formula mirrors the engine
    * operation-for-operation (expanded-form distances, partial-score
    * argmin, ordered left-assoc block sum).
    */
  private def ivfPqOracleSql(
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      dim: Int, k: Int, nprobe: Int): String = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val centRows = centroids.zipWithIndex
      .map { case (c, i) =>
        s"($i, [${c.map(dlit).mkString(", ")}], ${dlit(c.map(x => x * x).sum)})"
      }
      .mkString(",\n                ")
    val bookRows = codebooks.zipWithIndex.flatMap { case (book, b) =>
      book.zipWithIndex.map { case (c, j) =>
        s"($b, $j, [${c.map(dlit).mkString(", ")}], ${dlit(c.map(x => x * x).sum)})"
      }
    }.mkString(",\n                ")
    val blockSum = (1 to m).map(i => s"ll[$i]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              cents(cell, c, cc) AS (VALUES
                $centRows),
              books(b, j, c, cc) AS (VALUES
                $bookRows),
              blocks AS (SELECT unnest(range(0, $m)) AS b),
              vv AS (SELECT vec_id, v,
                       list_sum(list_transform(range(1, ${dim + 1}), i -> v[i] * v[i])) AS vv
                     FROM e),
              cscored AS (
                SELECT vv.vec_id, vv.v, ct.cell,
                  vv.vv - 2 * list_sum(list_transform(range(1, ${dim + 1}),
                    i -> vv.v[i] * ct.c[i])) + ct.cc AS d2
                FROM vv CROSS JOIN cents ct),
              assign AS (
                SELECT vec_id, v, cell FROM (
                  SELECT vec_id, v, cell,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM cscored) WHERE rn = 1),
              rese AS (
                SELECT a.vec_id, a.cell,
                  list_transform(range(1, ${dim + 1}), i -> a.v[i] - ct.c[i]) AS rv
                FROM assign a JOIN cents ct ON ct.cell = a.cell),
              sub AS (
                SELECT r.vec_id, r.cell, bs.b,
                  list_slice(r.rv, bs.b * $dsub + 1, (bs.b + 1) * $dsub) AS sv
                FROM rese r CROSS JOIN blocks bs),
              scored AS (
                SELECT s.vec_id, s.cell, s.b, bk.j,
                  bk.cc - 2 * list_sum(list_transform(range(1, ${dsub + 1}),
                    i -> s.sv[i] * bk.c[i])) AS sc
                FROM sub s JOIN books bk ON bk.b = s.b),
              codes AS (
                SELECT vec_id, cell, b, j AS code FROM (
                  SELECT vec_id, cell, b, j,
                    row_number() OVER (PARTITION BY vec_id, b ORDER BY sc, j) AS rn
                  FROM scored) WHERE rn = 1),
              probes AS (
                SELECT vec_id AS query_id, v AS qv, cell FROM (
                  SELECT vec_id, v, cell,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM cscored WHERE vec_id < 5) WHERE rn <= $nprobe),
              qres AS (
                SELECT p.query_id, p.cell,
                  list_transform(range(1, ${dim + 1}), i -> p.qv[i] - ct.c[i]) AS qr
                FROM probes p JOIN cents ct ON ct.cell = p.cell),
              qsub0 AS (
                SELECT q.query_id, q.cell, bs.b,
                  list_slice(q.qr, bs.b * $dsub + 1, (bs.b + 1) * $dsub) AS sv
                FROM qres q CROSS JOIN blocks bs),
              qsub AS (
                SELECT query_id, cell, b, sv,
                  list_sum(list_transform(range(1, ${dsub + 1}), i -> sv[i] * sv[i])) AS svv
                FROM qsub0),
              lut AS (
                SELECT q.query_id, q.cell, q.b, bk.j,
                  q.svv - 2 * list_sum(list_transform(range(1, ${dsub + 1}),
                    i -> q.sv[i] * bk.c[i])) + bk.cc AS d2
                FROM qsub q JOIN books bk ON bk.b = q.b),
              cand AS (
                SELECT l.query_id, cd.vec_id AS item_id, cd.b, l.d2
                FROM codes cd JOIN lut l
                  ON l.cell = cd.cell AND l.b = cd.b AND l.j = cd.code),
              tot AS (
                SELECT query_id, item_id, ll, $blockSum AS ad2 FROM (
                  SELECT query_id, item_id, list(d2 ORDER BY b) AS ll
                  FROM cand GROUP BY query_id, item_id)),
              ranked AS (
                SELECT query_id, item_id, round(ad2, 6) AS ad2,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY ad2, item_id) AS rank
                FROM tot)
         SELECT query_id, rank, item_id, ad2 FROM ranked
         WHERE rank <= $k ORDER BY query_id, rank"""
  }

  private def ivfOracleSql(
      centroids: Array[Array[Double]], dim: Int, k: Int, nprobe: Int): String = {
    val centRows = centroids.zipWithIndex
      .map { case (c, i) =>
        s"($i, [${c.map(dlit).mkString(", ")}], ${dlit(c.map(x => x * x).sum)})"
      }
      .mkString(",\n                ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              cents(cell, c, cc) AS (VALUES
                $centRows),
              vv AS (SELECT vec_id, v,
                       list_sum(list_transform(range(1, ${dim + 1}), i -> v[i] * v[i])) AS vv
                     FROM e),
              scored AS (
                SELECT vv.vec_id, vv.v, ct.cell,
                  vv.vv - 2 * list_sum(list_transform(range(1, ${dim + 1}),
                    i -> vv.v[i] * ct.c[i])) + ct.cc AS d2
                FROM vv CROSS JOIN cents ct),
              assign AS (
                SELECT vec_id, v, cell FROM (
                  SELECT vec_id, v, cell,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM scored) WHERE rn = 1),
              probes AS (
                SELECT vec_id AS query_id, v AS qv, cell FROM (
                  SELECT vec_id, v, cell,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM scored WHERE vec_id < 5) WHERE rn <= $nprobe),
              cand AS (
                SELECT p.query_id, a.vec_id AS item_id,
                       list_cosine_similarity(a.v, p.qv) AS cosr
                FROM assign a JOIN probes p ON a.cell = p.cell),
              ranked AS (
                SELECT query_id, item_id, round(cosr, 6) AS cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosr DESC, item_id) AS rank
                FROM cand)
         SELECT query_id, rank, item_id, cos FROM ranked
         WHERE rank <= $k ORDER BY query_id, rank"""
  }

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // Left outer join: customers kept even with zero orders.
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

    // Exact cosine top-k: broadcast query set, single corpus scan.
    "q35_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      Ann.bruteTopK(emb, "vec_id", "v", queries, "qid", "qv", k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN with multi-probe + exact re-rank. Hash-checked even
    // though pruned: the oracle embeds the seeded hyperplanes as literals
    // and re-derives signatures, probe buckets and the re-rank in DuckDB.
    "q36_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      Ann.lshTopK(emb, "vec_id", "v", queries, "qid", "qv",
        k = 10, m = 12, dim = 64, probeDistance = 1)
        .orderBy(col("query_id"), col("rank"))
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

    // Embedding-cosine near-dup pairs, exhaustive-probe configuration
    // (probeDistance = m ⇒ every bucket probed, candidate generation is
    // complete): the output is exactly all pairs with cosine ≥ 0.35 and the
    // oracle hash-checks it. Round-2 verdict: the old threshold (0.95) had
    // EMPTY ground truth, so the rows-only check proved nothing. The pruned
    // scale path (probeDistance 1–2) is recall-asserted in OpsSpec.
    // Bounded to the first 500 vectors: exhaustive probing is inherently
    // quadratic, the right shape for a correctness gate but not a bench
    // surface — at oracle scale (sf0.01 = 500 vectors) the bound is a no-op.
    "q46_embed_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      ops.Ann.cosinePairs(emb, "vec_id", "v", threshold = 0.35,
          m = 6, dim = 64, probeDistance = 6)
        .orderBy(col("id_a"), col("id_b"))
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

    // IVF ANN, realistic pruned configuration: k-means cells + nprobe
    // probing + exact re-rank. The trained centroids are captured here and
    // embedded as literals in a dynamically-built oracle (Verify dumps
    // oracle_sql.json after the queries run), so DuckDB independently
    // re-derives cell assignment, probe selection, candidate generation
    // and the exact top-k — everything downstream of k-means training is
    // hash-checked, not rows-only.
    "q48_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val index = ops.Ann.ivfBuild(emb, "vec_id", "v", nlist = 16)
      q48CentroidsCaptured = Some(index.centroids)
      ops.Ann.ivfSearch(index, queries, "qid", "qv", k = 10, nprobe = 3)
        .orderBy(col("query_id"), col("rank"))
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

    // LSH top-k in exhaustive-probe mode (probeDistance = m ⇒ every bucket
    // probed): the signature/probe/re-rank machinery must reproduce brute
    // force exactly — hash-checked against the DuckDB cosine top-k oracle.
    // q36 keeps the realistic pruned configuration (recall asserted vs brute
    // force in OpsSpec); this entry pins the machinery's correctness.
    "q57_ann_lsh_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      Ann.lshTopK(emb, "vec_id", "v", queries, "qid", "qv",
        k = 10, m = 6, dim = 64, probeDistance = 6)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF index built ONCE and searched twice (two query batches over the
    // persisted cell-assigned corpus) — the amortized build/search split the
    // round-2 verdict asked for. Exhaustive nprobe = nlist makes each search
    // equal brute force, so the union is hash-checked exactly.
    "q58_ann_ivf_reuse" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val index = Ann.ivfBuild(emb, "vec_id", "v", nlist = 16)
      index.assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qa = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val qb = emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      Ann.ivfSearch(index, qa, "qid", "qv", k = 10, nprobe = 16)
        .unionByName(Ann.ivfSearch(index, qb, "qid", "qv", k = 10, nprobe = 16))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Composite document quality score (length sweet-spot, punctuation,
    // stopword density) — the formula is pure arithmetic over counts, so
    // DuckDB reproduces it exactly.
    "q59_quality_score" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
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

    // Character n-gram Jaccard near-dup — the tokenization-free dedup path
    // (CJK/code/URLs); same inverted-index machinery as q32, exact oracle.
    // Stride 4 (winnowing-style): ~L/4 shingles per doc instead of ~L keeps
    // the posting list tractable at any corpus size.
    "q63_char_jaccard" -> ((s, dir) => {
      Dedup.charJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 8, threshold = 0.5, stride = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Deterministic content-hash sampling: reproducible in any engine with
    // md5, stable under repartitioning, nested across fractions.
    "q64_deterministic_sample" -> ((s, dir) => {
      ops.Sampling.byContentHash(t(s, dir, "documents"), "text", 0.25)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

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

    // Overlapping token-window chunking (RAG / context-window prep): each
    // doc → windows of 40 tokens every 20, full coverage, no shuffle.
    "q69_token_windows" -> ((s, dir) => {
      ops.Packing.tokenWindows(t(s, dir, "documents"), "doc_id", "text",
          window = 40, stride = 20)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Symmetric int8 embedding quantization (serialized as CSV text so the
    // compare stays scalar): engine-portable floor(x+0.5) rounding.
    "q70_quantize_int8" -> ((s, dir) => {
      val q = ops.Ann.quantizeInt8(col("embedding"))
      t(s, dir, "embeddings")
        .select(col("vec_id"), q.as("qz"))
        .select(col("vec_id"),
          array_join(transform(col("qz.q"), x => x.cast("string")), ",").as("qvec"),
          round(col("qz.scale"), 6).as("scale"))
        .orderBy(col("vec_id"))
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

    // SemDeDup semantic dedup keep-list (cluster → within-cluster exact
    // cosine → components → keep-min-id): nlist = 1 makes candidate
    // generation exhaustive, so the oracle reproduces the full pipeline
    // exactly (all-pairs cosine + recursive-CTE closure). The clustered
    // scale path (nlist > 1, candidates pruned to Σ|cell|²) is
    // subset/recall-asserted in OpsSpec. Bounded to the first 1000 vectors:
    // the exhaustive gate is inherently quadratic (no-op at oracle scale).
    "q81_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      ops.Ann.semanticClusters(emb, "vec_id", "v", threshold = 0.35, nlist = 1)
        .select(col("vec_id"), col("component"), col("keep"))
        .orderBy(col("vec_id"))
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

    // BM25 topic scoring (targeted-domain selection): every doc scored
    // against a 3-term keyword list — term stats from one aggregate, score
    // arithmetic mirrored operation-for-operation by the oracle.
    "q89_bm25" -> ((s, dir) => {
      ops.Ranking.bm25(t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "table", "hash"))
        .select(col("doc_id"), col("doc_len"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("doc_id"))
    }),

    // Per-label embedding centroids (class prototypes): element-wise means
    // in long format. 4-dp rounding absorbs the sum-association fp noise
    // of a distributed mean (the q77 pattern).
    "q90_group_centroids" -> ((s, dir) => {
      ops.Ann.groupCentroids(t(s, dir, "embeddings"), "label", "embedding")
        .select(col("grp").as("label"), col("idx"), col("n"),
          round(col("mean_v"), 4).as("mean_v"))
        .orderBy(col("label"), col("idx"))
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

    // Temperature-scaled domain mixing (XLM-R/mT5 sampling rule): quotas
    // from the alpha-flattened language distribution, drawn as exact-k
    // deterministic hash samples. Oracle replays the captured quota table
    // and re-derives the rank and the cut in SQL.
    "q99_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      q99QuotasCaptured =
        Some(ops.Sampling.temperatureQuotas(docs, "lang", alpha = 0.5, budget = 300L))
      ops.Sampling.temperatureMix(docs, "doc_id", "text", "lang",
          alpha = 0.5, budget = 300L)
        .select(col("doc_id"), col("lang"), col("sample_rank"), col("mix_quota"))
        .orderBy(col("lang"), col("sample_rank"))
    }),

    // IVF index persisted to a managed table and RELOADED before searching —
    // the cross-job production shape (build once, search from any session).
    // Exhaustive nprobe = nlist makes the reloaded search equal brute force,
    // so the round-trip is hash-checked exactly; the assignment table is
    // hive-partitioned by cell so probed-cell scans prune directories.
    "q100_ann_ivf_persist" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val index = Ann.ivfBuild(emb, "vec_id", "v", nlist = 16)
      val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      Ann.ivfSave(index, root)
      val loaded = Ann.ivfLoad(s, root)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      Ann.ivfSearch(loaded, q, "qid", "qv", k = 10, nprobe = 16)
        .orderBy(col("query_id"), col("rank"))
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

    // Round-6 Delta surface end-to-end under the exact-oracle gate:
    // multiple small appends, a SCHEMA-WIDENING append (mergeSchema:
    // metaData re-emit, old files null-fill), a 2-column Z-order
    // compaction (Morton rewrite must move bytes, never rows), and a
    // stats-skipped readWhere — all through the engine-written,
    // engine-replayed protocol, checked against DuckDB on raw orders.
    "q102_delta_evolve" -> ((s, dir) => {
      import graft.destinations.DeltaWrite
      val tbl = tmp("graft-q102").resolve("tbl").toString
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val base = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      DeltaWrite.createIfAbsent(s, tbl,
        base.schema.asInstanceOf[org.apache.spark.sql.types.StructType])
      (0 until 4).foreach(i => DeltaWrite.append(s, tbl,
        base.filter(col("o_custkey") % 4 === i).repartition(1)))
      DeltaWrite.append(s, tbl,
        orders.filter(col("o_orderkey") % 3 === 1)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus")),
        mergeSchema = true)
      DeltaWrite.compact(s, tbl, targetFileBytes = 1L << 20,
        clusterBy = Seq("o_orderkey", "o_custkey"))
      graft.sources.DeltaLog.readWhere(s, tbl, "o_orderkey < 5000")
        .orderBy(col("o_orderkey"))
    }),

    // Merge-on-read DELETE: a DV-enabled Delta table built from orders,
    // two deletes (the second unions into existing per-file bitmaps), read
    // back through the DV-aware bridge with stats skipping. The Delta+DV
    // layer must be RESULT-invisible — the oracle recomputes the surviving
    // rows straight from raw orders.
    "q103_delta_dv" -> ((s, dir) => {
      import graft.destinations.DeltaWrite
      val tbl = tmp("graft-q103").resolve("tbl").toString
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val base = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      DeltaWrite.createIfAbsent(s, tbl,
        base.schema.asInstanceOf[org.apache.spark.sql.types.StructType],
        properties = Map("delta.enableDeletionVectors" -> "true"))
      (0 until 3).foreach(i => DeltaWrite.append(s, tbl,
        base.filter(col("o_custkey") % 3 === i).repartition(1)))
      DeltaWrite.delete(s, tbl, "o_orderstatus = 'F' AND o_custkey % 7 = 0")
      DeltaWrite.delete(s, tbl, "o_totalprice > 250000") // unions into DVs
      graft.sources.DeltaLog.readWhere(s, tbl, "o_orderkey < 8000")
        .orderBy(col("o_orderkey"))
    }),

    // Column-mapping mode `name` writes: mapped partitioned create, two
    // appends (the second evolves the schema, assigning a fresh mapped
    // column), a copy-on-write delete, and a partition-pruned read. The
    // mapping layer must be RESULT-invisible — the oracle recomputes from
    // raw customer.
    "q104_delta_mapped" -> ((s, dir) => {
      import graft.destinations.DeltaWrite
      val tbl = tmp("graft-q104").resolve("tbl").toString
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val narrow = cust.select(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_mktsegment"))
      DeltaWrite.createIfAbsent(s, tbl,
        narrow.schema.asInstanceOf[org.apache.spark.sql.types.StructType],
        partitionBy = Seq("c_mktsegment"), columnMapping = true)
      DeltaWrite.append(s, tbl, narrow.filter(col("c_custkey") % 2 === 0))
      DeltaWrite.append(s, tbl,
        cust.filter(col("c_custkey") % 2 === 1)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_mktsegment"), col("c_nationkey")),
        mergeSchema = true)
      DeltaWrite.delete(s, tbl, "c_acctbal < 0")
      graft.sources.DeltaLog.readWhere(s, tbl, "c_mktsegment = 'BUILDING'")
        .orderBy(col("c_custkey"))
    }),

    // Product quantization ANN (Jégou et al. 2011): per-block codebooks on
    // a deterministic sample, corpus encoded to m byte codes, asymmetric-
    // distance search via per-query lookup tables — the compressed-corpus
    // scale path (dim·4 bytes → m bytes per vector). Pure-ADC ranking here
    // so the oracle can replay encode + LUT + ranking from the captured
    // codebooks; recall-vs-brute and the exact re-rank path are ScalaTest-
    // gated (PQ is lossy by design, so brute force is not its oracle).
    "q105_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      // 16k training vectors = 1k per codebook entry — convergence needs a
      // few hundred; the bounded sample keeps build time flat at any SF
      val index = ops.Ann.pqTrain(emb, "vec_id", "v", m = 8, ksub = 16,
        maxTrainVectors = 16384)
      q105CodebooksCaptured = Some(index.codebooks)
      ops.Ann.pqSearch(index, queries, "qid", "qv", k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ (IVFADC): coarse cells route vectors, PQ encodes the residual
    // v − centroid(cell), queries probe 3 of 8 cells and ADC-score only
    // those cells' codes via an equi-join on cell — the production-scale
    // vector-search layout (probe fraction × 30× compression). Pure-ADC
    // output so DuckDB can replay the whole post-training pipeline.
    "q108_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val index = ops.Ann.ivfPqBuild(emb, "vec_id", "v", nlist = 8, m = 8,
        ksub = 16, maxTrainVectors = 16384)
      q108IvfPqCaptured = Some((index.centroids, index.codebooks))
      ops.Ann.ivfPqSearch(index, queries, "qid", "qv", k = 10, nprobe = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Delta change data feed end-to-end: create a CDF table, append (v1,
    // derived inserts — no cdc files by spec), upsert (v2, cdc files carry
    // exactly update_preimage/update_postimage/insert — copied-over
    // survivor rows must NOT surface), delete (v3, cdc delete rows), then
    // read the whole change stream. The oracle reconstructs the expected
    // change rows from the same deterministic operations in plain SQL.
    "q111_delta_cdf" -> ((s, dir) => {
      import graft.destinations.DeltaWrite
      val tbl = tmp("graft-q111").resolve("tbl").toString
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      DeltaWrite.createIfAbsent(s, tbl,
        orders.schema.asInstanceOf[org.apache.spark.sql.types.StructType],
        properties = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaWrite.append(s, tbl, orders.filter(col("o_orderkey") < 4000))
      val up = orders.filter(col("o_orderkey") < 1000)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        .unionByName(orders.filter(col("o_orderkey") >= 4000 && col("o_orderkey") < 5000))
      DeltaWrite.upsert(s, tbl, up, Seq("o_orderkey"))
      DeltaWrite.delete(s, tbl, "o_orderkey % 10 = 0")
      graft.sources.DeltaLog.readCdf(s, tbl, 0L)
        .select(col("o_orderkey"), col("o_totalprice"), col("_change_type"),
          col("_commit_version"))
        .orderBy(col("_commit_version"), col("o_orderkey"), col("_change_type"))
    }),

    // Distributed PCA: one O(d²)-state covariance pass fits the basis, the
    // projection is k codegen'd literal-axis dots over a centered column —
    // scan-local at any corpus size (embedding whitening / dimension
    // reduction ahead of ANN or PQ). Long (vec_id, j, pc) output so every
    // component score is hash-gated.
    "q110_pca_project" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = ops.Pca.fit(emb, "embedding", k = 8)
      q110PcaCaptured = Some(model)
      emb.filter(col("vec_id") < 100)
        .withColumn("cv", ops.Pca.center(col("embedding"), model))
        .select(col("vec_id"),
          posexplode(ops.Pca.projectCentered(col("cv"), model)).as(Seq("j", "pc")))
        .select(col("vec_id"), col("j"), round(col("pc"), 6).as("pc"))
        .orderBy(col("vec_id"), col("j"))
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

    // ------------------------------------------- engine-executed pipelines

    // Parquet source → chained stages → (no destination) result.
    "p01_pipeline_agg" -> ((s, dir) => {
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p1_orders", ParquetFormat(),
          Location(s"$dir/orders.parquet"))),
        stages = Seq(
          Seq(Stage("p1_filtered",
            "SELECT o_custkey, o_totalprice, o_orderstatus FROM p1_orders WHERE o_totalprice > 50000")),
          Seq(Stage("p1_result",
            """SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
               FROM p1_filtered GROUP BY o_orderstatus ORDER BY o_orderstatus""")))))
    }),

    // Concurrent stage group + FULL OUTER join of the two branches.
    "p02_pipeline_parallel" -> ((s, dir) => {
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p2_orders", ParquetFormat(),
          Location(s"$dir/orders.parquet"))),
        stages = Seq(
          Seq(
            Stage("p2_hi",
              "SELECT o_custkey, count(*) AS n_hi FROM p2_orders WHERE o_totalprice >= 150000 GROUP BY o_custkey"),
            Stage("p2_lo",
              "SELECT o_custkey, count(*) AS n_lo FROM p2_orders WHERE o_totalprice < 150000 GROUP BY o_custkey")),
          Seq(Stage("p2_result",
            """SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
               coalesce(a.n_hi, 0) AS n_hi, coalesce(b.n_lo, 0) AS n_lo
               FROM p2_hi a FULL OUTER JOIN p2_lo b ON a.o_custkey = b.o_custkey
               ORDER BY o_custkey""")))))
    }),

    // File destination: hive-partitioned parquet written by the engine, read
    // back for the oracle compare.
    "p03_pipeline_filedest" -> ((s, dir) => {
      val out = tmp("graft-p03").resolve("out").toString
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p3_orders", ParquetFormat(),
          Location(s"$dir/orders.parquet"))),
        stages = Seq(Seq(Stage("p3_sel",
          "SELECT o_orderstatus, o_orderkey, o_totalprice FROM p3_orders WHERE o_orderkey < 2000"))),
        destination = Some(FileDestination("p3_out", Location(out), ParquetDestFormat(),
          singleFile = false, partitionColumns = Seq("o_orderstatus")))))
      s.read.parquet(out)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Managed-table destination: create+append then keyed upsert (engine
    // write modes end-to-end), final table state checked against the oracle.
    "p04_pipeline_upsert" -> ((s, dir) => {
      val tbl = Location(tmp("graft-p04").resolve("tbl").toString)
      val schema = Seq(
        Types.FieldSpec("o_orderkey", LongType),
        Types.FieldSpec("o_custkey", LongType),
        Types.FieldSpec("o_totalprice", DoubleType))
      val src = FileSource("p4_orders", ParquetFormat(), Location(s"$dir/orders.parquet"))
      pipe(s, Aqueduct(
        sources = Seq(src),
        stages = Seq(Seq(Stage("p4_initial",
          "SELECT o_orderkey, o_custkey, o_totalprice FROM p4_orders WHERE o_orderkey % 3 = 0"))),
        destination = Some(ManagedTableDestination("p4_tbl", tbl, TableAppend, schema = schema))))
      pipe(s, Aqueduct(
        sources = Seq(src),
        stages = Seq(Seq(Stage("p4_updates",
          "SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice FROM p4_orders WHERE o_orderkey % 2 = 0"))),
        destination = Some(ManagedTableDestination("p4_tbl", tbl,
          TableUpsert(Seq("o_orderkey")), schema = schema))))
      graft.destinations.ManagedTable.read(s, tbl).orderBy(col("o_orderkey"))
    }),

    // Managed-table replace: predicate-scoped delete + insert on a
    // hive-partitioned table.
    "p05_pipeline_replace" -> ((s, dir) => {
      val tbl = Location(tmp("graft-p05").resolve("tbl").toString)
      val schema = Seq(
        Types.FieldSpec("o_orderkey", LongType),
        Types.FieldSpec("o_orderstatus", StringType),
        Types.FieldSpec("o_totalprice", DoubleType))
      val src = FileSource("p5_orders", ParquetFormat(), Location(s"$dir/orders.parquet"))
      pipe(s, Aqueduct(
        sources = Seq(src),
        stages = Seq(Seq(Stage("p5_all",
          "SELECT o_orderkey, o_orderstatus, o_totalprice FROM p5_orders"))),
        destination = Some(ManagedTableDestination("p5_tbl", tbl, TableAppend,
          partitionColumns = Seq("o_orderstatus"), schema = schema))))
      pipe(s, Aqueduct(
        sources = Seq(src),
        stages = Seq(Seq(Stage("p5_repl",
          """SELECT o_orderkey, o_orderstatus, CAST(0.0 AS DOUBLE) AS o_totalprice
             FROM p5_orders WHERE o_orderstatus = 'F' AND o_orderkey < 500"""))),
        destination = Some(ManagedTableDestination("p5_tbl", tbl,
          TableReplace(Seq(ReplaceCondition("o_orderstatus", "F"))),
          partitionColumns = Seq("o_orderstatus"), schema = schema))))
      graft.destinations.ManagedTable.read(s, tbl).orderBy(col("o_orderkey"))
    }),

    // ${param} templating through the YAML front door.
    "p06_pipeline_template" -> ((s, dir) => {
      val yaml =
        """version: "v2"
          |sources:
          |  - type: file
          |    name: tpl_lineitem
          |    format: { type: parquet }
          |    location: ${sf_dir}/lineitem.parquet
          |stages:
          |  - - name: p6_result
          |      query: >
          |        SELECT l_returnflag, count(*) AS n
          |        FROM tpl_lineitem WHERE l_quantity >= ${min_qty}
          |        GROUP BY l_returnflag ORDER BY l_returnflag
          |""".stripMargin
      val aq = ConfigParser.fromYaml(yaml, Map("sf_dir" -> dir, "min_qty" -> "30"))
      pipe(s, aq)
    }),

    // Reference-style JSON operators in stage SQL: `->` / `->>` are
    // text-rewritten to json_get/json_as_text (SqlRewrite), mirroring the
    // datafusion-functions-json operator planner the reference registers.
    "p07_pipeline_json_ops" -> ((s, dir) => {
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p7_events", ParquetFormat(),
          Location(s"$dir/events.parquet"))),
        stages = Seq(Seq(Stage("p7_result",
          """SELECT event_type, count(*) AS n,
             CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
             max(props->'k') AS k_json
             FROM p7_events GROUP BY event_type ORDER BY event_type""")))))
    }),

    // CSV file source with declared schema through the engine front door
    // (S2 through the oracle gate): the fixture is generated from
    // orders.parquet, so DuckDB checks the same rows via parquet.
    "p08_pipeline_csv" -> ((s, dir) => {
      val csvDir = tmp("graft-p08").resolve("csv").toString
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
      val schema = Seq(
        Types.FieldSpec("o_orderkey", LongType),
        Types.FieldSpec("o_custkey", LongType),
        Types.FieldSpec("o_orderstatus", StringType),
        Types.FieldSpec("o_totalprice", DoubleType))
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p8_orders",
          CsvFormat(hasHeader = true, schema = schema), Location(csvDir))),
        stages = Seq(Seq(Stage("p8_result",
          """SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             FROM p8_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")))))
    }),

    // Hive-partitioned directory source with typed partition columns (S5
    // through the oracle gate); the stage's partition filter prunes at
    // planning time (plan-asserted in ScaleSpec).
    // Vector math through the engine front door: the extension-registered
    // native dot_product in declarative stage SQL (float input coerced).
    "p11_pipeline_vector" -> ((s, dir) => {
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p11_emb", ParquetFormat(),
          Location(s"$dir/embeddings.parquet"))),
        stages = Seq(Seq(Stage("p11_result",
          """SELECT vec_id, round(dot_product(embedding, embedding), 6) AS self_dot
             FROM p11_emb WHERE vec_id < 100 ORDER BY vec_id""")))))
    }),

    // Text-prep pipeline using the extension-registered native function in
    // declarative stage SQL (word_shingles via GraftExtensions): per-doc
    // features then a per-language dedup/shingle summary — the LLM-pipeline
    // shape expressed entirely through the engine front door.
    "p10_pipeline_textprep" -> ((s, dir) => {
      pipe(s, Aqueduct(
        sources = Seq(FileSource("tp_docs", ParquetFormat(),
          Location(s"$dir/documents.parquet"))),
        stages = Seq(
          Seq(Stage("tp_feat",
            """SELECT doc_id, lang, md5(text) AS digest,
               size(word_shingles(lower(text), 3)) AS n_shingles
               FROM tp_docs""")),
          Seq(Stage("tp_result",
            """SELECT lang, count(*) AS n_docs,
               count(DISTINCT digest) AS n_unique,
               CAST(sum(n_shingles) AS BIGINT) AS total_shingles
               FROM tp_feat GROUP BY lang ORDER BY lang""")))))
    }),

    // Declarative text-curation pipeline over the extension SQL functions
    // (quality_score / lang_id / token_count / dup_word_ratio are the same
    // native-expression implementations the Scala API uses).
    "p12_pipeline_curation" -> ((s, dir) => {
      pipe(s, Aqueduct(
        sources = Seq(FileSource("pc_docs", ParquetFormat(),
          Location(s"$dir/documents.parquet"))),
        stages = Seq(
          Seq(Stage("pc_scored",
            """SELECT doc_id, lang_id(text) AS lid, quality_score(text) AS q,
               token_count(text) AS tok, dup_word_ratio(text) AS rep
               FROM pc_docs""")),
          Seq(Stage("pc_result",
            """SELECT lid, count(*) AS n_docs,
               floor(avg(q) * 1000000 + 0.5) / 1000000 AS avg_quality,
               CAST(sum(tok) AS BIGINT) AS total_tokens,
               floor(avg(rep) * 1000000 + 0.5) / 1000000 AS avg_rep
               FROM pc_scored WHERE q >= 0.5 GROUP BY lid ORDER BY lid""")))))
    }),

    // The round's SQL-facing additions through the engine front door:
    // nfc_normalize (GraftExtensions) in one stage, the approx_top_terms
    // SpaceSaving aggregate (Runner-registered UDAF) in the next —
    // capacity ≫ vocabulary, so the oracle compares exact counts.
    "p13_pipeline_stats" -> ((s, dir) => {
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p13_docs", ParquetFormat(),
          Location(s"$dir/documents.parquet"))),
        stages = Seq(
          Seq(Stage("p13_words",
            """SELECT lang, explode(filter(split(trim(nfc_normalize(text)), '\\s+'),
               x -> length(x) > 0)) AS word
               FROM p13_docs""")),
          Seq(Stage("p13_result",
            """SELECT lang, word, n, CAST(rank AS BIGINT) AS rank FROM (
                 SELECT lang, h.term AS word, h.count AS n,
                   row_number() OVER (PARTITION BY lang ORDER BY h.count DESC, h.term) AS rank
                 FROM (SELECT lang, explode(approx_top_terms(word)) AS h
                       FROM p13_words GROUP BY lang))
               WHERE rank <= 10 ORDER BY lang, rank""")))))
    }),

    "p09_pipeline_dirsource" -> ((s, dir) => {
      val dirRoot = tmp("graft-p09").resolve("orders_dir").toString
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dirRoot)
      pipe(s, Aqueduct(
        sources = Seq(DirSource("p9_orders", ParquetFormat(), Location(dirRoot),
          partitionColumns = Seq("o_orderstatus" -> StringType))),
        stages = Seq(Seq(Stage("p9_result",
          """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             FROM p9_orders WHERE o_orderstatus = 'F' AND o_custkey < 500
             ORDER BY o_orderkey""")))))
    }),

    // REAL Delta protocol end-to-end: `format: delta_log` creates an actual
    // `_delta_log` table (hive-partitioned), the second pipeline MERGEs into
    // it through the Delta write path, and the result is read back through
    // the independent read bridge — engine-written log, engine-replayed log,
    // oracle-checked final state.
    "p14_pipeline_delta" -> ((s, dir) => {
      val tbl = tmp("graft-p14").resolve("tbl").toString
      val schema = Seq(
        Types.FieldSpec("o_orderkey", LongType),
        Types.FieldSpec("o_custkey", LongType),
        Types.FieldSpec("o_totalprice", DoubleType),
        Types.FieldSpec("o_orderstatus", StringType))
      val src = FileSource("p14_orders", ParquetFormat(), Location(s"$dir/orders.parquet"))
      def dest(mode: TableWriteMode) = ManagedTableDestination("p14_tbl",
        Location(tbl), mode, partitionColumns = Seq("o_orderstatus"),
        tableProperties = Map("format" -> "delta_log"), schema = schema)
      pipe(s, Aqueduct(
        sources = Seq(src),
        stages = Seq(Seq(Stage("p14_initial",
          """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             FROM p14_orders WHERE o_orderkey % 3 = 0"""))),
        destination = Some(dest(TableAppend))))
      pipe(s, Aqueduct(
        sources = Seq(src),
        stages = Seq(Seq(Stage("p14_updates",
          """SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
             FROM p14_orders WHERE o_orderkey % 2 = 0"""))),
        destination = Some(dest(TableUpsert(Seq("o_orderkey"))))))
      require(graft.sources.DeltaLog.isDeltaTable(s, tbl), "p14 target is not a real Delta table")
      graft.sources.DeltaLog.read(s, tbl)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // ORC round-trip through the engine front door (beyond reference: the
    // reference reads only CSV/JSONL/Parquet, sources/mod.rs:224-299; ORC is
    // native to spark-sql so lakehouse estates holding ORC ingest with zero
    // extra deps). Pipeline 1 writes a projected lineitem slice to a
    // hive-partitioned ORC destination; pipeline 2 reads it back as a typed
    // directory source and aggregates. DuckDB cannot read ORC, so the
    // oracle computes the same aggregate from the original parquet — a
    // valid gate because the round trip must be lossless.
    "p15_pipeline_orc" -> ((s, dir) => {
      val out = tmp("graft-p15").resolve("out").toString
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p15_li", ParquetFormat(),
          Location(s"$dir/lineitem.parquet"))),
        stages = Seq(Seq(Stage("p15_sel",
          """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice
             FROM p15_li WHERE l_orderkey < 5000"""))),
        destination = Some(FileDestination("p15_out", Location(out),
          OrcDestFormat(Map("compression" -> "zlib")),
          singleFile = false, partitionColumns = Seq("l_returnflag")))))
      pipe(s, Aqueduct(
        sources = Seq(DirSource("p15_orc", OrcFormat(), Location(out),
          partitionColumns = Seq("l_returnflag" -> StringType))),
        stages = Seq(Seq(Stage("p15_result",
          """SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             FROM p15_orc GROUP BY l_returnflag ORDER BY l_returnflag""")))))
    }),

    // Avro round-trip through the engine front door (beyond reference, and
    // beyond the build's own jars: spark-avro is absent, so the engine's
    // Hadoop-format bridge in sources/Avro.scala does the container IO).
    // Pipeline 1 writes an orders slice to an Avro destination; pipeline 2
    // reads it back and aggregates. DuckDB reads no Avro here, so the
    // oracle aggregates the same slice from the source parquet — the gate
    // passes only if the Avro round trip is lossless (incl. the timestamp
    // column surviving micros logical-type encoding).
    "p16_pipeline_avro" -> ((s, dir) => {
      val out = tmp("graft-p16").resolve("out").toString
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p16_orders", ParquetFormat(),
          Location(s"$dir/orders.parquet"))),
        stages = Seq(Seq(Stage("p16_sel",
          """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
             FROM p16_orders WHERE o_orderkey < 4000"""))),
        destination = Some(FileDestination("p16_out", Location(out),
          AvroDestFormat(codec = Some("deflate")), singleFile = false))))
      pipe(s, Aqueduct(
        sources = Seq(FileSource("p16_avro", AvroFormat(), Location(out))),
        stages = Seq(Seq(Stage("p16_result",
          """SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             CAST(min(o_orderdate) AS DATE) AS first_date,
             CAST(max(o_orderdate) AS DATE) AS last_date
             FROM p16_avro GROUP BY o_orderstatus ORDER BY o_orderstatus""")))))
    }),

    // Blocklist phrase filtering: one Aho–Corasick scan per document
    // (functions/MatchExprs) instead of one contains() pass per pattern —
    // the automaton rides to executors as a single reference object, so a
    // 10k-phrase blocklist stays a single corpus pass with no join. The
    // oracle replays the same pattern list with per-pattern contains() in
    // DuckDB (same result, the quadratic form this replaces).
    "q112_blocklist" -> ((s, dir) => {
      val phrases = EngineQueries.blocklistPhrases
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.MultiContains(col("text"), phrases).as("m"))
        .filter(size(col("m")) > 0)
        // joined string, not array<string>: the oracle hash compare is
        // scalar-typed (no other gated query emits arrays)
        .select(col("doc_id"), array_join(col("m"), "|").as("matched"),
          size(col("m")).as("n_matched"))
        .orderBy(col("doc_id"))
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
        rows_out AS (
          SELECT source, exact_distinct,
            abs(hll_sketch_estimate(sk) - exact_distinct)
              <= 0.02 * exact_distinct AS est_within_2pct
          FROM per_source
          UNION ALL
          SELECT '__total__',
            (SELECT count(DISTINCT doc_id) FROM documents),
            abs(hll_sketch_estimate(hll_union_agg(sk))
                - (SELECT count(DISTINCT doc_id) FROM documents))
              <= 0.02 * (SELECT count(DISTINCT doc_id) FROM documents)
          FROM per_source)
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

  /** Deterministic blocklist for q112 — phrases over the synthetic corpus
    * vocabulary, incl. overlapping ones so suffix-link matching is
    * exercised at the gate. */
  private[graft] val blocklistPhrases: Seq[String] = Seq(
    "hash value table", "fast merge batch", "the line sort",
    "value table part", "table part a", "key agg row",
    "row scan slow", "slow fast table", "spark a a",
    "scan slow fast", "a row fast", "batch part value",
    // shorter, denser phrases: overlap with the 3-word ones above so the
    // automaton's suffix links fire on real rows
    "hash value", "merge batch", "line sort", "scan slow", "spark shuffle")

  def oracleSql: Map[String, String] = Map(
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
    "q24_word_topk" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word FROM documents) w
         WHERE length(word) > 2
         GROUP BY word ORDER BY n DESC, word LIMIT 25""",
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
    "q35_ann_brute" ->
      """WITH c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
              q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5)
         SELECT query_id, rank, item_id, cos FROM (
           SELECT query_id, item_id,
             round(list_cosine_similarity(cv, qv), 6) AS cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY list_cosine_similarity(cv, qv) DESC, item_id) AS rank
           FROM c CROSS JOIN q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // exact oracle for the PRUNED multi-probe config: DuckDB recomputes
    // signatures from the embedded hyperplanes and replays probe + re-rank
    "q36_ann_lsh" -> lshOracleSql(m = 12, dim = 64, seed = 42L, k = 10, probeDistance = 1),
    // exact oracle downstream of k-means: centroids captured from the run
    // (fallback only used when q48 never ran, so nothing compares against it)
    "q48_ann_ivf" -> q48CentroidsCaptured
      .map(c => ivfOracleSql(c, dim = 64, k = 10, nprobe = 3))
      .getOrElse(
        """SELECT NULL AS query_id, NULL AS rank, NULL AS item_id, NULL AS cos
           WHERE FALSE"""),
    "q105_ann_pq" -> q105CodebooksCaptured
      .map(b => pqOracleSql(b, k = 10))
      .getOrElse(
        """SELECT NULL AS query_id, NULL AS rank, NULL AS item_id, NULL AS ad2
           WHERE FALSE"""),
    "q108_ann_ivfpq" -> q108IvfPqCaptured
      .map { case (cents, books) =>
        ivfPqOracleSql(cents, books, dim = 64, k = 10, nprobe = 3) }
      .getOrElse(
        """SELECT NULL AS query_id, NULL AS rank, NULL AS item_id, NULL AS ad2
           WHERE FALSE"""),
    // the expected change stream reconstructed from the same deterministic
    // operations: v1 inserts, v2 pre/post images + inserts, v3 deletes
    // over the v2 table state
    "q111_delta_cdf" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
           v1 AS (SELECT o_orderkey, o_totalprice, 'insert' AS _change_type,
                    CAST(1 AS BIGINT) AS _commit_version
                  FROM base WHERE o_orderkey < 4000),
           v2pre AS (SELECT o_orderkey, o_totalprice, 'update_preimage',
                    CAST(2 AS BIGINT) FROM base WHERE o_orderkey < 1000),
           v2post AS (SELECT o_orderkey, o_totalprice + 1.0, 'update_postimage',
                    CAST(2 AS BIGINT) FROM base WHERE o_orderkey < 1000),
           v2ins AS (SELECT o_orderkey, o_totalprice, 'insert',
                    CAST(2 AS BIGINT) FROM base
                    WHERE o_orderkey >= 4000 AND o_orderkey < 5000),
           state2 AS (SELECT o_orderkey,
                    CASE WHEN o_orderkey < 1000 THEN o_totalprice + 1.0
                         ELSE o_totalprice END AS o_totalprice
                  FROM base WHERE o_orderkey < 5000),
           v3 AS (SELECT o_orderkey, o_totalprice, 'delete',
                    CAST(3 AS BIGINT) FROM state2 WHERE o_orderkey % 10 = 0)
         SELECT * FROM (
           SELECT * FROM v1 UNION ALL SELECT * FROM v2pre
           UNION ALL SELECT * FROM v2post UNION ALL SELECT * FROM v2ins
           UNION ALL SELECT * FROM v3)
         ORDER BY _commit_version, o_orderkey, _change_type""",
    "q110_pca_project" -> q110PcaCaptured
      .map { m =>
        val dim = m.dim
        val meanLit = s"[${m.mean.map(dlit).mkString(", ")}]"
        val compRows = m.components.zipWithIndex
          .map { case (w, j) => s"($j, [${w.map(dlit).mkString(", ")}])" }
          .mkString(",\n                ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings WHERE vec_id < 100),
                mean(mv) AS (VALUES ($meanLit)),
                comps(j, w) AS (VALUES
                  $compRows),
                c AS (SELECT vec_id,
                        list_transform(range(1, ${dim + 1}), i -> e.v[i] - m.mv[i]) AS cv
                      FROM e CROSS JOIN mean m)
           SELECT c.vec_id, cp.j,
             round(list_sum(list_transform(range(1, ${dim + 1}),
               i -> c.cv[i] * cp.w[i])), 6) AS pc
           FROM c CROSS JOIN comps cp
           ORDER BY vec_id, j"""
      }
      .getOrElse("SELECT NULL AS vec_id, NULL AS j, NULL AS pc WHERE FALSE"),
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
    "q96_quality_classifier" -> q96ModelCaptured
      .map(m => qualityOracleSql(m, nDocs = 200))
      .getOrElse(
        """SELECT NULL AS doc_id, NULL AS quality_prob WHERE FALSE"""),
    "q99_temperature_mix" -> q99QuotasCaptured
      .map { qs =>
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
    "q94_bpe_train" -> bpeTrainOracleSql(20),
    "q95_bpe_encode" -> bpeEncodeOracleSql(20),
    "q27_approx_agg" ->
      """SELECT TRUE AS parts_within_5pct,
                count(DISTINCT l_partkey) AS exact_parts,
                TRUE AS median_within_1,
                quantile_cont(l_quantity, 0.5) AS median_qty,
                count(*) AS n_rows
         FROM lineitem""",
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
    "q38_multimodal" ->
      """SELECT doc_id, 'text/utf-8' AS format,
         octet_length(encode(text)) AS n_bytes,
         greatest(octet_length(encode(text)) - 256, 0) // 128 + 1 AS n_frames,
         md5(text) AS content_hash
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
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
    // exhaustive probing ⇒ complete candidate generation ⇒ exactly the
    // cosine >= 0.35 pair set
    "q46_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                    WHERE vec_id < 500)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_cosine_similarity(a.v, b.v), 6) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.v, b.v) >= 0.35
         ORDER BY id_a, id_b""",
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
    // exhaustive probing ⇒ LSH equals brute force exactly (same oracle as q35)
    "q57_ann_lsh_exhaustive" ->
      """WITH c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
              q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5)
         SELECT query_id, rank, item_id, cos FROM (
           SELECT query_id, item_id,
             round(list_cosine_similarity(cv, qv), 6) AS cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY list_cosine_similarity(cv, qv) DESC, item_id) AS rank
           FROM c CROSS JOIN q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // nprobe = nlist ⇒ each IVF search equals brute force; two query batches
    "q58_ann_ivf_reuse" ->
      """WITH c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
              q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10)
         SELECT query_id, rank, item_id, cos FROM (
           SELECT query_id, item_id,
             round(list_cosine_similarity(cv, qv), 6) AS cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY list_cosine_similarity(cv, qv) DESC, item_id) AS rank
           FROM c CROSS JOIN q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // the Delta layer under test must be RESULT-invisible: the oracle
    // recomputes the final state straight from raw orders
    "q102_delta_evolve" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
         CASE WHEN o_orderkey % 3 = 1 THEN o_orderstatus END AS o_orderstatus
         FROM orders
         WHERE (o_orderkey % 3 = 0 OR o_orderkey % 3 = 1) AND o_orderkey < 5000
         ORDER BY o_orderkey""",
    // the DV delete layer is result-invisible: surviving rows recomputed
    // from raw orders with the deletes as complement predicates
    "q103_delta_dv" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
         FROM orders
         WHERE o_orderkey % 2 = 0
           AND NOT (o_orderstatus = 'F' AND o_custkey % 7 = 0)
           AND NOT (o_totalprice > 250000)
           AND o_orderkey < 8000
         ORDER BY o_orderkey""",
    // the column-mapping layer is result-invisible: the evolved column is
    // present exactly for the second append's rows
    "q104_delta_mapped" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         CASE WHEN c_custkey % 2 = 1 THEN c_nationkey END AS c_nationkey
         FROM customer
         WHERE NOT (c_acctbal < 0) AND c_mktsegment = 'BUILDING'
         ORDER BY c_custkey""",
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
    // reloaded exhaustive IVF == brute force (the q57/q58 oracle shape)
    "q100_ann_ivf_persist" ->
      """WITH c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
              q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5)
         SELECT query_id, rank, item_id, cos FROM (
           SELECT query_id, item_id,
             round(list_cosine_similarity(cv, qv), 6) AS cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY list_cosine_similarity(cv, qv) DESC, item_id) AS rank
           FROM c CROSS JOIN q) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
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
    // cutoff = 0.25 × 16^32 in hex; md5 hex strings of equal length compare
    // lexicographically as numbers
    "q64_deterministic_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE md5(text) < '40000000000000000000000000000000'
         ORDER BY doc_id""",
    "p11_pipeline_vector" ->
      """SELECT vec_id,
         round(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 6) AS self_dot
         FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""",
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
    "q68_domain_mix" ->
      """SELECT doc_id, source, lang FROM documents
         WHERE md5(text) < CASE
           WHEN source = 'src0' THEN '80000000000000000000000000000000'
           WHEN source = 'src1' THEN '40000000000000000000000000000000'
           ELSE '19999999999999999999999999999999' END
         ORDER BY doc_id""",
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
    // exhaustive candidate generation (nlist = 1) ⇒ the pair set is exactly
    // all cosine >= 0.35 pairs; the closure + keep-min-id labeling is then
    // engine-independent
    "q81_semantic_dedup" ->
      """WITH RECURSIVE emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
           WHERE vec_id < 1000),
         pairs AS (
           SELECT a.vec_id AS u, b.vec_id AS w
           FROM emb a JOIN emb b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.vec, b.vec) >= 0.35),
         sym AS (SELECT u, w FROM pairs UNION SELECT w AS u, u AS w FROM pairs),
         reach(node, r) AS (
           SELECT vec_id, vec_id FROM emb
           UNION
           SELECT s.w, reach.r FROM reach JOIN sym s ON s.u = reach.node),
         lab AS (SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS component
                 FROM reach GROUP BY node)
         SELECT vec_id, component, (vec_id = component) AS keep
         FROM lab ORDER BY vec_id""",
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
    // count(embedding[i]) (non-null elements), not count(*): mirrors the
    // engine's per-dimension null filter so ragged/null vectors can't
    // diverge; range bound 65 = the fixture's dim 64 + 1
    "q90_group_centroids" ->
      """SELECT label, CAST(i - 1 AS INT) AS idx, count(embedding[i]) AS n,
           round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS mean_v
         FROM embeddings, range(1, 65) t(i)
         GROUP BY label, i ORDER BY label, idx""",
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
    "p13_pipeline_stats" ->
      """WITH w AS (
           SELECT lang,
             unnest(list_filter(string_split_regex(trim(nfc_normalize(text)), '\s+'),
               x -> len(x) > 0)) AS word
           FROM documents),
         c AS (SELECT lang, word, count(*) AS n FROM w GROUP BY lang, word),
         r AS (SELECT lang, word, n,
                 row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rank
               FROM c)
         SELECT lang, word, n, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 10 ORDER BY lang, rank""",
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
    "q85_group_sample" ->
      """WITH r AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS sample_rank
           FROM documents)
         SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
         FROM r WHERE sample_rank <= 10 ORDER BY lang, sample_rank""",
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
         FROM c ORDER BY doc_id, chunk_idx""",
    "q70_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         s AS (SELECT vec_id, v,
                 coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) AS ma
               FROM e),
         q AS (SELECT vec_id, v,
                 CASE WHEN ma > 0 THEN 127.0 / ma ELSE 0.0 END AS sc
               FROM s)
         SELECT vec_id,
           array_to_string(list_transform(v,
             x -> CAST(greatest(-127, least(127, floor(x * sc + 0.5))) AS INT)), ',') AS qvec,
           round(sc, 6) AS scale
         FROM q ORDER BY vec_id""",
    "p01_pipeline_agg" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders WHERE o_totalprice > 50000
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "p02_pipeline_parallel" ->
      """WITH hi AS (SELECT o_custkey, count(*) AS n_hi FROM orders WHERE o_totalprice >= 150000 GROUP BY o_custkey),
              lo AS (SELECT o_custkey, count(*) AS n_lo FROM orders WHERE o_totalprice < 150000 GROUP BY o_custkey)
         SELECT coalesce(hi.o_custkey, lo.o_custkey) AS o_custkey,
                coalesce(hi.n_hi, 0) AS n_hi, coalesce(lo.n_lo, 0) AS n_lo
         FROM hi FULL OUTER JOIN lo ON hi.o_custkey = lo.o_custkey
         ORDER BY o_custkey""",
    "p03_pipeline_filedest" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderkey < 2000 ORDER BY o_orderkey""",
    "p04_pipeline_upsert" ->
      """SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
         FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 2 = 0
         ORDER BY o_orderkey""",
    "p05_pipeline_replace" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'F'
         UNION ALL
         SELECT o_orderkey, o_orderstatus, 0.0 AS o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_orderkey < 500
         ORDER BY o_orderkey""",
    "p06_pipeline_template" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         WHERE l_quantity >= 30 GROUP BY l_returnflag ORDER BY l_returnflag""",
    "p07_pipeline_json_ops" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
         max(CAST(json_extract(props, '$.k') AS VARCHAR)) AS k_json
         FROM events GROUP BY event_type ORDER BY event_type""",
    "p08_pipeline_csv" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "p09_pipeline_dirsource" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
         WHERE o_orderstatus = 'F' AND o_custkey < 500 ORDER BY o_orderkey""",
    "p14_pipeline_delta" ->
      """SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
         FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 2 = 0
         ORDER BY o_orderkey""",
    "p15_pipeline_orc" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem WHERE l_orderkey < 5000
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q112_blocklist" -> {
      val lits = blocklistPhrases.map(p => s"'${p.replace("'", "''")}'").mkString(", ")
      s"""SELECT doc_id,
            array_to_string(list_filter([$lits], p -> contains(text, p)), '|') AS matched,
            CAST(len(list_filter([$lits], p -> contains(text, p))) AS INT) AS n_matched
          FROM documents
          WHERE len(list_filter([$lits], p -> contains(text, p))) > 0
          ORDER BY doc_id"""
    },
    "q118_salted_join" ->
      """SELECT l_suppkey AS suppkey, s_name, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY l_suppkey, s_name ORDER BY suppkey""",
    "q117_editdist_join" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         FROM part a JOIN part b
           ON a.p_partkey < b.p_partkey
          AND abs(length(a.p_name) - length(b.p_name)) <= 1
          AND levenshtein(a.p_name, b.p_name) <= 1
         WHERE a.p_partkey % 8 = 0 AND b.p_partkey % 8 = 0
         ORDER BY id_a, id_b""",
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
         ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""",
    "p16_pipeline_avro" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         CAST(min(o_orderdate) AS DATE) AS first_date,
         CAST(max(o_orderdate) AS DATE) AS last_date
         FROM orders WHERE o_orderkey < 4000
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "p12_pipeline_curation" ->
      """WITH s AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks,
             list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS ltoks,
             len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
             greatest(length(text), 1) AS n_chars
           FROM documents),
         h AS (
           SELECT doc_id, len(toks) AS n_tok, n_punct, n_chars,
             len(list_distinct(toks)) AS n_dist,
             len(list_filter(ltoks, w -> w IN ('the','and','of','to','in','is','that','for','with','was'))) AS h_en,
             len(list_filter(ltoks, w -> w IN ('der','die','und','das','ist','nicht','ein','mit','für','von'))) AS h_de,
             len(list_filter(ltoks, w -> w IN ('el','la','los','que','de','en','es','por','con','para'))) AS h_es,
             len(list_filter(ltoks, w -> w IN ('le','la','les','et','des','est','pour','dans','une','que'))) AS h_fr,
             len(list_filter(ltoks, w -> w IN ('the','and','of','to','in','is','that','for','with','was',
                        'der','die','und','das','ist','nicht','ein','mit','für','von',
                        'le','la','les','et','des','est','pour','dans','une','que',
                        'el','los','de','en','es','por','con','para'))) AS n_stop
           FROM s),
         c AS (
           SELECT doc_id,
             CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_fr = greatest(h_en, h_de, h_es, h_fr) THEN 'fr'
                  WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                  WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                  ELSE 'de' END AS lid,
             floor((least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
               + (1.0 - least((CAST(n_punct AS DOUBLE) / n_chars) * 4.0, 1.0)) * 0.3
               + least((CAST(n_stop AS DOUBLE) / greatest(n_tok, 1)) * 5.0, 1.0) * 0.3)
               * 10000 + 0.5) / 10000 AS q,
             n_tok AS tok,
             CASE WHEN n_tok <= 0 THEN 0.0
                  ELSE 1.0 - CAST(n_dist AS DOUBLE) / n_tok END AS rep
           FROM h)
         SELECT lid, count(*) AS n_docs,
                floor(avg(q) * 1000000 + 0.5) / 1000000 AS avg_quality,
                CAST(sum(tok) AS BIGINT) AS total_tokens,
                floor(avg(rep) * 1000000 + 0.5) / 1000000 AS avg_rep
         FROM c WHERE q >= 0.5 GROUP BY lid ORDER BY lid""",
    "p10_pipeline_textprep" ->
      """WITH w AS (
           SELECT doc_id, lang, md5(text) AS digest,
                  string_split_regex(trim(lower(text)), '\s+') AS ws
           FROM documents),
         f AS (
           SELECT doc_id, lang, digest,
             len(list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS n_shingles
           FROM w)
         SELECT lang, count(*) AS n_docs, count(DISTINCT digest) AS n_unique,
                CAST(sum(n_shingles) AS BIGINT) AS total_shingles
         FROM f GROUP BY lang ORDER BY lang"""
  )
}
