package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Hilbert index must actually BE a Hilbert curve — bijective over the
  * full cube and unit-step adjacent (those two properties are exactly what
  * clustering buys: every prefix range of the key is one connected tight
  * box) — and at k=2 must be bit-identical to the classic xy2d recurrence,
  * because that is the form the q139 DuckDB oracle replays.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the classic 2-D xy2d algorithm (public domain
    * formulation — per-level quadrant flip/swap), written against the
    * loop, not the Skilling transpose form under test.
    */
  private def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("bijective + unit-step adjacent on the full cube, k=2..4") {
    for ((k, bits) <- Seq((2, 5), (3, 3), (4, 2))) {
      val side = 1 << bits
      val total = math.pow(side.toDouble, k.toDouble).toLong.toInt
      val coordsOf = new Array[Array[Int]](total)
      def enum(c: Array[Int], dim: Int): Unit =
        if (dim == k) {
          val d = HilbertCurve.index(c, bits)
          assert(d >= 0 && d < total, s"k=$k out of range: $d")
          assert(coordsOf(d.toInt) == null, s"k=$k collision at $d")
          coordsOf(d.toInt) = c.clone()
        } else (0 until side).foreach { v => c(dim) = v; enum(c, dim + 1) }
      enum(new Array[Int](k), 0)
      (1 until total).foreach { d =>
        val step = (0 until k)
          .map(i => math.abs(coordsOf(d)(i) - coordsOf(d - 1)(i))).sum
        assert(step == 1, s"k=$k non-unit step at $d")
      }
    }
  }

  test("k=2 is bit-identical to the classic xy2d recurrence (oracle form)") {
    val n = 64 // the 6-bit bucket grid clustering actually runs on
    for (x <- 0 until n; y <- 0 until n)
      assert(HilbertCurve.index(Array(x, y), 6) == xy2d(n, x, y), s"($x,$y)")
  }

  test("out-of-range coordinates clamp (boundary order, no wraparound)") {
    assert(HilbertCurve.index(Array(99, 0), 6) ==
      HilbertCurve.index(Array(63, 0), 6))
    assert(HilbertCurve.index(Array(-5, 7), 6) ==
      HilbertCurve.index(Array(0, 7), 6))
  }

  test("expression: codegen and interpreted agree, null in → null out") {
    val df = spark.range(4096).select(
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))
    val got = df.select(col("x"), col("y"),
        HilbertIndex(6, Seq(col("x"), col("y"))).as("d"))
      .collect()
    got.foreach(r =>
      assert(r.getLong(2) == xy2d(64, r.getInt(0), r.getInt(1))))
    // interpreted path (eval) must agree with the codegen'd run above
    val e = HilbertIndex(6, Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(13),
      org.apache.spark.sql.catalyst.expressions.Literal(27)))
    assert(e.eval(null) == xy2d(64, 13, 27))
    val withNull = df.limit(1).select(
      HilbertIndex(6, Seq(lit(null).cast("int"), col("x"))).as("d")).head()
    assert(withNull.isNullAt(0))
  }

  test("hilbert_index SQL registration matches the Scala API and stays codegen'd") {
    val r = spark.sql(
      "SELECT hilbert_index(6, 13, 27) AS d, hilbert_index(4, 3, 5, 7) AS d3").head()
    assert(r.getLong(0) == xy2d(64, 13, 27))
    assert(r.getLong(1) == HilbertCurve.index(Array(3, 5, 7), 4))
    val df = spark.range(256).selectExpr(
      "hilbert_index(6, CAST(id % 64 AS INT), CAST(id / 64 AS INT)) AS d")
    assert(df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.collect().length == 256)
    intercept[Exception](spark.sql("SELECT hilbert_index(6)").head())
    // lossy coordinate types must FAIL ANALYSIS, not silently truncate to
    // a wrong curve position
    intercept[Exception](
      spark.sql("SELECT hilbert_index(6, CAST(1 AS BIGINT), 2)").head())
    intercept[Exception](
      spark.sql("SELECT hilbert_index(6, 1.5, 2)").head())
  }

  test("hilbert clustering tightens BOTH columns' per-partition ranges") {
    // 64x64 grid shuffled into 16 range partitions by hilbert key: each
    // partition must cover a far tighter (x, y) box than 1/16th of one
    // linear dimension would — the data-skipping story in miniature
    val df = spark.range(4096).select(
      (col("id") % 64).cast("int").as("x"),
      ((col("id") * 2654435761L) % 64).cast("int").as("y"))
    val keyed = df.withColumn("d", HilbertIndex(6, Seq(col("x"), col("y"))))
      .repartitionByRange(16, col("d"))
    val spans = keyed.mapPartitions { it =>
      val rows = it.toSeq
      if (rows.isEmpty) Iterator.empty
      else Iterator((
        rows.map(_.getInt(0)).max - rows.map(_.getInt(0)).min,
        rows.map(_.getInt(1)).max - rows.map(_.getInt(1)).min))
    }.collect()
    assert(spans.nonEmpty)
    // perfect quadrant split at 16 partitions is a 16x16 box (span 15); a
    // contiguous curve segment of length L fits an O(√L) box, so allow
    // boundary-straddling + sampling slack but stay far below the
    // unclustered span of 63 — and the average must be quadrant-tight
    spans.foreach { case (sx, sy) =>
      assert(sx <= 47 && sy <= 47, s"loose partition box: $sx x $sy")
    }
    val avg = spans.map { case (sx, sy) => (sx + sy) / 2.0 }.sum / spans.length
    assert(avg <= 24.0, s"average partition box span too loose: $avg")
  }
}
