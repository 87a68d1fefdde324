package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expressions for the IVF / PQ vector-index hot path.
  *
  * The composed forms (`least(struct(dot…))` per centroid, `array(least(…))`
  * per PQ block, `slice`+`dot` per codebook entry) are semantically right but
  * generate expression trees with one literal sub-tree per centroid/entry —
  * at nlist 8 / m 8 / ksub 16 that is megabytes of plan, multi-MiB task
  * binaries, and generated methods big enough to fall out of JIT/codegen
  * budgets. Each expression here carries its constant matrix as one plain
  * JVM object (shipped via `addReferenceObj`, a few KB) and evaluates in a
  * tight loop.
  *
  * Arithmetic is replicated OPERATION-FOR-OPERATION from the composed forms
  * (and therefore from the DuckDB oracle replays built against them):
  *   - cell distance:    `(vv − 2.0·Σ v_i·c_i) + cc`, `vv = Σ v_i²`
  *   - PQ block score:   `cc − 2.0·Σ sv_i·c_i` (partial form; sub-norm
  *                       constant within a block, so ordering is unchanged)
  *   - ADC table entry:  `(svv − 2.0·Σ sv_i·c_i) + cc`, `svv = Σ sv_i²`
  *   - ADC row score:    left-associated `lut_0[c_0] + lut_1[c_1] + …`
  * with every Σ folding left-to-right, every `cc` computed driver-side as
  * `c.map(x => x*x).sum`, ties broken toward the lower index with the same
  * NaN-largest / `==`-first double comparison Spark's orderings use, and any
  * null element poisoning the result to NULL.
  */
object PqUtil {
  /** Spark's SQLOrderingUtil.compareDoubles semantics: `==` first (so
    * -0.0 == 0.0), else java.lang.Double.compare (NaN largest). */
  private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  private def toArr(v: ArrayData, expect: Int): Array[Double] = {
    if (v.numElements() != expect) return null
    val out = new Array[Double](expect)
    var i = 0
    while (i < expect) {
      if (v.isNullAt(i)) return null
      out(i) = v.getDouble(i)
      i += 1
    }
    out
  }

  /** Scores of `v` against every centroid in the expanded form
    * `(vv − 2·v·c) + cc`; null on dim mismatch / null element. */
  private def cellScores(
      v: ArrayData, cents: Array[Array[Double]], ccs: Array[Double]): Array[Double] = {
    val dim = cents(0).length
    val arr = toArr(v, dim)
    if (arr == null) return null
    var vv = 0.0
    var i = 0
    while (i < dim) { vv += arr(i) * arr(i); i += 1 }
    val scores = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var s = 0.0
      i = 0
      while (i < dim) { s += arr(i) * c(i); i += 1 }
      scores(j) = (vv - 2.0 * s) + ccs(j)
      j += 1
    }
    scores
  }

  def nearestCell(v: ArrayData, cents: Array[Array[Double]], ccs: Array[Double]): Any = {
    val scores = cellScores(v, cents, ccs)
    if (scores == null) return null
    var best = 0
    var j = 1
    while (j < scores.length) {
      if (cmp(scores(j), scores(best)) < 0) best = j
      j += 1
    }
    Integer.valueOf(best)
  }

  def nearestCells(
      v: ArrayData, cents: Array[Array[Double]], ccs: Array[Double], n: Int): Any = {
    val scores = cellScores(v, cents, ccs)
    if (scores == null) return null
    val idx = Array.tabulate[Integer](scores.length)(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = cmp(scores(a), scores(b))
        if (c != 0) c else a.compareTo(b)
      }
    })
    val take = math.min(n, idx.length)
    val out = new Array[Int](take)
    var i = 0
    while (i < take) { out(i) = idx(i); i += 1 }
    new GenericArrayData(out)
  }

  def subtractCentroid(v: ArrayData, cell: Int, cents: Array[Array[Double]]): Any = {
    if (cell < 0 || cell >= cents.length) return null
    val c = cents(cell)
    val arr = toArr(v, c.length)
    if (arr == null) return null
    var i = 0
    while (i < arr.length) { arr(i) -= c(i); i += 1 }
    new GenericArrayData(arr)
  }

  def pqEncode(
      v: ArrayData, books: Array[Array[Array[Double]]],
      ccs: Array[Array[Double]]): Any = {
    val m = books.length
    val dsub = books(0)(0).length
    val arr = toArr(v, m * dsub)
    if (arr == null) return null
    val code = new Array[Int](m)
    var b = 0
    while (b < m) {
      val book = books(b)
      val cc = ccs(b)
      val base = b * dsub
      var best = 0
      var bestScore = Double.NaN
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var s = 0.0
        var i = 0
        while (i < dsub) { s += arr(base + i) * c(i); i += 1 }
        val score = cc(j) - 2.0 * s
        if (j == 0 || cmp(score, bestScore) < 0) { best = j; bestScore = score }
        j += 1
      }
      code(b) = best
      b += 1
    }
    new GenericArrayData(code)
  }

  def pqAdcLuts(
      v: ArrayData, books: Array[Array[Array[Double]]],
      ccs: Array[Array[Double]]): Any = {
    val m = books.length
    val dsub = books(0)(0).length
    val arr = toArr(v, m * dsub)
    if (arr == null) return null
    val luts = new Array[Any](m)
    var b = 0
    while (b < m) {
      val book = books(b)
      val cc = ccs(b)
      val base = b * dsub
      var svv = 0.0
      var i = 0
      while (i < dsub) { svv += arr(base + i) * arr(base + i); i += 1 }
      val lut = new Array[Double](book.length)
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var s = 0.0
        i = 0
        while (i < dsub) { s += arr(base + i) * c(i); i += 1 }
        lut(j) = (svv - 2.0 * s) + cc(j)
        j += 1
      }
      luts(b) = new GenericArrayData(lut)
      b += 1
    }
    new GenericArrayData(luts)
  }

  def adcScore(code: ArrayData, luts: ArrayData): Any = {
    val m = code.numElements()
    if (luts.numElements() != m || m == 0) return null
    var acc = 0.0
    var b = 0
    while (b < m) {
      if (code.isNullAt(b) || luts.isNullAt(b)) return null
      val lut = luts.getArray(b)
      val j = code.getInt(b)
      if (j < 0 || j >= lut.numElements() || lut.isNullAt(j)) return null
      // left-associated sum starting FROM the first element (reduceLeft
      // parity: the b=0 term is the seed, not added to 0.0)
      if (b == 0) acc = lut.getDouble(j) else acc += lut.getDouble(j)
      b += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Squared-norm literals `c.map(x => x*x).sum` per centroid, the exact
    * driver-side fold the composed form embedded as `lit(...)`. */
  def norms2(cents: Array[Array[Double]]): Array[Double] =
    cents.map(c => c.map(x => x * x).sum)
  def norms2(books: Array[Array[Array[Double]]]): Array[Array[Double]] =
    books.map(norms2)
}

private[functions] trait VecArrayInput { self: Expression =>
  def checkVec(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects an array<double> input, got ${other.catalogString}")
  }
}

/** `nearest_cell(v)`: argmin cell of `v` against the captured centroid
  * matrix (ties to the lower cell). */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression with VecArrayInput {
  private val ccs = PqUtil.norms2(centroids)
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, prettyName)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"
  override def nullSafeEval(v: Any): Any =
    PqUtil.nearestCell(v.asInstanceOf[ArrayData], centroids, ccs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("cellResult")
      s"""
         |Object $r = graft.functions.PqUtil.nearestCell($a, $cRef, $nRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $r).intValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    GraftShims.column(NearestCell(
      GraftShims.expression(v.cast("array<double>")), centroids))
}

/** `nearest_cells(v, n)`: the `n` nearest cells ordered by (distance, cell)
  * — the query-side probe ranking. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], n: Int)
  extends UnaryExpression with VecArrayInput {
  private val ccs = PqUtil.norms2(centroids)
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"
  override def nullSafeEval(v: Any): Any =
    PqUtil.nearestCells(v.asInstanceOf[ArrayData], centroids, ccs, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("cellsResult")
      s"""
         |Object $r = graft.functions.PqUtil.nearestCells($a, $cRef, $nRef, $n);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def apply(v: Column, centroids: Array[Array[Double]], n: Int): Column =
    GraftShims.column(NearestCells(
      GraftShims.expression(v.cast("array<double>")), centroids, n))
}

/** `subtract_centroid(v, cell)`: `v − centroid(cell)` element-wise — the
  * IVF-PQ residual. */
case class SubtractCentroid(left: Expression, right: Expression,
    centroids: Array[Array[Double]])
  extends BinaryExpression with VecArrayInput {
  override def checkInputDataTypes(): TypeCheckResult = {
    val v = checkVec(left.dataType, prettyName)
    if (v != TypeCheckResult.TypeCheckSuccess) v
    else right.dataType match {
      case IntegerType | NullType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an int cell, got ${dt.catalogString}")
    }
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "subtract_centroid"
  override def nullSafeEval(v: Any, cell: Any): Any =
    PqUtil.subtractCentroid(
      v.asInstanceOf[ArrayData], cell.asInstanceOf[Int], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val r = ctx.freshName("residResult")
      s"""
         |Object $r = graft.functions.PqUtil.subtractCentroid($a, $c, $cRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubtractCentroid =
    copy(left = newLeft, right = newRight)
}

object SubtractCentroid {
  def apply(v: Column, cell: Column, centroids: Array[Array[Double]]): Column =
    GraftShims.column(SubtractCentroid(
      GraftShims.expression(v.cast("array<double>")),
      GraftShims.expression(cell), centroids))
}

/** `pq_encode(v)`: per-block argmin codes against the captured codebooks
  * (partial-score form, ties to the lower entry). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with VecArrayInput {
  private val ccs = PqUtil.norms2(codebooks)
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(v: Any): Any =
    PqUtil.pqEncode(v.asInstanceOf[ArrayData], codebooks, ccs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val nRef = ctx.addReferenceObj("ccs", ccs, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("codeResult")
      s"""
         |Object $r = graft.functions.PqUtil.pqEncode($a, $bRef, $nRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftShims.column(PqEncode(
      GraftShims.expression(v.cast("array<double>")), codebooks))
}

/** `pq_adc_luts(v)`: the query-side ADC distance tables, one `ksub`-entry
  * array per block, as `array<array<double>>`. */
case class PqAdcLuts(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with VecArrayInput {
  private val ccs = PqUtil.norms2(codebooks)
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, prettyName)
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_luts"
  override def nullSafeEval(v: Any): Any =
    PqUtil.pqAdcLuts(v.asInstanceOf[ArrayData], codebooks, ccs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val nRef = ctx.addReferenceObj("ccs", ccs, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("lutResult")
      s"""
         |Object $r = graft.functions.PqUtil.pqAdcLuts($a, $bRef, $nRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcLuts =
    copy(child = newChild)
}

object PqAdcLuts {
  def apply(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftShims.column(PqAdcLuts(
      GraftShims.expression(v.cast("array<double>")), codebooks))
}

/** `adc_score(code, luts)`: `luts[0][code[0]] + … + luts[m-1][code[m-1]]`,
  * left-associated in block order. */
case class AdcScore(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _) | NullType,
          ArrayType(ArrayType(DoubleType, _), _) | NullType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_score expects (array<int>, array<array<double>>), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"
  override def nullSafeEval(code: Any, luts: Any): Any =
    PqUtil.adcScore(code.asInstanceOf[ArrayData], luts.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val r = ctx.freshName("adcResult")
      s"""
         |Object $r = graft.functions.PqUtil.adcScore($c, $l);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  def apply(code: Column, luts: Column): Column =
    GraftShims.column(AdcScore(
      GraftShims.expression(code), GraftShims.expression(luts)))
}
