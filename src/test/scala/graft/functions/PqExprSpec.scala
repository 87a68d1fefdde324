package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PQ/IVF natives replaced composed forms (`least(struct(dot…))`,
  * `array(least(…))`, `zip_with` residual, per-block LUT columns) that the
  * DuckDB oracles replay — so each test here checks bit-for-bit parity with
  * the composed formulation, plus the edge semantics (ties, NaN, nulls) the
  * composed forms defined.
  */
class PqExprSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val cents: Array[Array[Double]] =
    Array.fill(5)(Array.fill(8)(rnd.nextGaussian()))
  private val books: Array[Array[Array[Double]]] =
    Array.fill(4)(Array.fill(6)(Array.fill(2)(rnd.nextGaussian())))

  /** The original composed cell-distance argmin, for parity checks. */
  private def composedCell(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val vv = DotProduct(vec, vec)
    least(cents.zipWithIndex.map { case (c, i) =>
      val cArr = array(c.toIndexedSeq.map(lit): _*)
      struct((vv - lit(2.0) * DotProduct(vec, cArr) + lit(c.map(x => x * x).sum)).as("d2"),
        lit(i).as("cell"))
    }.toIndexedSeq: _*).getField("cell")
  }

  test("NearestCell matches the composed least(struct(dot…)) argmin bit-for-bit") {
    val rows = (1 to 300).map(_ => Tuple1(Seq.fill(8)(rnd.nextGaussian())))
    val df = rows.toDF("v")
    val r = df.select(
      NearestCell(col("v"), cents).as("native"),
      composedCell(col("v").cast("array<double>")).as("composed")).collect()
    assert(r.forall(x => x.getInt(0) == x.getInt(1)))
  }

  test("NearestCell ties go to the lower cell; null element poisons") {
    val dup = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val r = Seq(Tuple1(Seq(1.0, 0.0))).toDF("v")
      .select(NearestCell(col("v"), dup)).head()
    assert(r.getInt(0) == 0) // cells 0 and 2 tie at distance 0 → lower wins
    val n = spark.sql("SELECT 1").select(
      NearestCell(lit(null).cast("array<double>"), dup)).head()
    assert(n.isNullAt(0))
  }

  test("NearestCells returns cells ordered by (distance, cell) and caps at n") {
    val df = Seq(Tuple1(Seq.fill(8)(0.5))).toDF("v")
    val all = df.select(NearestCells(col("v"), cents, 5)).head().getSeq[Int](0)
    assert(all.length == 5 && all.toSet == (0 until 5).toSet)
    // prefix property: top-2 is the first 2 of the full ranking
    val top2 = df.select(NearestCells(col("v"), cents, 2)).head().getSeq[Int](0)
    assert(top2 == all.take(2))
    // ranking agrees with the argmin
    val best = df.select(NearestCell(col("v"), cents)).head().getInt(0)
    assert(all.head == best)
  }

  test("SubtractCentroid equals the zip_with formulation; bad cell → null") {
    val df = (1 to 50).map(i => (Seq.fill(8)(rnd.nextGaussian()), i % 5)).toDF("v", "cell")
    val centArr = array(cents.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)
    val r = df.select(
      SubtractCentroid(col("v"), col("cell"), cents).as("native"),
      zip_with(col("v").cast("array<double>"), element_at(centArr, col("cell") + 1),
        (a, b) => a - b).as("hof")).collect()
    assert(r.forall(x => x.getSeq[Double](0) == x.getSeq[Double](1)))
    val bad = Seq((Seq(1.0), 9)).toDF("v", "cell")
      .select(SubtractCentroid(col("v"), col("cell"), cents)).head()
    assert(bad.isNullAt(0))
  }

  test("PqEncode matches the composed per-block partial-score argmin bit-for-bit") {
    val dsub = books.head.head.length
    def composedCode(vec: org.apache.spark.sql.Column) =
      array(books.zipWithIndex.map { case (book, b) =>
        val sv = slice(vec, b * dsub + 1, dsub)
        least(book.zipWithIndex.map { case (c, j) =>
          val cArr = array(c.toIndexedSeq.map(lit): _*)
          struct((lit(c.map(x => x * x).sum) - lit(2.0) * DotProduct(sv, cArr)).as("s"),
            lit(j).as("j"))
        }.toIndexedSeq: _*).getField("j")
      }.toIndexedSeq: _*)
    val df = (1 to 200).map(_ => Tuple1(Seq.fill(8)(rnd.nextGaussian()))).toDF("v")
    val r = df.select(
      PqEncode(col("v"), books).as("native"),
      composedCode(col("v").cast("array<double>")).as("composed")).collect()
    assert(r.forall(x => x.getSeq[Int](0) == x.getSeq[Int](1)))
  }

  test("PqAdcLuts + AdcScore reproduce the composed LUT columns and left-assoc sum") {
    val dsub = books.head.head.length
    val m = books.length
    def composedLut(vec: org.apache.spark.sql.Column, b: Int) = {
      val sv = slice(vec, b * dsub + 1, dsub)
      val svv = DotProduct(sv, sv)
      array(books(b).toIndexedSeq.map { c =>
        val cArr = array(c.toIndexedSeq.map(lit): _*)
        svv - lit(2.0) * DotProduct(sv, cArr) + lit(c.map(x => x * x).sum)
      }: _*)
    }
    val df = (1 to 100).map(_ => Tuple1(Seq.fill(8)(rnd.nextGaussian()))).toDF("v")
      .withColumn("code", PqEncode(col("v"), books))
      .withColumn("lut", PqAdcLuts(col("v"), books))
    val r = df.select(
      AdcScore(col("code"), col("lut")).as("native"),
      (0 until m).map(b => element_at(composedLut(col("v").cast("array<double>"), b),
        element_at(col("code"), b + 1) + 1)).reduceLeft(_ + _).as("composed")).collect()
    assert(r.forall(x => x.getDouble(0) == x.getDouble(1)))
  }

  test("fitKMeansLocal: deterministic, k centers, empty-cluster reseed, n<=k pad") {
    val pts = Array.tabulate(100)(i => Array(i % 10 * 1.0, i / 10 * 1.0))
    val a = graft.ops.Ann.fitKMeansLocal(pts, 4, seed = 11L)
    val b = graft.ops.Ann.fitKMeansLocal(pts, 4, seed = 11L)
    assert(a.length == 4 && a.zip(b).forall { case (x, y) => x.sameElements(y) })
    // clustered data: every center lands inside the data's bounding box
    assert(a.forall(c => c.forall(x => x >= 0.0 && x <= 9.0)))
    // n <= k pads deterministically (duplicate centers are legal)
    val tiny = graft.ops.Ann.fitKMeansLocal(Array(Array(1.0), Array(2.0)), 5, 3L)
    assert(tiny.length == 5 && tiny.forall(c => c(0) == 1.0 || c(0) == 2.0))
    // k distinct tight clusters are recovered exactly
    val sep = Array.tabulate(90)(i => Array((i % 3) * 100.0 + (i % 5) * 0.01))
    val cs = graft.ops.Ann.fitKMeansLocal(sep, 3, 42L).map(_(0)).sorted
    assert(cs.zip(Seq(0.0, 100.0, 200.0)).forall { case (c, t) => math.abs(c - t) < 1.0 })
  }
}
