package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)

  test("DotProduct is bit-identical to the interpreted HOF formulation") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map(_ => (Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val r = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    // exact double equality: same left-to-right summation order
    assert(r.forall(x => x.getDouble(0) == x.getDouble(1)))
  }

  test("DotProduct null semantics match zip_with padding: mismatch/null element/null input") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),        // ok: 11.0
      (Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))    // length mismatch → null
    ).toDF("a", "b")
    val r = df.select(DotProduct(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
    val withNullEl = spark.sql(
      "SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS d")
    assert(withNullEl.head().isNullAt(0))
    val nullInput = spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d")
    assert(nullInput.head().isNullAt(0))
  }

  test("dot_product SQL registration coerces float arrays and stays in codegen") {
    val r = spark.sql("SELECT dot_product(array(CAST(1.5 AS FLOAT)), array(2.0D)) AS d").head()
    assert(r.getDouble(0) == 3.0)
    // non-foldable input so the projection actually plans (literals collapse
    // to a LocalTableScan): the expression must sit inside a codegen span
    val df = spark.range(100)
      .select(
        array((0 to 9).map(i => (col("id") + i).cast("double")): _*).as("a"),
        array((0 to 9).map(i => (col("id") * 2 + i).cast("double")): _*).as("b"))
      .select(DotProduct(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("dot_product")), plan)
    assert(df.filter(col("d") > 0).count() == 100) // all rows evaluate through codegen

  }
}
