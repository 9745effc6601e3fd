package graft

import org.apache.spark.sql.functions._
import graft.functions.DotExact

/** The codegen'd exact dot product (graft.functions.DotExact) must be
  * BIT-IDENTICAL to the aggregate(zip_with(...)) fold it replaced —
  * oracle-pinned arithmetic: a single ULP of difference could flip a
  * rounded cosine in the DuckDB comparisons.
  */
class DotExactSpec extends SparkSpecBase {
  import spark.implicits._

  private val hof =
    expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")

  test("bit-identical to the HOF fold on random and adversarial vectors") {
    // mixed magnitudes so summation ORDER matters: a different order
    // would change the result and fail the exact comparison
    val rows = spark.range(0, 2000, 1, 8)
      .select(
        expr("transform(sequence(1, 64), k -> CAST(pmod(hash(id, k), 2000000) AS DOUBLE) / 3.0 - 333333.3)").as("a"),
        expr("transform(sequence(1, 64), k -> CAST(pmod(hash(id + 7, k), 97) AS DOUBLE) * 1e-7 + CAST(pmod(hash(id, -k), 13) AS DOUBLE) * 1e9)").as("b"))
    val cmp = rows.select(
      DotExact.dotExact(col("a"), col("b")).as("fast"), hof.as("ref"))
    cmp.filter(col("fast") =!= col("ref")).count() shouldBe 0
    // and not null-for-null disagreement either
    cmp.filter(col("fast").isNull =!= col("ref").isNull).count() shouldBe 0
  }

  test("null semantics match the fold: null arrays, length mismatch, null elements") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))), // 11.0
      (None, Some(Seq(1.0))), // null array
      (Some(Seq(1.0)), None), // null array
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))), // length mismatch -> null
      (Some(Seq[Double]()), Some(Seq[Double]())) // empty -> 0.0
    ).toDF("a", "b")
    val out = df.select(
      DotExact.dotExact(col("a"), col("b")).as("fast"), hof.as("ref")).collect()
    out.foreach { r => r.isNullAt(0) shouldBe r.isNullAt(1) }
    out(0).getDouble(0) shouldBe 11.0
    out(3).isNullAt(0) shouldBe true
    out(4).getDouble(0) shouldBe 0.0
    // null ELEMENT nulls the product and therefore the fold
    val withNullElem = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(2.0D, 3.0D) AS b")
    val r2 = withNullElem.select(
      DotExact.dotExact(col("a"), col("b")).as("fast"), hof.as("ref")).head
    r2.isNullAt(0) shouldBe true
    r2.isNullAt(1) shouldBe true
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.5, -2.25, 3.125))
    val b = ArrayData.toArrayData(Array(4.0, 0.5, -1.0))
    val e = DotExact(
      Literal.create(a, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      Literal.create(b, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)))
    e.eval(null) shouldBe (1.5 * 4.0 + -2.25 * 0.5 + 3.125 * -1.0)
  }

  test("registered SQL function is usable inside expr strings") {
    DotExact.register(spark)
    spark.sql("SELECT dot_exact(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0) shouldBe 11.0
  }
}
