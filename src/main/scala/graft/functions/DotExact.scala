package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact dot product of two double arrays as a native codegen'd Catalyst
  * expression (round-8, guide §"expressions and codegen"): the similarity
  * family previously computed every dot as
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)`
  * — two higher-order functions that are CodegenFallback in Spark, i.e.
  * an interpreted per-row lambda interpreter PLUS an allocated
  * intermediate product array, sitting in the hottest loops the repo has
  * (the within-cell SemDeDup pair filter evaluates it ~|cell|² times).
  *
  * Semantics are replicated EXACTLY — this is oracle-pinned arithmetic:
  *   - either array NULL → NULL;
  *   - different lengths → NULL (zip_with pads the short side with null,
  *     a null product nulls the fold);
  *   - any NULL element → NULL (same sticky-null fold);
  *   - otherwise Σ a(i)·b(i), multiplications and additions performed
  *     LEFT-TO-RIGHT in IEEE double order — bit-identical to the fold,
  *     so every rounded cosine the DuckDB oracles compare is unchanged
  *     (DotExactSpec asserts equivalence including the null/length
  *     cases; the full oracle pass re-verified green).
  *
  * Native Expression, not a UDF: stays inside the whole-stage-codegen
  * span with no lambda interpreter and no intermediate array.
  */
case class DotExact(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_exact requires two array<double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  // Null even for non-null inputs (length mismatch / null element), so
  // the default BinaryExpression null semantics are not enough.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExact =
    copy(left = newLeft, right = newRight)
}

object DotExact {

  /** Column API: dot_exact(a, b). */
  def dotExact(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      DotExact(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Register as SQL function `dot_exact` on a session (for use inside
    * `expr(...)` strings / higher-order-function lambdas).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_exact", exprs => DotExact(exprs.head, exprs(1)), "built-in")
}
