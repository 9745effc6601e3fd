package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters so graft's
  * native Catalyst expressions can be exposed as `Column`s (the standard
  * extension-library pattern post Spark-Connect API split).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' function injections to a live session
    * (test hook for the spark.sql.extensions path).
    */
  def registerInjectedFunctions(
      ext: SparkSessionExtensions,
      spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
