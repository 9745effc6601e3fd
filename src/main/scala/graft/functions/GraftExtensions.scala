package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native functions
  * into any session via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`), so
  * SQL users get them without touching code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      (exprs: Seq[Expression]) => Fnv1a64(exprs.head)))
  }
}
