package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash as a native Catalyst expression with whole-stage
  * codegen — the exact hash family the reference uses for its partitioned
  * exchange (reference: internal/streams/paritioned_queue.go:42-48, Go's
  * hash/fnv New64a). Operates on STRING (UTF-8 bytes) or BINARY.
  *
  * Native Expression (not a Scala UDF) so it stays inside whole-stage
  * codegen when used as a partitioning/salting key at scale.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 requires string or binary input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Fnv1a64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val toBytes =
        if (child.dataType == StringType) s"$c.getBytes()" else c
      s"""
         |byte[] $bytes = $toBytes;
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object Fnv1a64 {
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Column API: fnv1a64(c). */
  def fnv1a64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Fnv1a64(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Register as SQL function `fnv1a64` on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv1a64", exprs => Fnv1a64(exprs.head), "built-in")
}
