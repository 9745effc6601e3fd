package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `mightContain` probe of a pre-built Bloom sketch as a native Catalyst
  * expression with whole-stage codegen — the map-side pre-gate for
  * store-backed semi-joins at corpus scale.
  *
  * Why this exists: every release-gate semi-join in this engine (n-gram
  * decontamination, the incremental signature stores) joins a HUGE batch
  * side (one row per gram/band of every ingested document) against a
  * comparatively small persisted store. The store side is bucketed and
  * exchange-free, but the batch side still shuffles ALL its rows — at
  * 100 TB that exchange is the gate's entire cost, and ~99% of the rows
  * it moves match nothing. A Bloom sketch of the store's keys (built once
  * per store version with `DataFrame.stat.bloomFilter`, ~1.2 MB per
  * million keys at 1% FPR) rides into this expression as a task-shared
  * reference object, and the filter runs INSIDE the scan stage, before
  * the exchange: definite misses (all but fpp of the clean rows) never
  * shuffle at all. Survivors = true matches + ~fpp false positives, and
  * the exact semi-join that follows removes the false positives — the
  * output is bit-identical to the ungated plan (DecontamSpec and
  * IncrementalDedupSpec assert exactly that, plus the pre-exchange plan
  * position).
  *
  * The probe semantics mirror the builder's: `stat.bloomFilter` inserts
  * strings as their UTF-8 bytes (`putBinary`) and integral types via
  * `putLong`, so this expression probes `mightContainBinary` on the
  * UTF8String bytes (no `String` allocation per row) and
  * `mightContainLong` for integral children.
  *
  * Native Expression (not a Scala UDF) so the probe stays inside
  * whole-stage codegen in the hot scan stage, like [[Fnv1a64]].
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires string, binary, long or int input, got $t")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => filter.mightContainBinary(s.getBytes)
    case b: Array[Byte] => filter.mightContainBinary(b)
    case l: Long => filter.mightContainLong(l)
    case i: Int => filter.mightContainLong(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The sketch is a per-plan reference object: deserialized once per
    // executor with the generated class, shared by every task (it is
    // read-only after build), never re-parsed per row.
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val call = child.dataType match {
        case StringType => s"$bf.mightContainBinary($c.getBytes())"
        case BinaryType => s"$bf.mightContainBinary($c)"
        case LongType => s"$bf.mightContainLong($c)"
        case IntegerType => s"$bf.mightContainLong((long) $c)"
      }
      s"${ev.value} = $call;"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {

  /** Column API: true iff the sketch MIGHT contain `c` (no false
    * negatives; false positives at the sketch's configured fpp).
    */
  def mightContain(c: Column, filter: BloomFilter): Column =
    org.apache.spark.sql.GraftBridge.column(
      BloomMightContain(org.apache.spark.sql.GraftBridge.expression(c), filter))
}
