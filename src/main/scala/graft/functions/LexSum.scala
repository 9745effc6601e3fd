package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hashed-vocab lex feature sum as a native codegen'd Catalyst
  * expression (round-8, guide §"expressions and codegen" — the DotExact
  * precedent applied to the quality classifier): QualityScore.lexCol
  * previously computed the per-word weight sum as
  *
  *   aggregate(transform(ws, w -> element_at(weights,
  *     (pmod(conv(substring(md5(w), 1, 8), 16, 10) :: long, 256) + 1) :: int)),
  *     0.0, (acc, x) -> acc + x)
  *
  * — two higher-order functions that are CodegenFallback in Spark (an
  * interpreted per-row lambda interpreter plus an allocated intermediate
  * weight array), and the `lex` subtree appears TWICE in the score formula
  * (signal + hinge), in the single hottest text pass of the catalog (the
  * session-wide docMeta pass, the streaming quality gate, tx_quality).
  *
  * Semantics are replicated EXACTLY — oracle-pinned arithmetic:
  *   - input array NULL → NULL;
  *   - any NULL element → NULL (md5(null) nulls the lambda result and the
  *     `acc + x` fold is sticky-null);
  *   - empty array → 0.0 (the fold's zero);
  *   - otherwise Σ weights(bucket(w)) added LEFT-TO-RIGHT in IEEE double
  *     order — bit-identical to the fold. bucket(w) =
  *     `pmod(conv(substring(md5(w),1,8),16,10) :: long, 256)`: the first
  *     8 hex chars are the first four digest bytes big-endian, and that
  *     unsigned value mod 256 is exactly the FOURTH DIGEST BYTE, so the
  *     expensive hex/conv/pmod chain collapses to `digest(3) & 0xFF`
  *     (LexSumSpec asserts bit-equality against the HOF form, including
  *     codegen vs interpreted parity; the full oracle pass re-verified).
  *
  * Native Expression, not a UDF: stays inside the whole-stage-codegen
  * span with no lambda interpreter and no intermediate array; being
  * deterministic and non-fallback, the two occurrences of `lex` in the
  * score formula are eligible for codegen subexpression elimination.
  */
case class LexSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lex_sum requires an array<string> input, got $other")
  }

  override def dataType: DataType = DoubleType
  // Null even for a non-null input (null element → sticky-null fold).
  override def nullable: Boolean = true

  override def nullSafeEval(in: Any): Any = {
    val a = in.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += LexSum.wordWeight(a.getUTF8String(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += graft.functions.LexSum.wordWeight($a.getUTF8String($i));
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LexSum =
    copy(child = newChild)
}

object LexSum {

  private val weights: Array[Double] = graft.parse.QualityScore.weights.toArray
  // The d(3) & 0xFF bucket below is the hex/conv/pmod chain ONLY for a
  // 256-bucket table — fail fast if QualityScore ever changes Buckets
  // rather than silently diverging from the oracle mirror.
  require(graft.parse.QualityScore.Buckets == 256 && weights.length == 256,
    s"LexSum's digest-byte bucket requires Buckets == 256, " +
      s"got ${graft.parse.QualityScore.Buckets}")

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** weights(bucket(w)) for one word — called from generated code.
    * bucket = fourth MD5 digest byte (see class doc for the proof this
    * equals the HOF form's hex/conv/pmod chain).
    */
  def wordWeight(w: UTF8String): Double = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(w.getBytes)
    weights(d(3) & 0xFF)
  }

  /** Column API: lex_sum(words). */
  def lexSum(words: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      LexSum(org.apache.spark.sql.GraftBridge.expression(words)))
}
