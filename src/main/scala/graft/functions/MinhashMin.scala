package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One MinHash signature row — `array_min(transform(toks, w ->
  * md5(concat(w, salt))))` — as a native codegen'd Catalyst expression
  * (round-8, guide §"expressions and codegen"; the DotExact/LexSum
  * precedent applied to the banding pass): the HOF form is
  * CodegenFallback (per-element lambda interpreter) and allocates the
  * full intermediate array of 32-char hex digests, in the pass that
  * hashes EVERY shingle of EVERY doc once per session (the docPairs
  * memo build) and every batch in the incremental/streaming stores.
  *
  * Semantics replicated EXACTLY — oracle-pinned arithmetic:
  *   - toks NULL → NULL; empty array → NULL (array_min of no elements);
  *   - NULL elements are SKIPPED (md5(concat(null, salt)) is null and
  *     array_min skips nulls) — all-null → NULL;
  *   - result = the lexicographically smallest md5 hex digest of
  *     (word ++ salt). Hex encoding is byte-monotone (each byte maps to
  *     two hex chars via the same table), so comparing raw 16-byte
  *     digests unsigned-lexicographically equals comparing their hex
  *     strings — the helper tracks the min DIGEST and hex-encodes only
  *     the winner (MinhashMinSpec asserts bit-equality against the HOF
  *     form, including null/empty cases and codegen/interpreted parity;
  *     the full oracle pass re-verified).
  */
case class MinhashMin(child: Expression, salt: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_min requires an array<string> input, got $other")
  }

  override def dataType: DataType = StringType
  // Null even for a non-null input (empty / all-null array).
  override def nullable: Boolean = true

  private lazy val saltBytes: Array[Byte] =
    salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(in: Any): Any = {
    val r = MinhashMin.minHex(in.asInstanceOf[ArrayData], saltBytes)
    if (r == null) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val saltRef = ctx.addReferenceObj("salt", saltBytes, "byte[]")
      s"""
         |${ev.value} = graft.functions.MinhashMin.minHex($a, $saltRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashMin =
    copy(child = newChild)
}

object MinhashMin {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private[functions] def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic byte compare — equals comparing the hex
    * encodings (hex is byte-monotone).
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xFF; val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** min over non-null words of md5hex(word ++ salt); null if none —
    * called from generated code.
    */
  def minHex(toks: ArrayData, salt: Array[Byte]): UTF8String = {
    val n = toks.numElements()
    val md = mdLocal.get()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        md.update(toks.getUTF8String(i).getBytes)
        md.update(salt)
        val d = md.digest()
        if (min == null || less(d, min)) min = d
      }
      i += 1
    }
    if (min == null) null else hex(min)
  }

  /** Column API: minhash_min(toks, salt). */
  def minhashMin(toks: Column, salt: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinhashMin(org.apache.spark.sql.GraftBridge.expression(toks), salt))
}
