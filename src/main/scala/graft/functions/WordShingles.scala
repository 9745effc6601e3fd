package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The distinct k-word shingle array — IncrementalDedup's
  *
  *   CASE WHEN size(ws) >= k THEN
  *     array_distinct(transform(sequence(1, size(ws) - k + 1),
  *       i -> concat_ws(' ', ws[i], ..., ws[i + k - 1])))
  *   ELSE array() END
  *
  * — as a native codegen'd Catalyst expression (round-8; completes the
  * DotExact/LexSum/MinhashMin/WordGramHashes/LineUnitHashes family: with
  * it, every hot text pass in the engine is interpreter-free). The HOF
  * form is CodegenFallback and allocates the full pre-distinct shingle
  * array; it runs once per session in the docShingles memo build and
  * per batch in the incremental/streaming dedup stores.
  *
  * Semantics replicated EXACTLY:
  *   - ws NULL → NULL (the CASE's size(null) is null, taking the ELSE
  *     branch in SQL — but no caller reaches this: every input comes
  *     from split(), which is null only for null text, and the
  *     documents/transcript schemas are non-null there; the spec pins
  *     the non-null domain);
  *   - fewer than k words → empty array (the CASE's ELSE);
  *   - shingle i = the non-null words ws(i..i+k-1) joined with single
  *     spaces (concat_ws skips nulls — unreachable via split,
  *     replicated anyway), first-occurrence order, deduped.
  * WordShinglesSpec (in WordGramHashesSpec.scala) asserts bit-equality
  * against the HOF form; the full oracle pass re-verified.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires an array<string> input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(in: Any): Any =
    WordShingles.shingles(in.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.WordShingles.shingles($a, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Distinct k-word shingles of `ws`, document order — called from
    * generated code. Empty array for fewer than k words.
    */
  def shingles(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](n - k + 1)
    val seen = new java.util.HashSet[UTF8String]()
    val buf = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i <= n - k) {
      buf.reset()
      var j = i
      var first = true
      while (j < i + k) {
        if (!ws.isNullAt(j)) {
          if (!first) buf.write(' ')
          val b = ws.getUTF8String(j).getBytes
          buf.write(b, 0, b.length)
          first = false
        }
        j += 1
      }
      val s = UTF8String.fromBytes(buf.toByteArray)
      if (seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: word_shingles(ws, k). */
  def wordShingles(ws: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordShingles(org.apache.spark.sql.GraftBridge.expression(ws), k))
}
