package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen word n-grams: whitespace-split the text (single-space
  * separator, empties dropped — the WhitespaceAnalyzer / SQL-twin
  * tokenization) and emit every run of `n` consecutive tokens re-joined
  * with single spaces. VALUE-IDENTICAL to the built-in composition
  * `transform(sequence(1, size(toks)-n+1), i -> concat_ws(' ',
  * slice(toks, i, n)))` guarded by `when(size(toks) >= n, …)`, but it
  * tokenizes ONCE per row instead of once per window position: the
  * higher-order-function chain re-evaluates `slice`'s child — the whole
  * `filter(split(text))` pipeline — for EVERY lambda invocation (no
  * cross-lambda CSE, the hazard already documented at
  * [[graft.pipeline.TextOps.winnowFingerprints]]), making the composed
  * form O(tokens²) per document. Measured on the sf0.1 battery this
  * single Generate was ~1.5-3 s of the 4.1 s `dup_spans` entry. Byte-level
  * kernel: boundaries are scanned on the UTF-8 bytes (0x20 never occurs
  * inside a multi-byte sequence) and each gram is one arraycopy per
  * token — no per-window re-split, no boxed lambda plumbing. */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_grams needs string, got $other")
  }
  // conservative nullability/containsNull, matching the built-in
  // composition this replaces (downstream schemas must not change)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(input: Any): Any =
    WordGrams.gramsOf(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGrams.gramsOf($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

/** Native codegen whitespace tokenizer — the n=1 special case of
  * [[WordGrams]] kept as its own expression so its type matches the
  * `filter(split(text, " "), t -> t <> '')` composition it replaces
  * exactly: containsNull = false (split emits non-null elements, filter
  * keeps them), null text → null (no coalesce wrapper — consumers like
  * `size(tokens)` rely on null propagation). */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens needs string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(input: Any): Any =
    WordGrams.gramsOf(input.asInstanceOf[UTF8String], 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGrams.gramsOf($c, 1)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object WordGrams {

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** JVM-static kernel shared by interpreted eval and generated code. */
  def gramsOf(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val len = b.length
    // token boundaries on the raw UTF-8 bytes (separator = 0x20)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var t = 0
    var i = 0
    while (i < len) {
      while (i < len && b(i) == ' ') i += 1
      if (i < len) {
        val st = i
        while (i < len && b(i) != ' ') i += 1
        if (t == starts.length) {
          starts = java.util.Arrays.copyOf(starts, t * 2)
          ends = java.util.Arrays.copyOf(ends, t * 2)
        }
        starts(t) = st; ends(t) = i; t += 1
      }
    }
    if (t < n) return Empty
    val m = t - n + 1
    val out = new Array[Any](m)
    var g = 0
    while (g < m) {
      var glen = n - 1 // n-1 joining spaces
      var j = g
      while (j < g + n) { glen += ends(j) - starts(j); j += 1 }
      val gb = new Array[Byte](glen)
      var off = 0
      j = g
      while (j < g + n) {
        val l = ends(j) - starts(j)
        System.arraycopy(b, starts(j), gb, off, l)
        off += l
        if (off < glen) { gb(off) = ' '; off += 1 }
        j += 1
      }
      out(g) = UTF8String.fromBytes(gb)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper for [[WsTokens]]. */
  def wsTokens(text: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      WsTokens(org.apache.spark.sql.GraftExpressionBridge.expression(text)))

  /** Column wrapper, `graft.functions` style. The `coalesce` preserves the
    * built-in composition's null behavior (null text → empty array, via
    * its CASE WHEN fallthrough) without giving up the null-intolerant
    * fast path inside the expression itself. */
  def wordGrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.{array, coalesce, lit}
    val native = org.apache.spark.sql.GraftExpressionBridge.column(
      WordGrams(org.apache.spark.sql.GraftExpressionBridge.expression(text), n))
    coalesce(native, array().cast("array<string>"))
  }
}
