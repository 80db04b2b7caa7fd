package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen winnowing fingerprint selection (Schleimer et al. 2003):
  * tokenize → k-gram → md5 → rightmost-min-per-w-window → distinct
  * selected hashes, all in ONE pass per document. VALUE-IDENTICAL
  * (including element order) to the built-in composition in
  * [[graft.pipeline.TextOps.winnowFingerprintsSpec]] —
  * `array_distinct(transform(array_distinct(transform(sequence(...),
  * p -> aggregate(sequence(p, p+w-1), p, rightmost-min))), p ->
  * element_at(hs, p)))` — which evaluated INTERPRETED (higher-order
  * functions are CodegenFallback): one boxed lambda chain per gram for
  * the md5 transform plus an O(windows·w) boxed fold for the selection.
  * Hash comparison here is unsigned-lexicographic on the raw 16-byte
  * digests, which is exactly the UTF8String order of the lowercase-hex
  * strings the composition compares (hex digits are ASCII and per-byte
  * monotonic in nibble value); ties keep the RIGHTMOST position, per the
  * paper's rule and the composition's `<=` fold. Null text → null (the
  * Column wrapper's coalesce restores the composition's empty-array
  * fallthrough, like [[WordGrams]]). */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps needs string, got $other")
  }
  // conservative containsNull, matching the transform/element_at
  // composition this replaces (downstream schemas must not change)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.fpsOf(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.fpsOf($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val Empty = new GenericArrayData(Array.empty[Any])

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned lexicographic compare of two 16-byte digests — identical to
    * comparing their lowercase-hex renderings as strings. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) & 0xf0) >> 4)
      out(2 * i + 1) = HexDigits(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** JVM-static kernel shared by interpreted eval and generated code. */
  def fpsOf(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.getBytes
    val len = b.length
    // token boundaries on the raw UTF-8 bytes (separator = 0x20) — the
    // WordGrams scan (0x20 never occurs inside a multi-byte sequence)
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
    if (t < k) return Empty
    val m = t - k + 1 // gram count
    if (m < w) return Empty
    // md5 of each gram's joined-with-single-space bytes, digested in place
    val md = md5.get()
    val digests = new Array[Array[Byte]](m)
    var g = 0
    while (g < m) {
      md.reset()
      var j = g
      while (j < g + k) {
        md.update(b, starts(j), ends(j) - starts(j))
        if (j < g + k - 1) md.update(' '.toByte)
        j += 1
      }
      digests(g) = md.digest()
      g += 1
    }
    // rightmost minimum per window, positions deduped in first-appearance
    // (window) order — exactly array_distinct over the per-window fold
    val posSeen = new Array[Boolean](m)
    val selPos = new Array[Int](m - w + 1)
    var nSel = 0
    var p = 0
    while (p <= m - w) {
      var best = p
      var q = p + 1
      while (q < p + w) {
        if (cmp(digests(q), digests(best)) <= 0) best = q
        q += 1
      }
      if (!posSeen(best)) { posSeen(best) = true; selPos(nSel) = best; nSel += 1 }
      p += 1
    }
    // value-level dedup keeping first occurrence (the outer array_distinct)
    val seen = new java.util.HashSet[String](nSel * 2)
    val out = new Array[Any](nSel)
    var nOut = 0
    var sIdx = 0
    while (sIdx < nSel) {
      val h = hex(digests(selPos(sIdx)))
      if (seen.add(h)) { out(nOut) = UTF8String.fromString(h); nOut += 1 }
      sIdx += 1
    }
    new GenericArrayData(if (nOut == out.length) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], nOut))
  }

  /** Column wrapper. The `coalesce` preserves the composition's
    * null-text → empty-array fallthrough, like [[WordGrams.wordGrams]]. */
  def winnowFps(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.functions.{array, coalesce}
    val native = org.apache.spark.sql.GraftExpressionBridge.column(
      WinnowFps(org.apache.spark.sql.GraftExpressionBridge.expression(text), k, w))
    coalesce(native, array().cast("array<string>"))
  }
}
