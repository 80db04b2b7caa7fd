package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of a string's code-point histogram — the classic
  * gibberish / encoding-junk / binary-spill detector for web-text quality
  * gates (natural language sits ~3.5-4.5 bits; base64 blobs, minified JS
  * and repeated-char padding land far outside that band). A native codegen
  * `Expression` so the whole quality projection stays one narrow
  * WholeStageCodegen pass over the scan — the per-row histogram lives in a
  * short-lived local map, never in a shuffle (the composed-built-ins
  * alternative explodes every CHARACTER of the corpus through a groupBy —
  * a corpus-sized shuffle for a per-row number). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy needs string, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.entropyOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.entropyOf($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  private val Ln2 = math.log(2.0)

  /** JVM-static kernel shared by interpreted eval and generated code.
    * Counts CODE POINTS (so supplementary-plane characters are one symbol,
    * matching DuckDB's `length`/`substring` semantics in the oracle twin)
    * and evaluates H = log2(n) - (1/n)·Σ c·log2(c) — the factored form both
    * sides compute, keeping float divergence inside the 4dp round. */
  def entropyOf(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      acc += c * (math.log(c) / Ln2)
    }
    math.log(n.toDouble) / Ln2 - acc / n
  }

  /** Column wrapper, `graft.functions` style. */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CharEntropy(org.apache.spark.sql.GraftExpressionBridge.expression(text)))
}
