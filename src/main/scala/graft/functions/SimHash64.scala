package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen 64-bit SimHash over a token array — VALUE-IDENTICAL to
  * the built-in composition (per-token xxhash64 seed 42; per bit, vote +1
  * when the bit is set else −1 via the getbit fold; result bit b set when
  * its vote sum is > 0; a null token folds as seed-passthrough exactly
  * like the xxhash64 chain), but it hashes each token once and keeps the
  * 64 vote counters in one local array instead of allocating a fresh
  * 64-long array per token through the interpreted zip_with/aggregate
  * chain. Same preference-order-(b) rationale as [[MinHashSignature]]. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhashOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.simhashOf($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** JVM-static kernel shared by interpreted eval and generated code. */
  def simhashOf(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // null element = seed passthrough, as in the built-in xxhash64 fold
      val h =
        if (s != null)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        else 42L
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Column wrapper, `graft.functions` style. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      SimHash64(org.apache.spark.sql.GraftExpressionBridge.expression(tokens)))
}
