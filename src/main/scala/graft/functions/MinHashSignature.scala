package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen MinHash signature: for each of `numPerms` permutations,
  * the min over the shingle array of xxhash64(shingle, perm) — BIT-
  * IDENTICAL to the built-in composition
  * `aggregate(shingles, repeat(MaxValue), zip_with(acc, seq, least(a,
  * xxhash64(s, p))))` (xxhash64 folds: bytes hashed with seed 42, then the
  * int perm hashed with that result as seed), but it hashes the shingle
  * BYTES once per shingle instead of once per (shingle, perm) and runs as
  * one tight generated loop with a single long[] accumulator — no
  * per-element array allocation from the higher-order-function chain.
  * Preference order (b) of the build rules: a custom `Expression` with
  * `doGenCode` beating composed built-ins on the hottest dedup path. */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  require(numPerms > 0, "numPerms must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      // a null element folds as seed-passthrough — xxhash64(null, p) skips
      // the null child, so hashInt(p, 42) joins the min — matching the
      // built-in composition this expression is pinned bit-identical to
      val h0 =
        if (s != null)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        else 42L
      var p = 0
      while (p < numPerms) {
        val h = XXH64.hashInt(p, h0)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val h0 = ctx.freshName("h0")
      val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[$numPerms];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |final int ${sig}_n = $arr.numElements();
         |for (int $i = 0; $i < ${sig}_n; $i++) {
         |  long $h0;
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    $h0 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |      $s.numBytes(), 42L);
         |  } else {
         |    // null element = seed-passthrough, as in the built-in xxhash64 fold
         |    $h0 = 42L;
         |  }
         |  for (int $p = 0; $p < $numPerms; $p++) {
         |    long $h = $xxh.hashInt($p, $h0);
         |    if ($h < $sig[$p]) $sig[$p] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column wrapper, `graft.functions` style. */
  def minhashSig(shingles: Column, numPerms: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      MinHashSignature(
        org.apache.spark.sql.GraftExpressionBridge.expression(shingles), numPerms))
}
