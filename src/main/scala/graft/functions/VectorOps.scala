package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  IntegerType, LongType}

/** Native codegen vector kernels for the ANN / embedding-dedup family.
  *
  * The previous implementations composed `zip_with` + `aggregate` higher-
  * order functions, which evaluate INTERPRETED (CodegenFallback — no
  * whole-stage codegen, one boxed lambda invocation plus a fresh
  * GenericArrayData per element pair). Measured on the sf0.1 battery a
  * single cosine cost ~45 µs, putting `ann_ivf` (16 centroid cosines ×
  * 2000 vectors) at 1.35 s. Each expression here is pinned VALUE-IDENTICAL
  * to its built-in composition (same left-fold accumulation order, same
  * null semantics — PipelineSpec) and runs as one tight generated loop. */
object VectorOps {

  private def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Cosine of two numeric arrays — the twin of
    * `aggregate(zip_with(a, b, x*y), 0.0, +) / (sqrt(Σa²)·sqrt(Σb²))`:
    * null array, length mismatch, or any null element → null (exactly the
    * zip_with-padding / null-propagating fold behavior). Boxed return so
    * generated code can branch on null. */
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < n) {
      val x = elemAt(a, i, aF); val y = elemAt(b, i, bF)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Hyperplane-sign signature — the twin of
    * `Σ_b when(aggregate(zip_with(v, coeffs_b, x*c), 0.0, +) > 0, 1L<<b)
    * .otherwise(0L)`: any irregularity (null vector, length mismatch, null
    * element) nulls every dot, and `when(null…).otherwise(0)` contributes
    * 0 — so the signature is 0, never null. */
  def hyperplaneSig(v: ArrayData, vF: Boolean, planes: Array[Array[Double]]): Long = {
    if (v == null) return 0L
    val dim = planes(0).length
    val n = v.numElements()
    if (n != dim) return 0L
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val c = planes(b)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += elemAt(v, i, vF) * c(i); i += 1 }
      if (dot > 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** ADC cosine from PQ codes — the twin of
    * `lutSum(lut) / (qnorm · sqrt(lutSum(norm2)))` with
    * `lutSum(t) = aggregate(zip_with(codes, t, (cd, row) ->
    * element_at(row, cd+1)), 0.0, +)`: null code element or a codes/lut
    * length mismatch → null. */
  def adcCosine(codes: ArrayData, lut: ArrayData, qnorm: Double,
      norm2: Array[Array[Double]]): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m || norm2.length != m) return null
    var sLut = 0.0; var sN2 = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || lut.isNullAt(s)) return null
      val cd = codes.getInt(s)
      val row = lut.getArray(s)
      if (row.isNullAt(cd)) return null
      sLut += row.getDouble(cd)
      sN2 += norm2(s)(cd)
      s += 1
    }
    sLut / (qnorm * math.sqrt(sN2))
  }

  /** PQ code assignment for all m subspaces in one pass — the twin of
    * `array_{s}( (array_position(scores_s, array_min(scores_s)) - 1)
    * .cast(int) )` with `scores_s[j] = Σc² − 2·dot(slice(v, s·d0+1, d0),
    * c_{s,j})` (the ‖x‖² term is per-row constant, so the argmin is the
    * L2-nearest codeword). Null semantics per subspace, matching the
    * slice/zip_with/aggregate composition: null vector, fewer than d0
    * elements available, or any null element → null code (zip_with pads
    * the short side with nulls and the fold propagates); the outer array
    * itself is never null (CreateArray). Ties break to the FIRST minimal
    * codeword (array_position returns the first occurrence; scores for
    * one subspace are all-null or all-valued, never mixed, because the
    * dot depends only on the subvector). */
  def pqCode(v: ArrayData, vF: Boolean, books: Array[Array[Array[Double]]],
      sumc2: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    if (v == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    val len = v.numElements()
    var s = 0
    var start = 0
    while (s < m) {
      val book = books(s)
      val d0 = book(0).length
      var ok = start + d0 <= len
      if (ok) {
        var i = 0
        while (ok && i < d0) { if (v.isNullAt(start + i)) ok = false; i += 1 }
      }
      if (ok) {
        var best = 0
        var bestScore = 0.0
        var j = 0
        while (j < book.length) {
          val c = book(j)
          var dot = 0.0
          var i = 0
          while (i < d0) { dot += elemAt(v, start + i, vF) * c(i); i += 1 }
          val score = sumc2(s)(j) - 2.0 * dot
          // same ordering array_min/array_position use for doubles
          // (NaN greatest and self-equal, -0.0 == 0.0); strict < keeps
          // the first occurrence of the minimum, like array_position
          if (j == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
                .compareDoubles(score, bestScore) < 0) {
            best = j; bestScore = score
          }
          j += 1
        }
        out(s) = best
      }
      start += d0
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def col(e: Expression): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftExpressionBridge.expression(c)

  def cosineSim(a: Column, b: Column): Column = col(CosineSim(expr(a), expr(b)))

  def hyperplaneSig(v: Column, planes: Seq[Seq[Double]]): Column =
    col(HyperplaneSig(expr(v), planes))

  def adcCosine(codes: Column, lut: Column, qnorm: Column,
      norm2: Seq[Seq[Double]]): Column =
    col(AdcCosine(expr(codes), expr(lut), expr(qnorm), norm2))

  def pqCode(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    col(PqCode(expr(v), books))
}

/** See [[VectorOps.cosine]]. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<float|double>, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private lazy val lF = left.dataType match { case ArrayType(FloatType, _) => true; case _ => false }
  private lazy val rF = right.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], lF, b.asInstanceOf[ArrayData], rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.VectorOps.cosine($a, $lF, $b, $rF);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

/** See [[VectorOps.hyperplaneSig]]. `planes` is a literal parameter
  * ([bit][dim] coefficients), like MinHashSignature's numPerms. */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
    "planes must be a non-empty rectangular matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig needs array<float|double>, got $other")
  }
  override def dataType: DataType = LongType
  // the when/otherwise composition folds every irregularity to 0L — the
  // signature is never null
  override def nullable: Boolean = false
  override def prettyName: String = "hyperplane_sig"

  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val vF =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    VectorOps.hyperplaneSig(v.asInstanceOf[ArrayData], vF, planesArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planesArr, "double[][]")
    val vFs = vF.toString
    ev.copy(isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.VectorOps.hyperplaneSig(${c.value}, $vFs, $planesRef);
        """)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** See [[VectorOps.adcCosine]]. `norm2` ([subspace][codeword] reconstructed
  * squared norms) is a literal parameter. */
case class AdcCosine(first: Expression, second: Expression, third: Expression,
    norm2: Seq[Seq[Double]]) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_cosine needs (array<int>, array<array<double>>, double), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_cosine"

  @transient private lazy val norm2Arr: Array[Array[Double]] =
    norm2.map(_.toArray).toArray

  override def nullSafeEval(codes: Any, lut: Any, qnorm: Any): Any =
    VectorOps.adcCosine(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData],
      qnorm.asInstanceOf[Double], norm2Arr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val norm2Ref = ctx.addReferenceObj("norm2", norm2Arr, "double[][]")
    nullSafeCodeGen(ctx, ev, (codes, lut, qnorm) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.VectorOps.adcCosine(
         |  $codes, $lut, $qnorm, $norm2Ref);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AdcCosine =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** See [[VectorOps.pqCode]]. `books` ([subspace][codeword][subdim]
  * codebooks) is a literal parameter; the per-codeword squared norms are
  * derived from it exactly as the composition's `lit(c.map(v => v*v).sum)`
  * constant (same left-fold sum). The m interpreted
  * aggregate(zip_with(...)) argmin chains this replaces were the PQ
  * encode/train kernel — measured ~1.2 ms/row at m=16, codewords=32
  * (512 boxed folds per row), the dominant cost of the encode-once
  * corpus pass at any scale. */
case class PqCode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.forall(b => b.nonEmpty &&
      b.forall(_.length == b.head.length)),
    "books must be non-empty with rectangular per-subspace codebooks")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_code needs array<float|double>, got $other")
  }
  // CreateArray of nullable per-subspace codes: the array itself is never
  // null, its elements may be (irregular subvector -> null code)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_code"

  @transient private lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val sumc2Arr: Array[Array[Double]] =
    books.map(_.map(c => c.map(v => v * v).sum).toArray).toArray
  @transient private lazy val vF =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    VectorOps.pqCode(v.asInstanceOf[ArrayData], vF, booksArr, sumc2Arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val booksRef = ctx.addReferenceObj("books", booksArr, "double[][][]")
    val sumc2Ref = ctx.addReferenceObj("sumc2", sumc2Arr, "double[][]")
    val vFs = vF.toString
    ev.copy(isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.VectorOps.pqCode(
            ${c.isNull} ? null : ${c.value}, $vFs, $booksRef, $sumc2Ref);
        """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCode =
    copy(child = newChild)
}
