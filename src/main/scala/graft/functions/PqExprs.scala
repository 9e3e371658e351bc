package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Compiled product-quantization kernels. The Column-tree formulation of
  * encode/ADC builds ~1000 expression nodes per row (8 subspaces × 16
  * codewords × 8 dims) — it passed correctness but ran interpreted-slow.
  * These expressions compute the SAME left-associated double sums (and
  * the same smallest-index tie break: strict `<` keeps the first
  * minimum) in one static loop each, inside whole-stage codegen, with
  * the codebook attached as a reference object instead of a literal
  * forest. Values are bit-identical to the tree form and the DuckDB
  * oracle.
  */
object PqOps {

  /** codebook: (subspace * codewords + j) → the codeword's dims. */
  def encode(v: ArrayData, cb: Array[Array[Double]],
             subspaces: Int, codewords: Int, subDim: Int): ArrayData = {
    if (v.numElements() < subspaces * subDim) {
      throw new IllegalArgumentException(
        s"pq_encode: embedding has ${v.numElements()} dims, codebook needs ${subspaces * subDim}")
    }
    val out = new Array[Int](subspaces)
    var sp = 0
    while (sp < subspaces) {
      var bestJ = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < codewords) {
        val cw = cb(sp * codewords + j)
        var acc = 0.0d
        var i = 0
        while (i < subDim) {
          val d = v.getFloat(sp * subDim + i).toDouble - cw(i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestJ = j }
        j += 1
      }
      out(sp) = bestJ
      sp += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance: query keeps exact subvectors, the candidate
    * contributes its codes — Σ_s ‖q_s − cb[s][code_s]‖², outer and inner
    * sums left-associated like the oracle's nested `list_sum`.
    */
  def adc(q: ArrayData, codes: ArrayData, cb: Array[Array[Double]],
          subspaces: Int, codewords: Int, subDim: Int): Double = {
    if (q.numElements() < subspaces * subDim || codes.numElements() < subspaces) {
      throw new IllegalArgumentException(
        s"pq_adc: query has ${q.numElements()} dims (needs ${subspaces * subDim}), " +
          s"codes has ${codes.numElements()} entries (needs $subspaces)")
    }
    var total = 0.0d
    var sp = 0
    while (sp < subspaces) {
      val cw = cb(sp * codewords + codes.getInt(sp))
      var acc = 0.0d
      var i = 0
      while (i < subDim) {
        val d = q.getFloat(sp * subDim + i).toDouble - cw(i)
        acc += d * d
        i += 1
      }
      total += acc
      sp += 1
    }
    total
  }
}

/** `pq_encode(array<float>)` → array<int> of per-subspace codes. */
case class PqEncode(child: Expression, codebook: Array[Array[Double]],
                    subspaces: Int, codewords: Int, subDim: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  // getFloat on an array<double> would silently mis-read 4 of each
  // element's 8 bytes — reject anything but array<float> at analysis time.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<float>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], codebook, subspaces, codewords, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.PqOps.encode($v, $cbRef, $subspaces, $codewords, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc(array<float> query, array<int> codes)` → double. */
case class PqAdc(left: Expression, right: Expression, codebook: Array[Array[Double]],
                 subspaces: Int, codewords: Int, subDim: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<float>, array<int>), got $l / $r")
  }

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqOps.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      codebook, subspaces, codewords, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.PqOps.adc($q, $c, $cbRef, $subspaces, $codewords, $subDim)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExprs {
  def encode(v: Column, cb: Array[Array[Double]],
             subspaces: Int, codewords: Int, subDim: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(v), cb, subspaces, codewords, subDim))

  def adc(q: Column, codes: Column, cb: Array[Array[Double]],
          subspaces: Int, codewords: Int, subDim: Int): Column =
    Bridge.column(PqAdc(Bridge.expression(q), Bridge.expression(codes), cb,
      subspaces, codewords, subDim))
}
