package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Compiled vector kernels for the similarity/dedup modules. The
  * `zip_with + aggregate` formulation allocates an intermediate array and
  * runs two interpreted lambda passes per row-pair; this computes the same
  * left-to-right double sum (float→double and int→double casts are exact,
  * so values are bit-identical to the HOF form and the DuckDB oracle) in
  * one compiled loop, inside whole-stage codegen via a static helper.
  * Null elements are skipped (DuckDB `list_sum` semantics); the corpus
  * arrays are null-free so this path never differs in the checked queries.
  */
object VecOps {
  // element-type codes for the static kernel
  final val F = 0; final val D = 1; final val I = 2; final val L = 3

  def typeCode(t: DataType): Int = t match {
    case FloatType => F
    case DoubleType => D
    case IntegerType => I
    case LongType => L
    case other => throw new IllegalArgumentException(s"dot: unsupported element type $other")
  }

  private def get(a: ArrayData, i: Int, t: Int): Double = t match {
    case F => a.getFloat(i).toDouble
    case D => a.getDouble(i)
    case I => a.getInt(i).toDouble
    case _ => a.getLong(i).toDouble
  }

  /** Sequential dot product over the common prefix of the two arrays. */
  def dot(a: ArrayData, b: ArrayData, ta: Int, tb: Int): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    acc
  }
}

/** `vec_dot(array<numeric>, array<numeric>)` → double. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects numeric arrays, got ${left.dataType} / ${right.dataType}")
    }

  @transient private lazy val ta = VecOps.typeCode(elemType(left).get)
  @transient private lazy val tb = VecOps.typeCode(elemType(right).get)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b, $ta, $tb)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExprs {
  /** Column API: sequential-double dot product. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
}
