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

  /** Multiset intersection size of two ASCENDING-sorted long arrays by
    * two-pointer merge: for every value v the count contributed is
    * min(cnt_a(v), cnt_b(v)). One compiled loop, no allocation — the
    * verify kernel of the prefix-filtered similarity join, where the
    * `array_intersect` HOF would build a hash set per row-pair.
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
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

/** `sorted_intersect_count(array<long>, array<long>)` → int. Both inputs
  * MUST be ascending-sorted (the callers build them with `sort_array`);
  * an unsorted input undercounts silently, so the contract lives at the
  * build site, locked by spec.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<bigint>, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.sortedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.sortedIntersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExprs {
  /** Column API: sequential-double dot product. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: multiset intersection size of two sorted long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
