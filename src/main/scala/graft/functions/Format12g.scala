package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C `printf("%.12g")` semantics for doubles — the serialization precision
  * every TSV sink in the reference uses (`float_format="%.12g"`, SURVEY §2.1
  * K1; reference `src/iatlascbioportalexport/clinical.py:353-358`,
  * `maf.py:66-71`). Java's `String.format("%.12g")` keeps trailing zeros,
  * so this is hand-rolled: round to 12 significant digits, pick
  * fixed vs scientific per C's rule (exponent < -4 or >= precision), strip
  * trailing zeros.
  */
object Format12gUtil {
  private val mc12 = new MathContext(12)

  def format(d: Double): UTF8String = UTF8String.fromString(formatString(d))

  def formatString(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "nan"
    if (java.lang.Double.isInfinite(d)) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return if (java.lang.Double.doubleToRawLongBits(d) != 0L) "-0" else "0"
    val bd = new JBigDecimal(d).round(mc12)
    val exp = bd.precision - bd.scale - 1
    if (exp < -4 || exp >= 12) {
      val mant = bd.movePointLeft(exp).stripTrailingZeros.toPlainString
      val e = if (exp < 0) "e-%02d".format(-exp) else "e+%02d".format(exp)
      mant + e
    } else {
      bd.stripTrailingZeros.toPlainString
    }
  }
}

case class Format12g(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "format_12g"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"format_12g expects a double input, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    Format12gUtil.format(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Format12gUtil.format($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Format12g {
  def format12g(c: Column): Column =
    Bridge.column(Format12g(Bridge.expression(c)))
}
