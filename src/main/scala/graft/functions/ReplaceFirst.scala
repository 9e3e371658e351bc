package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-splice helper shared by interpreted eval and generated code. */
object ReplaceFirstUtil {
  def replaceFirst(s: UTF8String, find: UTF8String, repl: UTF8String): UTF8String = {
    if (find.numBytes() == 0) return s
    val idx = s.indexOf(find, 0) // character position, -1 if absent
    if (idx < 0) return s
    UTF8String.concat(
      s.substring(0, idx),
      repl,
      s.substring(idx + find.numChars(), s.numChars()))
  }
}

/** Replace the FIRST occurrence of a literal substring — the semantics of
  * pandas `str.replace(pat, repl, n=1, regex=False)` used by the
  * reference's suffix-strip operator (SURVEY §2.7 F1;
  * reference `src/iatlascbioportalexport/clinical.py:98-133`). Spark's
  * built-in `regexp_replace`/`replace` substitute ALL occurrences, so this
  * is a genuine expression gap. Null-intolerant; whole-stage codegen via a
  * static helper so the hot path stays in generated code.
  */
case class ReplaceFirst(srcExpr: Expression, findExpr: Expression, replExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = srcExpr
  override def second: Expression = findExpr
  override def third: Expression = replExpr

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = srcExpr.dataType
  override def prettyName: String = "replace_first"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[StringType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"replace_first expects string inputs, got ${children.map(_.dataType).mkString(", ")}")

  override protected def nullSafeEval(s: Any, find: Any, repl: Any): Any =
    ReplaceFirstUtil.replaceFirst(
      s.asInstanceOf[UTF8String],
      find.asInstanceOf[UTF8String],
      repl.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f, r) =>
      s"graft.functions.ReplaceFirstUtil.replaceFirst($s, $f, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(srcExpr = newFirst, findExpr = newSecond, replExpr = newThird)
}

object ReplaceFirst {
  /** Column API: replace the first literal occurrence of `find` in `c`. */
  def replaceFirst(c: Column, find: Column, repl: Column): Column =
    Bridge.column(ReplaceFirst(
      Bridge.expression(c),
      Bridge.expression(find),
      Bridge.expression(repl)))
}
