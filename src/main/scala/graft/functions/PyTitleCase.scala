package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared by interpreted eval and generated code. */
object PyTitleCaseUtil {
  // Python's "cased" ≈ Lu | Ll | Lt. Letters WITHOUT case (Lo — CJK,
  // etc.) are NOT cased in Python: a cased letter right after one is
  // uppercased. Character.isLetter would wrongly treat them as cased.
  private def isCased(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  def title(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length)
    var prevCased = false
    var i = 0
    while (i < in.length) {
      val cp = in.codePointAt(i)
      if (isCased(cp)) {
        sb.appendCodePoint(
          if (prevCased) Character.toLowerCase(cp) else Character.toTitleCase(cp))
        prevCased = true
      } else {
        sb.appendCodePoint(cp)
        prevCased = false
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Exact Python `str.title()` semantics (SURVEY §2.7 F3; reference
  * `src/iatlascbioportalexport/clinical.py:160-163`,
  * `tests/test_clinical.py:206-214`): a cased character starts a new
  * word after ANY non-cased character — digits, punctuation,
  * apostrophes — not only after whitespace. Spark's `initcap` splits on
  * whitespace alone, so it diverges exactly there:
  * `"they're 3g".title()` → `"They'Re 3G"` vs initcap `"They're 3g"`.
  * One documented boundary remains: one-to-many case mappings (ß→Ss)
  * follow Java's 1:1 `toTitleCase`, outside the reference's domain.
  * Null-intolerant; whole-stage codegen via the static helper.
  */
case class PyTitleCase(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = "py_title"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_title expects a string input, got ${child.dataType}")

  override protected def nullSafeEval(s: Any): Any =
    PyTitleCaseUtil.title(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.PyTitleCaseUtil.title($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PyTitleCase {
  /** Column API: exact Python `str.title()`. */
  def pyTitle(c: Column): Column =
    Bridge.column(PyTitleCase(Bridge.expression(c)))
}
