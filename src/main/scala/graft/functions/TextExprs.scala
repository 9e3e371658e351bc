package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text-scan kernels for the quality/language-ID layer. The
  * regex formulations (`regexp_count`, `size(split(...))`) materialize
  * match arrays and — once several of them are fused into one predicate —
  * blow past codegen limits into interpreted evaluation with each
  * sub-regex re-evaluated per CASE branch. These kernels compute the
  * identical counts in one byte-scan per call.
  *
  * Exactness domain (pinned by the DuckDB oracles at sf0.01): the regex
  * character classes in play are ASCII (`[a-zA-Z]`, `[0-9]`, `\s`, and
  * `\b` over `\w = [A-Za-z0-9_]` — Java and RE2 agree on all of them),
  * so byte-level scanning is exact; any non-ASCII code point is counted
  * via its UTF-8 lead byte and classified as "other" (matches none of
  * the ASCII classes, matches their negation).
  */
object TextOps {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isWord(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'
  @inline private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80

  /** Count of maximal non-whitespace runs == `size(split(trim(s), "\s+"))`
    * for non-blank s, and 0 for blank (the `wsTokens` special case).
    */
  def wsTokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0; var inRun = false; var i = 0
    while (i < bytes.length) {
      val ws = !isCont(bytes(i)) && isWs(bytes(i))
      if (!ws && !inRun) { n += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    n
  }

  /** mode 0: `[a-zA-Z]` count; mode 1: `[^a-zA-Z0-9\s]` count (each
    * non-ASCII code point counts once).
    */
  def asciiClassCount(s: UTF8String, mode: Int): Int = {
    val bytes = s.getBytes
    var n = 0; var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (!isCont(b)) {
        val alpha = isAlpha(b)
        if (mode == 0) { if (alpha) n += 1 }
        else if (!alpha && !isDigit(b) && !isWs(b)) n += 1
      }
      i += 1
    }
    n
  }

  /** Count of maximal `\w`-runs whose ASCII-lowercased form is in
    * `words` == `regexp_count(lower(s), "\b(?:w1|w2|...)\b")` for
    * ASCII word lists.
    */
  def wordSetCount(s: UTF8String, words: java.util.HashSet[String]): Int = {
    val bytes = s.getBytes
    var n = 0; var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < bytes.length) {
      val b = bytes(i)
      if (!isCont(b) && isWord(b)) {
        sb.append((if (b >= 'A' && b <= 'Z') b + 32 else b.toInt).toChar)
      } else if (sb.length() > 0) {
        // any non-word byte — including the lead/continuation bytes of a
        // non-ASCII char, which is never `\w` — terminates the run
        if (words.contains(sb.toString)) n += 1
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length() > 0 && words.contains(sb.toString)) n += 1
    n
  }
}

/** `ws_token_count(string)` → int. */
case class WsTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ws_token_count expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.wsTokenCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wsTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ascii_class_count(string, mode)` → int. */
case class AsciiClassCount(child: Expression, mode: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_class_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ascii_class_count expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.asciiClassCount(s.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.asciiClassCount($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_set_count(string, words)` → int: `\b(?:w1|...)\b` matches on the
  * ASCII-lowercased text.
  */
case class WordSetCount(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_set_count"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(w => s.add(w.toLowerCase))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_set_count expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.wordSetCount(s.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wordSetCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  def wsTokenCount(c: Column): Column =
    Bridge.column(WsTokenCount(Bridge.expression(c)))
  def alphaCount(c: Column): Column =
    Bridge.column(AsciiClassCount(Bridge.expression(c), 0))
  def punctCount(c: Column): Column =
    Bridge.column(AsciiClassCount(Bridge.expression(c), 1))
  def wordSetCount(c: Column, words: Seq[String]): Column =
    Bridge.column(WordSetCount(Bridge.expression(c), words))
}
