package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded (banded) edit distance for the sketch-verify stage.
  *
  * The built-in `levenshtein` is semantically right but algorithmically
  * unbounded: O(m·n) cells with per-character UTF-8 decoding, even though
  * a dedup verifier only ever asks "is the distance ≤ k?". This kernel
  * computes the classic Ukkonen band: only cells with |i−j| ≤ k, two
  * saturating rows, early exit the moment the whole band exceeds k —
  * O(min(m,n)·k) time, O(n) space, byte-compare fast path.
  *
  * Byte-based: callers normalize to ASCII first (dd_lev_pairs strips
  * non-ASCII from its prefix), where byte == character distance. On raw
  * UTF-8 the byte distance is an upper bound — fine for a ≤ k gate,
  * documented so nobody reads it as exact character distance.
  */
object EditOps {

  /** Exact distance if ≤ cap, else cap+1 (saturated). */
  def boundedLev(a: UTF8String, b: UTF8String, cap: Int): Int = {
    val s = a.getBytes
    val t = b.getBytes
    val m = s.length
    val n = t.length
    if (m - n > cap || n - m > cap) return cap + 1
    if (java.util.Arrays.equals(s, t)) return 0
    val inf = cap + 1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= n && j <= cap) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - cap)
      val hi = math.min(n, i + cap)
      var rowMin = inf
      if (lo == 1 && i <= cap) { cur(0) = i; rowMin = i }
      var jj = lo
      while (jj <= hi) {
        val cost = if (s(i - 1) == t(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (rowMin >= inf) return inf // whole band over budget — give up early
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(n), inf)
  }
}

/** `lev_bounded(string, string, k)` → int: exact Levenshtein if ≤ k, else
  * k+1. Codegen'd static call, stays inside whole-stage codegen.
  */
case class LevenshteinBounded(left: Expression, right: Expression, cap: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lev_bounded"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if cap >= 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lev_bounded expects (string, string) and cap >= 0, got " +
          s"${left.dataType} / ${right.dataType} / cap=$cap")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditOps.boundedLev(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.EditOps.boundedLev($a, $b, $cap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EditDistance {
  /** Column API: bounded Levenshtein (exact ≤ cap, saturates at cap+1). */
  def levBounded(a: Column, b: Column, cap: Int): Column =
    Bridge.column(LevenshteinBounded(Bridge.expression(a), Bridge.expression(b), cap))
}
