package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule rewriting a point-in-interval INNER join
  * (`p BETWEEN lo AND hi`, no equi keys) into a binned equi-join.
  *
  * Without this, Catalyst has no equi keys to hash on and plans a
  * BroadcastNestedLoopJoin — every point row is tested against every
  * interval, O(|points|·|intervals|), the classic range-join cliff (the
  * same problem Databricks' range-join optimization and Flink's interval
  * join solve; both bucketize). The rewrite:
  *
  *   points    → project an extra `__graft_bin_p = p div W` column
  *   intervals → filter lo ≤ hi, explode `sequence(lo div W, hi div W)`
  *   join      → equi on the bin PLUS the original range predicate
  *
  * `div` (truncating integral divide) is monotone non-decreasing, so for
  * any lo ≤ v ≤ hi, bin(v) ∈ [bin(lo), bin(hi)] — every true match lands
  * in exactly one shared bin and the re-applied exact predicate removes
  * the bin's false positives. Correct for any sign; bin width W
  * (`spark.graft.rangeJoin.binWidth`, default 3 600 000 — one hour of
  * epoch-millis) trades explode fan-out (≈ interval_len/W rows per
  * interval) against bin selectivity, the standard range-join knob.
  * The default suits epoch-millis time joins; for a SMALL integral
  * domain (ids, scores) it degenerates to one bin — a single hot join
  * key, worse than the nested loop — so set the width to roughly the
  * typical interval length of YOUR data, exactly as Databricks' range
  * join hint requires. Intervals spanning more than
  * `spark.graft.rangeJoin.maxBinsPerInterval` bins (sentinel
  * open-ended bounds) fail fast with a message naming the knob rather
  * than materializing a giant Sequence array.
  *
  * At scale this turns the nested loop into one shuffle of points by bin
  * and ≈len/W copies of each interval — linear, partitionable, AQE- and
  * skew-handling-friendly like any other equi-join.
  *
  * Scope guards (rewrite only when it is a pure win):
  *  - INNER join whose condition is EXACTLY two range conjuncts bounding
  *    the same point expression (no equi conjunct — if one exists,
  *    Catalyst already hash-joins on it);
  *  - point from one side, both bounds from the other, all integral
  *    (long/int) and deterministic.
  *
  * Registered cluster-wide by [[graft.GraftExtensions]]
  * (injectOptimizerRule) or per-session via
  * `spark.experimental.extraOptimizations`. Disable with
  * `spark.graft.rangeJoin.enabled=false`.
  */
object BinnedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeJoin.enabled"
  val BinWidthKey = "spark.graft.rangeJoin.binWidth"
  /** Fail-fast ceiling on bins per interval: a sentinel bound (e.g.
    * `valid_to = Long.MaxValue`) would otherwise ask Sequence to
    * materialize trillions of elements and kill the executor with an
    * opaque array error. Exceeding the cap raises a message naming the
    * width knob instead. */
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val width = conf.getConfString(BinWidthKey, "3600000").toLong
    require(width > 0, s"$BinWidthKey must be positive, got $width")
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => tryRewrite(j, width).getOrElse(j)
    }
  }

  /** Normalize a comparison conjunct to `small ≤ big` (strictness is
    * irrelevant for binning — the exact predicate is re-applied).
    */
  private def asLe(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b)    => Some((a, b))
    case LessThan(a, b)           => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b)        => Some((b, a))
    case _                        => None
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def tryRewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjs = splitConjunctivePredicates(cond)
    if (conjs.length != 2) return None
    val les = conjs.flatMap(asLe)
    if (les.length != 2) return None
    val Seq((s1, b1), (s2, b2)) = les
    // the point is the expression bounded on both sides: s1 ≤ p ≤ b2
    val pair =
      if (b1.semanticEquals(s2)) Some((b1, s1, b2))
      else if (b2.semanticEquals(s1)) Some((b2, s2, b1))
      else None
    pair.flatMap { case (p, lo, hi) =>
      if (!Seq(p, lo, hi).forall(e => e.deterministic && integral(e))) None
      else {
        val fromLeft  = (e: Expression) => e.references.subsetOf(j.left.outputSet)
        val fromRight = (e: Expression) => e.references.subsetOf(j.right.outputSet)
        val boundsTogether =
          (fromLeft(lo) && fromLeft(hi)) || (fromRight(lo) && fromRight(hi))
        if (p.references.isEmpty || !boundsTogether) None
        else if (fromLeft(p) && fromRight(lo) && fromRight(hi))
          Some(build(j, p, lo, hi, width, pointOnLeft = true))
        else if (fromRight(p) && fromLeft(lo) && fromLeft(hi))
          Some(build(j, p, lo, hi, width, pointOnLeft = false))
        else None
      }
    }
  }

  private def build(j: Join, p: Expression, lo: Expression, hi: Expression,
                    width: Long, pointOnLeft: Boolean): LogicalPlan = {
    val w = Literal(width)
    def binOf(e: Expression): Expression =
      IntegralDivide(Cast(e, LongType), w)
    val (pSide, iSide) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    val binAlias = Alias(binOf(p), "__graft_bin_p")()
    val newPSide = Project(pSide.output :+ binAlias, pSide)

    // lo > hi (or null bound) can never match an inner join — filter
    // before exploding so Sequence never sees inverted boundaries; in the
    // same pass, fail fast (with the knob named) on interval spans whose
    // bin fan-out exceeds the cap — AssertTrue returns null on success,
    // so the IsNull wrapper is a pass-through predicate that throws with
    // a clear message instead of letting Sequence build a giant array
    val maxBins = conf.getConfString(MaxBinsKey, "1000000").toLong
    // Coalesce(span ≤ max, true): a NULL bound makes the span NULL — that
    // row is unmatched (dropped by the lo ≤ hi conjunct), NOT an error,
    // so the raise must only fire on a definite over-cap span
    // span compared in Double: Long subtraction wraps for sentinel-wide
    // bounds (lo near Long.MinValue, hi = Long.MaxValue, width 1 → span
    // 2^64 wraps negative and slips under the cap). Double subtraction
    // saturates toward ±inf instead; ulp error near 2^60 is ~256 bins —
    // irrelevant against a giant-array cap.
    val spanOk = IsNull(If(
      Coalesce(Seq(
        LessThanOrEqual(
          Subtract(Cast(binOf(hi), DoubleType), Cast(binOf(lo), DoubleType)),
          Literal(maxBins.toDouble)),
        Literal(true))),
      Literal.create(null, org.apache.spark.sql.types.NullType),
      new RaiseError(Literal(
        s"BinnedRangeJoin: interval spans more than $maxBins bins; " +
          s"raise $BinWidthKey (or $MaxBinsKey) for this data"))))
    val nonEmpty = Filter(And(LessThanOrEqual(lo, hi), spanOk), iSide)
    val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED until the
    // timezone is bound (even for integral sequences where it is unused)
    val seqExpr = new Sequence(binOf(lo), binOf(hi), Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val newISide = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binAttr), nonEmpty)

    val eq = EqualTo(binAlias.toAttribute, binAttr)
    val (nl, nr) = if (pointOnLeft) (newPSide, newISide) else (newISide, newPSide)
    // re-apply the ORIGINAL condition: the bin equi-join is a superset
    Project(j.output.toList, Join(nl, nr, Inner,
      Some(And(eq, j.condition.get)), j.hint))
  }
}
