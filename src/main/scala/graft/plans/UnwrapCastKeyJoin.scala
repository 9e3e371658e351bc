package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule unwrapping PROVABLY-INJECTIVE integral→string casts
  * from equi-join keys: `CAST(x AS STRING) = CAST(y AS STRING)` with
  * x, y integral becomes `x = y` (widened to long when widths differ).
  *
  * Why it exists: the reference pipeline joins on `astype(str)`
  * normalized keys (J2/F7, `clinical.py:170` — a pandas habit that
  * survives into production schemas), and the straightforward Spark
  * translation renders every fact-side key to a UTF8String before
  * probing — at 60M rows the render + string hashing IS the query's
  * cost (measured ~19× the single-node oracle at sf10). But decimal
  * rendering of an integral is a bijection into strings: two integral
  * values are equal iff their renderings are equal (equal values render
  * identically — cross-width too, after the numeric widening equality
  * itself implies; distinct values differ in sign, length, or a digit).
  * So FOR EQUALITY the cast is dead weight, and the join can hash raw
  * longs — the strings never need to exist. The same argument does NOT
  * hold for ordering comparisons ("10" < "9" as strings) or for
  * fractional types (5.0d renders "5.0" but equals integral 5
  * numerically) — the rule fires on integral-typed equality only.
  *
  * Scope guards:
  *  - only EqualTo / EqualNullSafe nodes INSIDE a join condition;
  *  - both cast children integral (byte/short/int/long); mixed widths
  *    are widened with a lossless integral upcast;
  *  - null semantics are untouched: integral→string cast is
  *    null-preserving, so both equality forms null-propagate (or
  *    null-safe-compare) identically.
  *
  * A projected string key (`withColumn("k", $"x".cast("string"))` then
  * `join(..., Seq("k"))`) is out of scope — the cast hides behind an
  * attribute of a child Project and unwrapping would have to re-plumb
  * the projection; write the cast in the join condition to get the
  * rewrite. Registered cluster-wide by [[graft.GraftExtensions]].
  */
object UnwrapCastKeyJoin extends Rule[LogicalPlan] {

  /** Session opt-out (A/B baselines, emergency escape hatch). */
  val EnabledKey = "spark.graft.unwrapCastKeyJoin.enabled"

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def stringType(dt: DataType): Boolean = dt match {
    case _: StringType => true // collated string types included
    case _ => false
  }

  /** x, y widened to a common integral type (equality-preserving). */
  private def widen(x: Expression, y: Expression): (Expression, Expression) =
    if (x.dataType == y.dataType) (x, y)
    else (Cast(x, LongType), Cast(y, LongType))

  private def unwrapEquality(e: Expression): Expression = e match {
    case EqualTo(Cast(l, dt, _, _), Cast(r, dt2, _, _))
        if stringType(dt) && stringType(dt2) &&
          integral(l.dataType) && integral(r.dataType) =>
      val (lw, rw) = widen(l, r)
      EqualTo(lw, rw)
    case EqualNullSafe(Cast(l, dt, _, _), Cast(r, dt2, _, _))
        if stringType(dt) && stringType(dt2) &&
          integral(l.dataType) && integral(r.dataType) =>
      val (lw, rw) = widen(l, r)
      EqualNullSafe(lw, rw)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transform {
      case j: Join if j.condition.isDefined =>
        val rewritten = j.condition.get.transformUp {
          case e @ (_: EqualTo | _: EqualNullSafe) => unwrapEquality(e)
        }
        if (rewritten.fastEquals(j.condition.get)) j
        else j.copy(condition = Some(rewritten))
    }
  }
}
