package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The cast-key unwrap must be invisible semantically (identical rows to
  * the string-keyed plan on every integral edge case) and visible
  * physically (no Cast remains in the join condition, the join hashes
  * raw integrals) — and must NOT fire where rendering and numeric
  * equality disagree (fractional types).
  */
class UnwrapCastKeyJoinSpec extends AnyFunSuite {
  import spark.implicits._

  private def withoutRule[T](f: => T): T = {
    spark.conf.set(UnwrapCastKeyJoin.EnabledKey, "false")
    try f finally spark.conf.unset(UnwrapCastKeyJoin.EnabledKey)
  }

  // adversarial integral keys: signs, zero, extremes, null
  private def left = Seq[java.lang.Long](
    0L, 1L, -1L, 5L, -5L, 42L, Long.MaxValue, Long.MinValue, null)
    .toDF("lk")
  private def right = Seq[java.lang.Long](
    0L, -1L, 5L, 7L, Long.MaxValue, Long.MinValue, null)
    .toDF("rk")

  private def castJoin(l: DataFrame, r: DataFrame, how: String): DataFrame =
    l.join(r, l("lk").cast(StringType) === r("rk").cast(StringType), how)
      .select(col("lk"), col("rk"))

  private def rows(df: DataFrame) =
    df.collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
      .sortBy(_.toString)

  test("unwrapped join returns exactly the string-keyed rows (inner/left/outer)") {
    for (how <- Seq("inner", "left", "full_outer")) {
      val got = rows(castJoin(left, right, how))
      val want = withoutRule(rows(castJoin(left, right, how)))
      assert(got == want, s"join type $how")
    }
  }

  test("null-safe equality unwraps with identical null matching") {
    val (l, r) = (left, right)
    def q = l.join(r, l("lk").cast(StringType) <=> r("rk").cast(StringType))
      .select(col("lk"), col("rk"))
    assert(rows(q) == withoutRule(rows(q)))
    // the null <=> null row must be present under both plans
    assert(rows(q).contains((None, None)))
  }

  test("mixed integral widths widen losslessly (int keys vs long keys)") {
    val l = Seq(1, -1, 42, Int.MaxValue, Int.MinValue).toDF("lk")
      .select(col("lk").cast("int").as("lk"))
    val r = Seq(1L, -1L, Int.MaxValue.toLong, Int.MinValue.toLong, 7L).toDF("rk")
    def q = l.join(r, l("lk").cast(StringType) === r("rk").cast(StringType))
      .select(col("lk"), col("rk"))
    assert(rows(q) == withoutRule(rows(q)))
    assert(rows(q).size == 4)
  }

  test("the optimized plan joins on raw integrals — no cast, no string key") {
    val q = castJoin(left, right, "inner")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cast(lk"),
      s"join key cast survived:\n$optimized")
    // baseline keeps the casts (sanity that the assertion can fail)
    val baseline = withoutRule(castJoin(left, right, "inner")
      .queryExecution.optimizedPlan.toString)
    assert(baseline.toLowerCase.contains("cast"))
  }

  test("fractional casts do NOT unwrap: '5.0' <> '5' even though 5.0 == 5") {
    val l = Seq(5.0d, 2.5d).toDF("lk")
    val r = Seq(5L, 2L).toDF("rk")
    def q = l.join(r, l("lk").cast(StringType) === r("rk").cast(StringType))
    // string semantics: no matches ("5.0" vs "5"); numeric would match 5
    assert(q.count() == 0L)
    assert(withoutRule(q.count()) == 0L)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cast"), "fractional cast must survive")
  }

  test("ordering comparisons are untouched (strings order differently)") {
    val l = Seq(9L, 10L).toDF("lk")
    val r = Seq(10L, 9L).toDF("rk")
    def q = l.join(r, l("lk").cast(StringType) < r("rk").cast(StringType))
    // "10" < "9" lexicographically: pairs (10,9) and (10,... ) — pin the
    // string-semantics row set and that both plans agree on it
    val got = rows(q.select(col("lk"), col("rk")))
    assert(got == withoutRule(rows(q.select(col("lk"), col("rk")))))
    assert(got.contains((Some(10L), Some(9L))), "lexicographic, not numeric")
  }
}
