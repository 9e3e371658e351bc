package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The range-join rewrite must be invisible semantically (same rows as
  * the nested-loop plan for every sign/edge case) and visible physically
  * (the nested loop is gone, an equi-join on the bin appears).
  */
class BinnedRangeJoinSpec extends AnyFunSuite {
  import spark.implicits._

  // The rule is session-wide (installed by GraftExtensions via
  // spark.sql.extensions in SparkTestBase — the deployment model).
  // Baselines run with the documented opt-out flag, not by mutating
  // spark.experimental.extraOptimizations.
  private def withoutRule[T](f: => T): T = {
    spark.conf.set(BinnedRangeJoin.EnabledKey, "false")
    try f finally spark.conf.unset(BinnedRangeJoin.EnabledKey)
  }

  // points across signs and bin boundaries; width divides/straddles both
  private def points = Seq(-25L, -10L, -1L, 0L, 1L, 9L, 10L, 11L, 99L, 100L, 250L)
    .toDF("p")
  private def intervals = Seq(
    (1L, -30L, -20L),  // all-negative interval
    (2L, -5L, 5L),     // straddles zero
    (3L, 0L, 0L),      // single point
    (4L, 10L, 99L),    // multi-bin
    (5L, 200L, 100L),  // inverted — matches nothing, must not crash
    (6L, 240L, 260L))
    .toDF("iv_id", "lo", "hi")

  private def joined: DataFrame =
    points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("iv_id"), col("p"))

  private def result(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rewrite preserves semantics across signs, boundaries, inverted intervals") {
    spark.conf.set(BinnedRangeJoin.BinWidthKey, "10")
    val naive = withoutRule(result(joined))
    val binned = result(joined)
    assert(binned == naive)
    assert(naive.contains((2L, 0L)) && naive.contains((4L, 10L)) &&
      naive.contains((4L, 99L)) && !naive.exists(_._1 == 5L))
    spark.conf.unset(BinnedRangeJoin.BinWidthKey)
  }

  test("physical plan: nested loop without the rule, equi-join with it") {
    def plan(df: DataFrame) = df.queryExecution.executedPlan.toString()
    val without = withoutRule(plan(joined))
    assert(without.contains("BroadcastNestedLoopJoin"),
      "baseline must be the nested loop the rule exists to remove")
    val withIt = plan(joined)
    assert(!withIt.contains("BroadcastNestedLoopJoin"), withIt.take(400))
    assert(withIt.contains("__graft_bin"), "bin key must drive the join")
  }

  test("strict bounds rewrite too; equi-keyed joins are left alone") {
    val strict = points.join(intervals, col("p") > col("lo") && col("p") < col("hi"))
      .select(col("iv_id"), col("p"))
    val naive = withoutRule(result(strict))
    assert(result(strict) == naive)
    // an equality conjunct means Catalyst already hash-joins — no rewrite
    val equi = points.withColumn("k", col("p") % 2)
      .join(intervals.withColumn("k", col("iv_id") % 2),
        Seq("k"), "inner")
    assert(!equi.queryExecution.executedPlan.toString().contains("__graft_bin"))
  }

  test("sentinel-wide interval fails fast naming the width knob, not an array error") {
    spark.conf.set(BinnedRangeJoin.BinWidthKey, "10")
    spark.conf.set(BinnedRangeJoin.MaxBinsKey, "1000")
    try {
      val sentinel = Seq((1L, 0L, Long.MaxValue)).toDF("iv_id", "lo", "hi")
      val ex = intercept[Exception] {
        points.join(sentinel, col("p") >= col("lo") && col("p") <= col("hi")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("rangeJoin.binWidth")),
        s"expected the knob-naming error, got: ${ex.getMessage}")
    } finally {
      spark.conf.unset(BinnedRangeJoin.BinWidthKey)
      spark.conf.unset(BinnedRangeJoin.MaxBinsKey)
    }
  }

  test("NULL interval bounds drop the row (unmatched), never raise the span error") {
    spark.conf.set(BinnedRangeJoin.BinWidthKey, "10")
    try {
      val withNulls = Seq((1L, Some(0L), Some(20L)), (2L, None, Some(5L)),
        (3L, Some(5L), None)).toDF("iv_id", "lo", "hi")
      val got = points
        .join(withNulls, col("p") >= col("lo") && col("p") <= col("hi"))
        .select(col("iv_id"), col("p")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.forall(_._1 == 1L), "null-bounded intervals match nothing")
      assert(got.nonEmpty)
    } finally spark.conf.unset(BinnedRangeJoin.BinWidthKey)
  }

  test("disabled flag is a clean no-op") {
    spark.conf.set(BinnedRangeJoin.EnabledKey, "false")
    try assert(joined.queryExecution.executedPlan.toString()
      .contains("BroadcastNestedLoopJoin"))
    finally spark.conf.unset(BinnedRangeJoin.EnabledKey)
  }
}
