package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

class OperatorsSpec extends AnyFunSuite {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("asof: most recent right value at-or-before, per key; no match -> null") {
    val left = Seq(
      (1L, 100L, ts(10)), // after right@5 -> 5.0
      (2L, 100L, ts(20)), // after right@15 -> 15.0
      (3L, 100L, ts(15)), // EQUAL ts -> right@15 visible ("at or before")
      (4L, 200L, ts(10)), // other key, no prior right -> null
      (5L, 200L, ts(40))  // after right@30 -> 30.0
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts(5), 5.0), (100L, ts(15), 15.0), (200L, ts(30), 30.0)
    ).toDF("user_id", "ts", "v")

    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", Seq("v"))
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(5.0))
    assert(out(2L).contains(15.0))
    assert(out(3L).contains(15.0))
    assert(out(4L).isEmpty)
    assert(out(5L).contains(30.0))
  }

  test("saltedJoin equals the plain join, spread over (key, salt) buckets") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "payload") // key 1 is hot (100 rows)
    val small = Seq((1L, "hot"), (7L, "cold")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum("payload"))
      .as[(Long, Long)].head()
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), factor = 8)
      .agg(count(lit(1)), sum("payload")).as[(Long, Long)].head()
    assert(salted == plain)
  }

  test("PrefixSum: two-pass distributed running sum == global-window running sum") {
    // ids deliberately shuffled + gappy; weights include zeros
    val rows = Seq(7L, 3L, 11L, 1L, 9L, 5L, 2L, 20L, 15L, 8L)
      .map(id => (id, id % 4)) // weight = id mod 4 (some zeros)
    val df = rows.toDF("id", "w")
    val got = PrefixSum.withRunningSum(df, "id", "w", "cum", numPartitions = 3)
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    // reference: sequential scan in id order
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, w) => acc += w; id -> acc }.toMap
    assert(got == want)
    // the heavy pass must be genuinely parallel: >1 populated partition
    val nParts = PrefixSum.withRunningSum(df, "id", "w", "cum", numPartitions = 3)
      .select(org.apache.spark.sql.functions.spark_partition_id()).distinct().count()
    assert(nParts > 1, "range partitioning must spread rows across partitions")
    // correctness precondition: BOTH branches must execute ONE shared
    // range exchange — a second independent repartitionByRange could
    // sample different partition bounds and mismatch offsets to rows
    val out = PrefixSum.withRunningSum(df, "id", "w", "cum", numPartitions = 3)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"range exchange must be shared, not duplicated:\n${plan.take(600)}")
  }
}
