package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The k-heap top-k aggregate must equal the window row_number form on
  * any input (ties included), be merge-order-independent, skip nulls,
  * and plan as ONE sort-free hash aggregate.
  */
class TopKAggSpec extends AnyFunSuite {
  import spark.implicits._

  /** Adversarial fixture: hash-generated scores with heavy ties (mod 17
    * collapses many scores per group), plus a group smaller than k and
    * a group with null scores only.
    */
  private def fixture = {
    val rows = Seq.tabulate(2000) { i =>
      val g = i % 23L
      val score = java.lang.Long.valueOf((i * 2654435761L) % 17L)
      (g, score, i.toLong)
    } ++ Seq((100L, java.lang.Long.valueOf(7L), 9001L)) ++ // group of 1 < k
      Seq((101L, null.asInstanceOf[java.lang.Long], 9002L),
        (101L, null.asInstanceOf[java.lang.Long], 9003L)) // all-null group
    rows.toDF("g", "score", "id")
  }

  private def viaAgg(parts: Int, k: Int) = fixture.repartition(parts)
    .groupBy($"g")
    .agg(TopKAgg.topK($"score", $"id", k).as("top"))
    .select($"g", posexplode($"top"))
    .select($"g", ($"pos" + 1).cast("long").as("rn"),
      $"col.score".as("score"), $"col.id".as("id"))
    .as[(Long, Long, Long, Long)].collect().toSet

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    fixture.filter($"score".isNotNull)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .select($"g", $"rn".cast("long"), $"score", $"id")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("top_k == window row_number form, ties broken by id, nulls skipped") {
    assert(viaAgg(parts = 4, k = 3) == viaWindow(k = 3))
    // all-null group contributes an empty array → no exploded rows
    assert(!viaAgg(4, 3).exists(_._1 == 101L))
    // undersized group keeps its single element
    assert(viaAgg(4, 3).count(_._1 == 100L) == 1)
  }

  test("merge-order independence: any partitioning, k spanning group size") {
    for (k <- Seq(1, 5, 1000)) {
      val one = viaAgg(parts = 1, k)
      assert(viaAgg(parts = 13, k) == one, s"k=$k")
      assert(one == viaWindow(k), s"k=$k vs window")
    }
  }

  test("plan: one exchange, hash aggregate with partial heaps, no sort") {
    val df = fixture.groupBy($"g").agg(TopKAgg.topK($"score", $"id", 3).as("top"))
    val plan = df.queryExecution.executedPlan.toString()
    assert("(?m)^\\s*(\\+- |:- )?Exchange ".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("rejects non-bigint inputs at analysis") {
    val e = intercept[Exception] {
      fixture.groupBy($"g")
        .agg(TopKAgg.topK($"score".cast("int"), $"id", 3)).collect()
    }
    assert(e.getMessage.contains("top_k") || e.getMessage.contains("BIGINT"))
  }
}
