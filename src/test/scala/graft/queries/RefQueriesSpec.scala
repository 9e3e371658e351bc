package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}

/** Smoke + spot-value tests for every registered query at sf0.001. Exact
  * value equality against the DuckDB oracle is the driver's gate
  * (tools/check.py); here we pin schema and a few hand-computed values so
  * `sbt test` catches regressions without DuckDB.
  */
class RefQueriesSpec extends AnyFunSuite {

  test("every query runs and its oracle (if SQL) is non-empty") {
    val qs = graft.SparkEntry.queries
    val oracle = graft.SparkEntry.oracleSql
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
    oracle.keys.foreach(k => assert(qs.contains(k), s"oracle $k has no query"))
  }

  test("q1_agg groups cover the 6 returnflag/linestatus combos") {
    val rows = RefQueries.q1Agg(spark, sf001).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == graft.Tables.lineitem(spark, sf001).count())
  }

  test("a2_approx_distinct: HLL estimate within 3 sigma of exact") {
    val row = RefQueries.a2ApproxDistinct(spark, sf001).head()
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.lineitem(spark, sf001)
      .agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey"))).head()
    // tolerance = 3×rsd (query uses rsd=0.02): a 1×rsd bound is one
    // standard deviation of the estimator — ~32% flake odds on any
    // regenerated dataset; 3σ holds across refreshes
    def close(approx: Long, truth: Long): Boolean =
      math.abs(approx - truth).toDouble / truth < 0.06
    assert(close(row.getLong(0), exact.getLong(0)),
      s"orders: ${row.getLong(0)} vs ${exact.getLong(0)}")
    assert(close(row.getLong(1), exact.getLong(1)),
      s"parts: ${row.getLong(1)} vs ${exact.getLong(1)}")
  }

  test("p5 drops the all-null column from the schema") {
    val df = RefQueries.p5DropAllNaCols(spark, sf001)
    assert(!df.columns.contains("junk"))
    assert(df.columns.toSeq == Seq("o_orderkey", "o_orderstatus", "o_custkey"))
  }

  test("a7 keep-last yields one row per key") {
    val df = RefQueries.a7KeepLast(spark, sf001)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("j3 full outer row count = matched + left-only + right-only") {
    import org.apache.spark.sql.functions._
    val n = RefQueries.j3FullOuter(spark, sf001)
      .agg(sum("n_rows")).head().getLong(0)
    val c = graft.Tables.customer(spark, sf001)
    val o = graft.Tables.orders(spark, sf001)
    val matched = c.join(o, c("c_custkey") === o("o_custkey")).count()
    val leftOnly = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    val rightOnly = o.join(c, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(n == matched + leftOnly + rightOnly)
  }

  test("j5 live mode is bit-identical to the broadcast-join form") {
    // The r11 KeyedStore rewrite (driver O(1) — no collect().toMap):
    // the live client must remain indistinguishable from the join face.
    val live = RefQueries.j5LiveAnnotate(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val join = RefQueries.j5AnnotationJoin(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(live == join)
    assert(live.nonEmpty)
  }

  test("f9 chunks are consecutive and sized ≤ 400") {
    val rows = RefQueries.f9Chunks(spark, sf001).orderBy("chunk").collect()
    assert(rows.forall(_.getAs[Long]("n") <= 400))
    // every chunk except the last is exactly full
    assert(rows.dropRight(1).forall(_.getAs[Long]("n") == 400))
  }
}
