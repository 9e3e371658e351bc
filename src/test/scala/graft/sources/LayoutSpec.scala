package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}
import graft.Tables

/** The two physical layouts that decide shuffle cost at scale: partition
  * pruning for the per-dataset fan-out, bucketed co-located joins for the
  * repeated key joins. Both asserted at the PLAN level — a layout that
  * silently stops pruning or starts shuffling is a perf regression the
  * row-level tests can't see.
  */
class LayoutSpec extends AnyFunSuite {

  test("partitioned write + filtered read prunes to one partition directory") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-p").toString
    Layout.writePartitioned(
      Tables.orders(spark, sf001), s"$tmp/orders_p", "o_orderstatus")
    val re = spark.read.parquet(s"$tmp/orders_p").filter(col("o_orderstatus") === "O")
    val plan = re.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"),
      s"expected partition filters in scan:\n$plan")
    // pruned read must agree with the unpartitioned filter
    val expected = Tables.orders(spark, sf001)
      .filter(col("o_orderstatus") === "O").count()
    assert(re.count() == expected)
  }

  test("compact merges a many-small-file directory, preserving the data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-c").toString
    val dir = s"$tmp/orders_small"
    val orders = Tables.orders(spark, sf001)
    orders.repartition(24).write.parquet(dir) // deliberately fragmented
    val checksum = (d: org.apache.spark.sql.DataFrame) =>
      d.agg(org.apache.spark.sql.functions.sum("o_orderkey"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
        .collect().head.toSeq
    val beforeSum = checksum(spark.read.parquet(dir))
    val (nBefore, nAfter) = Layout.compact(spark, dir)
    assert(nBefore == 24 && nAfter == 1, s"$nBefore -> $nAfter")
    assert(checksum(spark.read.parquet(dir)) == beforeSum)
  }

  test("analyzed table exposes exact row and column stats to the optimizer") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-s").toString
    val db = "graft_stats_spec"
    Layout.ensureDb(spark, db, tmp)
    Tables.customer(spark, sf001).select("c_custkey", "c_mktsegment")
      .write.mode("overwrite").format("parquet").saveAsTable(s"$db.cust_s")
    Layout.analyzeTable(spark, db, "cust_s", Seq("c_custkey", "c_mktsegment"))
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val t = spark.table(s"$db.cust_s")
      val stats = t.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(t.count())),
        s"expected exact rowCount from ANALYZE, got ${stats.rowCount}")
      val distinctSegs = stats.attributeStats.collectFirst {
        case (a, s) if a.name == "c_mktsegment" => s.distinctCount
      }.flatten
      assert(distinctSegs.contains(BigInt(5)),
        s"expected 5 distinct segments in column stats, got $distinctSegs")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("z-ordered layout tightens per-file min/max on BOTH dimensions") {
    import org.apache.spark.sql.functions._
    val df = Tables.orders(spark, sf001)
      .select(col("o_custkey"), col("o_totalprice"))
    val naiveDir = java.nio.file.Files.createTempDirectory("graft-zn").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft-zo").toString
    // naive: same file count, no clustering
    df.repartition(4).write.mode("overwrite").parquet(naiveDir)
    val nFiles = Layout.writeZOrdered(spark, df, zDir,
      "o_custkey", "o_totalprice", bits = 8, numFiles = 4)
    assert(nFiles == 4)
    // per-file (max-min) spread, summed over files, for each dimension —
    // the quantity parquet footer stats expose to the reader's skipper
    def spread(dir: String, c: String): Double =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("r"))
        .agg(sum(col("r"))).head().getDouble(0)
    val (nCust, zCust) = (spread(naiveDir, "o_custkey"), spread(zDir, "o_custkey"))
    val (nPrice, zPrice) = (spread(naiveDir, "o_totalprice"), spread(zDir, "o_totalprice"))
    assert(zCust < nCust * 0.8,
      s"z-order must tighten custkey file ranges: $zCust vs naive $nCust")
    assert(zPrice < nPrice * 0.8,
      s"z-order must tighten totalprice file ranges: $zPrice vs naive $nPrice")
    // data preserved
    assert(spark.read.parquet(zDir).count() == df.count())
  }

  test("bucketed tables join with zero exchanges (co-located SMJ)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-b").toString
    val db = "graft_layout_spec"
    Layout.ensureDb(spark, db, tmp)
    Layout.writeBucketed(Tables.orders(spark, sf001).select("o_orderkey", "o_orderstatus"),
      db, "o_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    Layout.writeBucketed(Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity"),
      db, "l_b", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path so the bucketed-join property is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = spark.table(s"$db.o_b")
      val li = spark.table(s"$db.l_b")
      val joined = o.join(li, o("o_orderkey") === li("l_orderkey"))
      joined.count() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
