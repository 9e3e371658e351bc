package graft.validation

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The validation combinators (SURVEY §2.10 V1-V17) against tiny frames
  * with known defects — replaces the reference's caplog assertions
  * (reference tests/test_maf.py:98-142) with data assertions.
  */
class RulesSpec extends AnyFunSuite {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, rules: Seq[Rules.Rule]) =
    Rules.evaluate(spark, df, rules).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("noNulls flags null keys (V5/V6)") {
    val df = Seq(Some("a"), None, Some("b")).toDF("SAMPLE_ID")
    val r = report(df, Seq(Rules.noNulls("SAMPLE_ID")))
    assert(r("no_null_SAMPLE_ID") == (1L, false))
  }

  test("noKeyedDups flags duplicate keys (V14/A5)") {
    val df = Seq("a", "a", "b").toDF("k")
    val r = report(df, Seq(Rules.noKeyedDups("k")))
    assert(r("no_dup_k") == (1L, false))
    val clean = report(Seq("a", "b").toDF("k"), Seq(Rules.noKeyedDups("k")))
    assert(clean("no_dup_k") == (0L, true))
  }

  test("notAllNa fails on an all-null column (V7)") {
    val df = Seq((1, None: Option[String]), (2, None)).toDF("id", "c")
    val r = report(df, Seq(Rules.notAllNa("c"), Rules.notAllNa("id")))
    assert(r("not_all_na_c")._2 == false)
    assert(r("not_all_na_id")._2 == true)
  }

  test("setEquality both directions (V10/V12/A9)") {
    val a = Seq("s1", "s2", "s3").toDF("barcode")
    val b = Seq("s1", "s2").toDF("Sample_ID")
    val rows = Rules.setEquality(spark, "ids", a, "barcode", b, "Sample_ID")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows("ids_a_minus_b") == (1L, false))
    assert(rows("ids_b_minus_a") == (0L, true))
  }

  test("noRowGrowth flags outer-join growth (V16)") {
    val grew = Rules.noRowGrowth(spark, "neo_merge", before = 10L, after = 12L).head()
    assert(!grew.getBoolean(2) && grew.getLong(1) == 2L)
    val ok = Rules.noRowGrowth(spark, "neo_merge", before = 10L, after = 10L).head()
    assert(ok.getBoolean(2))
  }

  test("V15/V16 observed forms: same values as the eager forms, zero extra job") {
    import graft.pipelines.ClinicalPipeline
    val clinical = Seq(("s1", "p1"), ("s2", "p2")).toDF("SAMPLE_ID", "PATIENT_ID")
    val neo = Seq(("s2", 7L), ("s9", 3L), ("s10", 1L)).toDF("SAMPLE_ID", "NEO_COUNT")
    val lens = Seq(("s1", "lens-1")).toDF("study_sample_name", "lens_id")

    // eager baselines
    val (_, neoOnlyEager) = ClinicalPipeline.mergeNeoantigen(clinical, neo)
    val (_, lensNullsEager) = ClinicalPipeline.addLensDisplayName(clinical, lens)
    assert(neoOnlyEager == 2L && lensNullsEager == 1L)

    val tracker = spark.sparkContext.statusTracker
    def jobs = tracker.getJobIdsForGroup(null).length

    val (merged, nObs, nRules) = ClinicalPipeline.mergeNeoantigenObserved(clinical, neo)
    merged.count() // plain action; V16 metric rides it
    val afterNeoAction = jobs
    assert(Rules.observedRows(nObs, nRules).head._2 == neoOnlyEager)
    assert(jobs == afterNeoAction, "reading the metric must not launch a job")
    assert(!merged.columns.contains("__clin"), "tag column must not leak")

    val (lensed, lObs, lRules) = ClinicalPipeline.addLensDisplayNameObserved(clinical, lens)
    lensed.count()
    val afterLensAction = jobs
    assert(Rules.observedRows(lObs, lRules).head._2 == lensNullsEager)
    assert(jobs == afterLensAction, "reading the metric must not launch a job")
  }

  test("observed rules ride the materializing action — no extra scan, same values") {
    val orders = graft.Tables.orders(spark, graft.SparkTestBase.sf001)
    val rules = Seq(Rules.rowCount("orders"), Rules.noNulls("o_orderkey"),
      Rules.notAllNa("o_orderstatus"))
    val (instrumented, obs) = Rules.observed(orders, "obs_rules_spec", rules)
    // job parity: the instrumented action must launch exactly as many
    // jobs as the plain one — validation adds NO pass of its own.
    // Count per unique job GROUP: the global job-id list is bounded by
    // spark.ui.retainedJobs, so start/end deltas go negative once a
    // long test session evicts older entries mid-measurement.
    val sc = spark.sparkContext
    def jobsIn(group: String)(body: => Unit): Int = {
      sc.setJobGroup(group, group)
      try body finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(group).length
    }
    val plainJobs = jobsIn("rules-plain") { orders.count() }
    var nRows = 0L
    var report = Map.empty[String, (Long, Boolean)]
    val instrumentedJobs = jobsIn("rules-instr") {
      nRows = instrumented.count() // stand-in for an export write
      report = Rules.observedReport(spark, obs, rules).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    }
    assert(instrumentedJobs <= plainJobs,
      s"metrics must not launch their own job ($instrumentedJobs vs $plainJobs)")
    assert(report("rows_orders") == (nRows, true))
    assert(report("no_null_o_orderkey") == (0L, true))
    assert(report("not_all_na_o_orderstatus")._2)
  }

  test("observed rules coalesce to zero on an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val rules = Seq(Rules.rowCount("empty"), Rules.noNulls("k"))
    val (instrumented, obs) = Rules.observed(empty, "obs_empty_spec", rules)
    instrumented.write.mode("overwrite")
      .parquet(java.nio.file.Files.createTempDirectory("graft-obs").toString + "/out")
    val rep = Rules.observedReport(spark, obs, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("rows_empty") == 0L && rep("no_null_k") == 0L)
  }

  test("standardReport over sf0.001: key-integrity rules pass, orphan orders reported") {
    val rep = Rules.standardReport(spark, graft.SparkTestBase.sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep.size == 10)
    assert(rep("no_null_o_orderkey")._2 && rep("no_dup_o_orderkey")._2)
    // the corpus genuinely contains orders without lineitems — the rule
    // must SURFACE that (value > 0, passed = false), not hide it
    assert(rep("orderkeys_a_minus_b")._1 > 0 && !rep("orderkeys_a_minus_b")._2)
    assert(rep("orderkeys_b_minus_a") == (0L, true))
  }

  test("evaluate rejects duplicate rule names instead of silently collapsing them") {
    val df = Seq("a", "b").toDF("k")
    val dup = Seq(Rules.rowCount("x"), Rules.rowCount("x"))
    val e = intercept[IllegalArgumentException](Rules.evaluate(spark, df, dup))
    assert(e.getMessage.contains("rows_x"))
  }

  test("evaluate fuses a lone distinct rule into the plain pass (no Expand), splits only the 2nd+") {
    import org.apache.spark.sql.functions.{countDistinct, col}
    val plain = Seq(Rules.rowCount("t"), Rules.noNulls("k"))
    val d1 = Rules.Rule("d1", countDistinct(col("k")), passWhenZero = false)
    val d2 = Rules.Rule("d2", countDistinct(col("v")), passWhenZero = false)
    // routing: one distinct rides the fused scan; only the 2nd+ split
    val (fused1, split1) = Rules.splitForEvaluation(plain :+ d1)
    assert(fused1.map(_.name) == Seq("rows_t", "no_null_k", "d1") && split1.isEmpty)
    // the detection itself: the naive Catalyst-tree check silently
    // answered false for DSL countDistinct since the Spark 4 ColumnNode
    // split (every rule fused -> multi-distinct Expand); lock the bridge
    import org.apache.spark.sql.functions.{expr, greatest, lit, sum}
    import org.apache.spark.sql.graftbridge.Bridge
    assert(Bridge.hasDistinctAggregate(countDistinct(col("k"))))
    assert(Bridge.hasDistinctAggregate(
      greatest(countDistinct(col("k")) - lit(1L), lit(0L))))
    assert(Bridge.hasDistinctAggregate(expr("count(DISTINCT k)")))
    assert(!Bridge.hasDistinctAggregate(sum(col("k"))))
    assert(!Bridge.hasDistinctAggregate(expr("sum(k)")))
    val (fused2, split2) = Rules.splitForEvaluation(plain ++ Seq(d1, d2))
    assert(fused2.map(_.name) == Seq("rows_t", "no_null_k", "d1") &&
      split2.map(_.name) == Seq("d2"))
    // the Spark contract the routing relies on: plains + ONE distinct in
    // a single Aggregate plans the two-level partial-distinct shape with
    // NO row-replicating Expand; a second distinct group introduces it.
    // Checked on the OPTIMIZED LOGICAL plan (RewriteDistinctAggregates
    // runs there) — the executed plan hides behind AdaptiveSparkPlanExec.
    val df = Seq(("a", 1), ("a", 2), ("b", 2)).toDF("k", "v")
    def hasExpand(frame: org.apache.spark.sql.DataFrame): Boolean =
      frame.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Expand])
    val oneD = df.agg(fused1.head.agg.as(fused1.head.name),
      fused1.tail.map(r => r.agg.as(r.name)): _*)
    assert(!hasExpand(oneD), "lone distinct must not plan an Expand")
    val twoD = df.agg(countDistinct(col("k")), countDistinct(col("v")))
    assert(hasExpand(twoD), "the >=2-distinct Expand premise no longer holds")
    // values unchanged by the routing
    val r1 = Rules.evaluate(spark, df, plain ++ Seq(d1, d2)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == Map("rows_t" -> 3L, "no_null_k" -> 0L, "d1" -> 2L, "d2" -> 2L))
  }

  test("tupleHash128 distinct count ≡ tuple distinct count: adversarial nulls + corpus audit") {
    import org.apache.spark.sql.functions.{countDistinct, struct, col}
    // adversarial null placements: ('A',null) vs (null,'A') must stay
    // DISTINCT (the bitmap word); equal tuples with nulls must collide
    val adv = Seq(
      (Some("A"), None: Option[String]), (None: Option[String], Some("A")),
      (Some("A"), None), (None, None), (None, None),
      (Some("A"), Some("A")), (Some("AA"), Some("")), (Some(""), Some("AA")))
      .toDF("x", "y")
    def both(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): (Long, Long) = {
      val r = df.agg(
        countDistinct(struct(cols.map(col): _*)).as("tuple"),
        countDistinct(Rules.tupleHash128(cols.map(col))).as("hash")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (t0, h0) = both(adv, Seq("x", "y"))
    assert(t0 == 6L && h0 == 6L)
    // corpus audit: the exact 5-column variant key the MAF dup rule
    // fingerprints, over the real sf0.001 fact table
    val li = graft.Tables.lineitem(spark, graft.SparkTestBase.sf001)
    val key = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag")
    val (t1, h1) = both(li, key)
    assert(t1 == h1, s"fingerprint collision on the corpus: tuple=$t1 hash=$h1")
  }
}
