package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, sf01, spark}

/** Physical-plan assertions — the scale properties the queries claim
  * (broadcast joins for control tables, parquet filter/column pushdown,
  * window-group-limit top-k, codegen'd custom expressions) locked in as
  * tests so a regression in plan shape fails CI, not just the benchmark.
  */
class PlanChecksSpec extends AnyFunSuite {

  /** Every locked property is asserted at BOTH scale points: AQE and the
    * broadcast/codegen thresholds can pick different physical shapes as
    * data grows, so a plan that is right at sf0.001 is re-proven at the
    * bench scale (sf0.1) instead of assumed.
    */
  private val scales: Seq[(String, String)] =
    Seq("sf0.001" -> sf001, "sf0.1" -> sf01)

  private def ptest(name: String)(body: String => Unit): Unit =
    scales.foreach { case (tag, dir) => test(s"$name @ $tag")(body(dir)) }

  private def executedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  ptest("J1 control-table join broadcasts (no shuffle of the big side)") { sfDir =>
    val plan = planString(RefQueries.j1LeftBroadcast(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast hash join, got:\n$plan")
  }

  ptest("P3 partition filter is pushed into the parquet scan") { sfDir =>
    val df = RefQueries.p3PartitionFilter(spark, sfDir)
    val scan = planString(df)
    assert(scan.contains("PushedFilters: [") && scan.contains("EqualTo"),
      s"expected pushed filters in scan, got:\n$scan")
  }

  ptest("q1 aggregation reads only the columns it needs (column pruning)") { sfDir =>
    val df = RefQueries.q1Agg(spark, sfDir)
    val scanLine = planString(df).linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // lineitem is 16 columns; the pricing summary needs 4
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_shipmode"),
      s"scan reads more than projected columns: $scanLine")
  }

  ptest("sim_topk_brute plans a WindowGroupLimit (map-side top-k)") { sfDir =>
    val plan = planString(SimQueries.simTopkBrute(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit for row_number<=k, got:\n$plan")
  }

  ptest("ta_fluency_outliers plans a WindowGroupLimit (K-row heap per task)") { sfDir =>
    val plan = planString(TextQueries.taFluencyOutliers(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit for the per-source bottom-K, got:\n$plan")
  }

  ptest("p10_zorder is scan + one bounded aggregation: a single exchange, no join") { sfDir =>
    val df = OlapQueries.p10Zorder(spark, sfDir)
    df.collect()
    // AQE folds the Exchange into a ShuffleQueryStage that TreeNode
    // collect does not descend into — count it in the rendered plan
    val plan = executedPlan(df).toString
    assert("(?m)^\\s*(\\+- |:- )?Exchange ".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle, got:\n$plan")
    assert(!plan.contains("Join"), s"layout stats must not join:\n$plan")
  }

  ptest("sim_ivf_assign is map-only: no exchange in the assignment plan") { sfDir =>
    val plan = planString(SimQueries.simIvfAssign(spark, sfDir))
    assert(!plan.contains("Exchange"),
      s"centroid assignment must not shuffle (argmax over broadcast-side literals):\n$plan")
  }

  ptest("A7 keep-last plans a WindowGroupLimit (rank pushed below the shuffle)") { sfDir =>
    val plan = planString(RefQueries.a7KeepLast(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit for row_number==1, got:\n$plan")
  }

  ptest("O1 global top-N plans TakeOrderedAndProject, not a full sort") { sfDir =>
    val plan = planString(RefQueries.o1TopN(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected bounded-heap top-N operator, got:\n$plan")
  }

  ptest("custom sketch/vec expressions stay inside WholeStageCodegen") { sfDir =>
    val dd = DedupQueries.ddSimhash(spark, sfDir)
    val plan = planString(dd)
    // `*(n)` prefixes mark WholeStageCodegen spans in toString output; the
    // custom expression must sit inside one, not in a fallback project
    assert("""\*\(\d+\) Project .*simhash60""".r.findFirstIn(plan).isDefined,
      s"simhash60 not inside a codegen'd Project:\n$plan")
  }

  ptest("j8 bloom prefilter stays inside whole-stage codegen on the fact scan") { sfDir =>
    val df = OlapQueries.j8BloomPrefilter(spark, sfDir)
    df.queryExecution.toRdd.count() // AQE: codegen spans appear in the FINAL plan
    val plan = planString(df)
    // truncated on failure: the serialized bloom literal alone is ~1 MB of hex
    def short = plan.linesIterator.map(_.take(200)).mkString("\n")
    // native BloomFilterMightContain, not a codegen-breaking UDF: the
    // probe must appear in a `*(n) Filter` span (WholeStageCodegen)
    assert("""\*\(\d+\) Filter .*might_contain""".r.findFirstIn(plan).isDefined,
      s"bloom probe not inside a codegen'd Filter:\n$short")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
      s"no UDF may remain in the probe path:\n$short")
  }

  ptest("F9 chunk assignment contains no partitionless global window") { sfDir =>
    // the scale-killer shape: Window.orderBy(...) with no partitionBy
    // funnels every row through ONE task. f9 now rides PrefixSum (range
    // shuffle + broadcast offsets); no Window node may remain anywhere.
    val df = RefQueries.f9Chunks(spark, sfDir)
    val plan = planString(df)
    assert(!plan.contains("Window"),
      s"f9_chunks must not plan any Window operator:\n$plan")
    assert(df.queryExecution.analyzed.toString.contains("ExistingRDD") ||
      plan.contains("ExistingRDD"),
      s"f9_chunks should materialize over the PrefixSum RDD:\n${plan.take(600)}")
  }

  ptest("ta_heavy_hitters_exact pass 2: one text scan, no token-stream join") { sfDir =>
    // The r11 kernel rewrite: pass 2 is token_set_counts over the
    // documents scan. The final plan must contain exactly one parquet
    // scan (documents; pass 1 ran eagerly at build time), exactly one
    // join (the slot->token decode against the tiny local candidate
    // table), and the compiled kernel itself.
    val df = TextQueries.taHeavyHittersExact(spark, sfDir)
    val plan = planString(df)
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan parquet"))
    assert(scans == 1, s"expected 1 parquet scan in pass 2, got $scans:\n$plan")
    assert(plan.contains("token_set_counts"),
      s"pass 2 must run the compiled kernel, got:\n$plan")
    val joins = plan.linesIterator.count(_.contains("Join"))
    assert(joins <= 1, s"pass 2 must not join the token stream:\n$plan")
  }

  ptest("Q16's NOT IN plans as an anti join, never a nested loop") { sfDir =>
    val plan = planString(OlapQueries.sqlTpchQ16(spark, sfDir))
    assert(plan.contains("LeftAnti"),
      s"NOT IN must decorrelate to an anti join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join may remain:\n$plan")
  }

  ptest("sim_pq_encode is map-only: no exchange in the code-table plan") { sfDir =>
    val plan = executedPlan(SimQueries.simPqEncode(spark, sfDir))
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"PQ encoding must not shuffle:\n$plan")
  }

  ptest("sim_ivfpq_topk: bucket-pruned broadcast probe, no nested loop, one window shuffle") { sfDir =>
    val df = SimQueries.simIvfpqTopk(spark, sfDir)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("bucket"),
      s"candidates must join the broadcast query set on the IVF bucket key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"IVF pruning must keep the ADC scan off the cross product:\n$plan")
    val shuffles = executedPlan(df).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1,
      s"only the per-query top-k window may shuffle, found ${shuffles.size}:\n$plan")
  }

  ptest("Q12's returnflag + ship-window filters reach the lineitem scan") { sfDir =>
    val plan = planString(OlapQueries.sqlTpchQ12(spark, sfDir))
    // the In/range predicates must be pushed, not evaluated post-join
    assert(plan.contains("PushedFilters") &&
      plan.contains("In(l_returnflag") && plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"expected pushed lineitem filters, got:\n$plan")
  }

  ptest("Q7 broadcasts every dimension; no dim side shuffles") { sfDir =>
    val plan = planString(OlapQueries.sqlTpchQ7(spark, sfDir))
    // supplier, customer, and both nation aliases broadcast; the single
    // hash-exchange pair left is orders⋈lineitem on orderkey
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$plan")
  }

  ptest("ev_tumbling keeps partial aggregation before its single shuffle") { sfDir =>
    val plan = planString(StreamQueries.evTumbling(spark, sfDir))
    // map-side combine: a partial_* aggregate below the exchange
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"no partial aggregation in plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }

  ptest("td_chunk is a zero-shuffle map over the corpus scan") { sfDir =>
    val plan = planString(TextQueries.tdChunk(spark, sfDir))
    assert(!plan.contains("Exchange"),
      s"chunk planning must ride the scan, got:\n$plan")
  }

  ptest("u7_scd2 serves both windows from one exchange and one sort") { sfDir =>
    val plan = planString(OlapQueries.u7Scd2(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
    assert(sorts == 1, s"expected one sort shared by both windows, got $sorts:\n$plan")
  }

  ptest("ev_anomaly evaluates moments and flags in a single user_id exchange") { sfDir =>
    val plan = planString(OlapQueries.evAnomaly(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"window + rollup must share the user_id partitioning, got $exchanges:\n$plan")
  }

  ptest("ta_doc_embed is map-only: no exchange in the featurizer plan") { sfDir =>
    val plan = planString(TextQueries.taDocEmbed(spark, sfDir))
    assert(!plan.contains("Exchange"),
      s"doc_vec_hash is a per-row projection — nothing to shuffle:\n$plan")
    assert(plan.contains("doc_vec_hash"), plan)
  }

  ptest("ev_gapfill is one exchange and zero joins: gaps generated, not joined") { sfDir =>
    val plan = planString(StreamQueries.evGapfill(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"agg, lead window, and gap generation must share the user_id shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"the lead+sequence densify needs no join:\n$plan")
  }

  ptest("ev_rate_limit folds each user's events after one exchange") { sfDir =>
    val df = StreamQueries.evRateLimit(spark, sfDir)
    val plan = planString(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one user_id shuffle, got $exchanges:\n$plan")
    // the (ts, id) sort lives in the aggregate's result projection —
    // visible in the optimized logical plan, hidden by the physical
    // operator's toString
    assert(df.queryExecution.optimizedPlan.toString.contains("sort_array"),
      "the fold must run over (ts, id)-sorted events")
  }

  // --- Iterative graph family: the per-round "only the small frame
  // moves" claims. Each query localCheckpoints between rounds, so the
  // final frame's plan is just RDD scans — the assertions drive the
  // extracted round helpers directly, the exact plan every round executes.
  // A regression that re-shuffles the cached edge table shows up as an
  // ENSURE_REQUIREMENTS `Exchange hashpartitioning(<edge key>...)` feeding
  // the in-memory scan. (The rendered InMemoryRelation includes its own
  // cache-BUILD plan, whose REPARTITION_BY_COL exchange on the same key is
  // exactly the partitioning the round is supposed to reuse — so the
  // assertion scopes to ENSURE_REQUIREMENTS, the planner-inserted kind.)

  /** Planner-inserted single-key shuffles on `key`. The rendered
    * InMemoryRelation embeds its cache-build plan, so the match must
    * exclude both the build's REPARTITION_BY_COL exchange AND its
    * internal multi-key aggregates (e.g. tradeEdges' (src, dst)
    * distinct) — a join-side edge re-shuffle is exactly
    * `hashpartitioning(key#N, P), ENSURE_REQUIREMENTS`.
    */
  private def ensureShuffles(plan: String, key: String): Int =
    ("Exchange hashpartitioning\\(" + key + "#\\d+, \\d+\\), ENSURE_REQUIREMENTS")
      .r.findAllIn(plan).size

  ptest("g_sssp round: edge cache serves the relax join; min combines map-side") { sfDir =>
    val edges = GraphQueries.weightedEdges(spark, sfDir)
    val d = edges.select(col("src").as("node")).distinct()
      .withColumn("dist", org.apache.spark.sql.functions.lit(0L))
      .localCheckpoint()
    val plan = planString(GraphQueries.ssspRound(edges, d))
    assert(plan.contains("InMemoryTableScan"), s"edges not cached:\n$plan")
    assert(ensureShuffles(plan, "src") == 0,
      s"edge table re-shuffled inside the round:\n$plan")
    assert(plan.contains("partial_min"), s"no map-side combine:\n$plan")
  }

  ptest("g_khop round: edge cache serves the expansion; frontier distinct combines map-side") { sfDir =>
    val edges = GraphQueries.tradeEdges(spark, sfDir)
    val vis = edges.select(col("src").as("node")).limit(50)
      .withColumn("dist", org.apache.spark.sql.functions.lit(0))
      .localCheckpoint()
    val plan = planString(
      GraphQueries.khopExpand(edges, vis, vis.select(col("node")), 1))
    assert(plan.contains("InMemoryTableScan"), s"edges not cached:\n$plan")
    assert(ensureShuffles(plan, "src") == 0,
      s"edge table re-shuffled inside the round:\n$plan")
  }

  ptest("g_random_walk step: edge cache serves the move join; argmin combines map-side") { sfDir =>
    val edges = GraphQueries.tradeEdges(spark, sfDir)
    val frontier = edges.select(col("src").as("start"), col("src").as("cur"))
      .limit(50).localCheckpoint()
    val plan = planString(GraphQueries.walkStep(edges, frontier, 1))
    assert(plan.contains("InMemoryTableScan"), s"edges not cached:\n$plan")
    assert(ensureShuffles(plan, "src") == 0,
      s"edge table re-shuffled inside the step:\n$plan")
    assert(plan.contains("partial_min"), s"no map-side combine:\n$plan")
  }

  test("g_concomp min-label round: edge cache serves the neighbor join") {
    import org.apache.spark.sql.functions.{lit, pmod}
    val pairs = spark.range(0, 2000)
      .select(col("id").as("src"), pmod(col("id") * 7 + 1, lit(2000)).as("dst"))
    val edges = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst")).persist()
    edges.count()
    try {
      val labels = edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))
      val plan = planString(DedupQueries.ccMinLabelRound(edges, labels))
      assert(plan.contains("InMemoryTableScan"), s"edges not cached:\n$plan")
      assert(ensureShuffles(plan, "dst") == 0,
        s"edge table re-shuffled inside the round:\n$plan")
      assert(plan.contains("partial_min"), s"no map-side combine:\n$plan")
    } finally edges.unpersist()
  }

  ptest("g_triangles: degree table broadcasts; wedge closure is an equi join") { sfDir =>
    val plan = planString(GraphQueries.gTriangles(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"degree annotations must broadcast:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"wedge/closure joins must be shuffled equi joins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equi join crept in:\n$plan")
  }

  ptest("sql_tpch_q20: one l_partkey exchange feeds agg AND window; no partial-agg waste") { sfDir =>
    val plan = planString(OlapQueries.sqlTpchQ20(spark, sfDir))
    // the REPARTITION hint's exchange is the ONLY l_partkey shuffle —
    // the (pk, sk) aggregate and the pk window both ride it
    val pkExchanges = "Exchange hashpartitioning\\(l_partkey"
      .r.findAllIn(plan).size
    assert(pkExchanges == 1,
      s"expected exactly one l_partkey exchange, got $pkExchanges:\n$plan")
    assert(plan.contains("REPARTITION_BY_COL"), s"hint lost:\n$plan")
    assert(!plan.contains("Expand"),
      s"count(DISTINCT) Expand resurfaced — double-scan plan is back:\n$plan")
  }

  ptest("ev_attribution: purchases shuffle at most once for join + window") { sfDir =>
    val plan = planString(StreamQueries.evAttribution(spark, sfDir))
    // Two regimes, one invariant: when clicks broadcast (toy scale) the
    // only purchase-side exchange is the window's (p_uid, p_id); when
    // the join shuffles (cluster scale) the window reuses the join's
    // HashPartitioning(p_uid) via subset clustering. Either way the
    // purchase stream crosses the wire at most ONCE before the final
    // hour rollup — two p_uid-keyed exchanges mean the reuse regressed.
    val purchaseExchanges = "Exchange hashpartitioning\\(p_uid"
      .r.findAllIn(plan).size
    assert(purchaseExchanges <= 1,
      s"purchases shuffled $purchaseExchanges times:\n$plan")
    assert(plan.contains("Window"), s"no window in plan:\n$plan")
  }

  ptest("td_winsorize never sorts documents: histogram agg + source windows only") { sfDir =>
    val plan = planString(TextQueries.tdWinsorize(spark, sfDir))
    // one exchange for the (source, n_chars) histogram, one for the
    // source-partition windows; the final per-source aggregate reuses
    // the window partitioning
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected two shuffles, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") &&
      !plan.contains("Exchange rangepartitioning"),
      s"global sort/single-partition crept into the percentile plan:\n$plan")
    assert(plan.contains("partial_count"),
      s"histogram lost its map-side combine:\n$plan")
  }

  ptest("ta_keyness windows stay partitioned; no single-partition funnel") { sfDir =>
    val plan = planString(TextQueries.taKeyness(spark, sfDir))
    assert(!plan.contains("Exchange SinglePartition"),
      s"a global window crept into keyness:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 2,
      s"expected tok/src/rank windows:\n$plan")
  }

  ptest("LM scoring family: broadcast hints only on 1-row scalars, never vocab frames") { sfDir =>
    // The ta_tfidf rule, structurally enforced: a unigram/bigram vocab
    // table GROWS with the corpus, so a forced broadcast() of one OOMs
    // the driver at web scale. The only hints these plans may carry are
    // the 1-row corpus-total / vocab-size scalars (maxRows == 1); the
    // vocab joins must stay unhinted so the planner can degrade them to
    // shuffle joins past the broadcast threshold.
    import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, Window => LWindow}
    for ((name, df) <- Seq(
        "ta_unigram_lp" -> TextQueries.taUnigramLp(spark, sfDir),
        "ta_bigram_lm" -> TextQueries.taBigramLm(spark, sfDir),
        "ta_fluency_outliers" -> TextQueries.taFluencyOutliers(spark, sfDir))) {
      // zero hints is fine (ta_bigram_lm's vocab scalar is a literal);
      // any hint that IS present must cover a 1-row frame
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      hints.foreach { h =>
        assert(h.child.maxRows.contains(1L),
          s"$name: broadcast hint on a non-scalar (maxRows=${h.child.maxRows}) frame:\n${h.child}")
      }
    }
    // taBigramLm's context counts must come from the v-partitioned window
    // over the aggregated c2 frame (the sql_tpch_q20 derived-aggregate
    // trick), not a second vocab join against the bigram stream.
    val bi = TextQueries.taBigramLm(spark, sfDir)
    assert(bi.queryExecution.analyzed.collect { case w: LWindow => w }.nonEmpty,
      "ta_bigram_lm: c1 should be a window over c2, not a join")
  }
}
