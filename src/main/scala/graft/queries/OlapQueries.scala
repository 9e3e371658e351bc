package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.Tables

/** Core OLAP surface beyond the reference's own operator set: window
  * functions, rollup/cube grouping, exact percentiles, pivot/unpivot
  * reshape, and two TPC-H-shaped multi-join aggregations. The reference
  * (pandas ETL) has none of these, but a user replacing it with a general
  * analytics engine expects them — and they exercise exactly the plan
  * shapes that matter at 100 TB: one-shuffle window partitioning,
  * partial-aggregated rollups, broadcast-vs-shuffle join selection.
  */
object OlapQueries {

  type Q = (SparkSession, String) => DataFrame

  /** o2_window_rank — row_number / rank / dense_rank in one window pass.
    * Two sort orders over the SAME partition key: one exchange, two sorts.
    * The rank ordering (c_nationkey) is tie-heavy on purpose — rank vs
    * dense_rank semantics only differ under ties; row_number's ordering
    * carries a unique tiebreaker so the output is deterministic.
    */
  def o2WindowRank: Q = (s, dir) => {
    val wRn = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val wTie = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_nationkey").asc)
    Tables.customer(s, dir).select(
      col("c_custkey"), col("c_mktsegment"), col("c_nationkey"), col("c_acctbal"),
      row_number().over(wRn).as("rn"),
      rank().over(wTie).as("rnk"),
      dense_rank().over(wTie).as("drnk"))
      .filter(col("rn") <= 5)
  }

  /** o3_running_total — cumulative sum + lag/lead over per-customer order
    * history: the running-balance / previous-event shape. Frame is ROWS
    * UNBOUNDED PRECEDING..CURRENT ROW with a unique (date, key) ordering,
    * so the left-to-right accumulation is identical in any engine; the
    * rounded cumulative sum is hash-stable. gap_seconds via integer
    * timestamp arithmetic — no float time math.
    */
  def o3RunningTotal: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      bround(sum(col("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .as("run_total"),
      lag(col("o_orderkey"), 1).over(w).as("prev_order"),
      lead(col("o_orderkey"), 1).over(w).as("next_order"),
      // timestampdiff, not a long cast: the parquet column is
      // TIMESTAMP_NTZ, which Spark refuses to cast to a numeric
      timestamp_diff("SECOND",
        coalesce(lag(col("o_orderdate"), 1).over(w), col("o_orderdate")),
        col("o_orderdate"))
        .as("gap_seconds"))
  }

  /** a10_rollup — hierarchical totals (segment, nation) → (segment) →
    * (grand). One pass: Spark expands grouping sets before the exchange
    * and still partial-aggregates map-side, so the shuffle carries one row
    * per (set, group), not per input row. grouping() flags disambiguate
    * subtotal rows from genuine NULL keys.
    */
  def a10Rollup: Q = (s, dir) =>
    Tables.customer(s, dir)
      .rollup(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        bround(sum(col("c_acctbal")), 2).as("sum_bal"),
        grouping(col("c_mktsegment")).cast("long").as("g_seg"),
        grouping(col("c_nationkey")).cast("long").as("g_nat"))

  /** a11_cube — all 4 grouping-set combinations of (status, priority) in
    * one pass; same expansion machinery as a10 with the full lattice.
    */
  def a11Cube: Q = (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        bround(sum(col("o_totalprice")), 2).as("sum_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_prio"))

  /** a12_percentiles — exact interpolated percentiles per group (the
    * distribution profile behind every cleaning threshold). Exact
    * `percentile` is a sort-based TypedImperativeAggregate: partials
    * merge across partitions, so it scales out — approx_percentile is the
    * sketch alternative when the value set itself is too big; rounded to
    * 6 decimals so interpolation float noise can't flip the oracle hash.
    */
  def a12Percentiles: Q = (s, dir) =>
    // one percentile ARRAY per column: Spark's exact percentile is an
    // object aggregate maintaining a value->count map per (group, agg) —
    // asking for the three quantity quantiles in one call shares one map
    // instead of building three identical ones (measured ~2x on the agg).
    // Measured negative result (r15): Layout.spread before the partial
    // read 1.77 s vs 1.23 unspread at sf0.1/32c — the single-row-group
    // scan's DECODE is the bottleneck, and a spread exchange only moves
    // it onto the same one task plus an extra shuffle. The 1-task scan
    // floor is the driver corpus's layout, not the plan (see q1_agg).
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qs"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .select(col("l_returnflag"), col("n"),
        bround(element_at(col("qs"), 1), 6).as("q1_qty"),
        bround(element_at(col("qs"), 2), 6).as("median_qty"),
        bround(element_at(col("qs"), 3), 6).as("q3_qty"),
        bround(col("p90"), 6).as("p90_price"))

  /** a14_approx_percentiles — the sketch twin of [[a12Percentiles]]:
    * `approx_percentile` (Greenwald–Khanna/KLL-style mergeable quantile
    * summary) at accuracy 10000, i.e. a guaranteed rank error ≤ 1/10000
    * of the group size. At 100 TB this is the quantile you actually run:
    * the exact percentile's value→count map grows with distinct values,
    * while the sketch is fixed-size and merges associatively across
    * partitions. No DuckDB oracle (its approx_quantile is a different
    * t-digest sketch); OlapQueriesSpec bounds every approximate value by
    * the rank-error guarantee against the exact a12 result instead.
    */
  def a14ApproxPercentiles: Q = (s, dir) =>
    // same negative spread result as a12 (r15): decode-bound 1-task scan
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), 10000)").as("qs"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90"))
      .select(col("l_returnflag"), col("n"),
        element_at(col("qs"), 1).as("q1_qty"),
        element_at(col("qs"), 2).as("median_qty"),
        element_at(col("qs"), 3).as("q3_qty"),
        bround(col("p90"), 6).as("p90_price"))

  /** p8_pivot — long→wide reshape: order counts per (priority × status).
    * Pivot values are DECLARED (not discovered) so the plan is a single
    * groupBy with one conditional aggregate per cell — no extra pass to
    * enumerate values, which at 100 TB would be its own shuffle. Absent
    * cells coalesce to 0 (pandas/SQL conditional-count convention).
    */
  def p8Pivot: Q = (s, dir) => {
    val statuses = Seq("O", "F", "P")
    val wide = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)))
    wide.select(col("o_orderpriority") +:
      statuses.map(st => coalesce(col(st), lit(0L)).as(s"n_$st")): _*)
  }

  /** p9_unpivot — wide→long melt of part's numeric attributes into
    * (key, attr, val) rows: the inverse reshape, a zero-shuffle
    * Generate/Expand over each input row.
    */
  def p9Unpivot: Q = (s, dir) =>
    Tables.part(s, dir).unpivot(
      ids = Array(col("p_partkey")),
      values = Array(col("p_size").cast("double").as("p_size"),
        col("p_retailprice")),
      variableColumnName = "attr",
      valueColumnName = "val")

  /** Z-order grid: each dimension is normalized to [0, [[ZGridCells]]]
    * grid cells before interleaving (raw keys would alias mod 2¹⁶ the
    * moment a key domain outgrows 16 bits — partkey does at sf ≥ ~0.33 —
    * making the reported extents span the whole domain); the top
    * (20 − [[ZCellShift]]) = 12 Z-bits then name a cell, bounding the
    * aggregation at 4096 groups at ANY scale.
    */
  val ZGridCells = 1023L
  val ZCellShift = 8

  /** p10_zorder — multi-dimensional layout clustering: the Z-order curve
    * over (l_partkey, l_suppkey) via the compiled [[graft.functions.
    * ZInterleave16]] expression, bucketed into Z-cells, reporting each
    * cell's row count and BOTH dimensions' min/max extents — the file-
    * skipping statistics a lakehouse writer records per file. The point
    * the report makes is the layout one: because the Z-curve bounds a
    * cell in EVERY interleaved dimension (a 2ⁱ×2ʲ rectangle), a scan
    * filtering on partkey OR suppkey prunes cells — where a layout
    * sorted by partkey alone has every suppkey extent spanning the full
    * domain. At 100 TB this is `repartitionByRange(zvalue).sortWithin
    * Partitions` at write time; the z-value itself is 10 shift-mask ops
    * in whole-stage codegen, and THIS query (the stats pass) is one
    * map-only projection + one bounded-key aggregation (≤ 4096 groups)
    * after a once-per-corpus 4-scalar extent aggregation (cached, the
    * same shape [[graft.sources.Layout.writeZOrdered]] runs at write
    * time).
    *
    * Cross-engine exactness of the grid: keys are integers < 2⁵³, so
    * (x − lo) is an exact double in both engines, / and × are IEEE
    * correctly-rounded single ops, and floor truncates identically
    * (DuckDB's ::BIGINT cast ROUNDS half-even — the floor is
    * load-bearing). The oracle mirrors the interleave as the same
    * integer shift/mask chain ([[graft.functions.ZOrderUtil.
    * duckInterleave16]]) — bit-exact in both engines.
    */
  def p10Zorder: Q = (s, dir) => {
    val Seq(pLo, pHi, sLo, sHi) = zorderExtent(s, dir)
    def cell(c: String, lo: Long, hi: Long) = {
      val denom = if (hi > lo) (hi - lo).toDouble else 1.0
      floor((col(c).cast("double") - lit(lo.toDouble)) / lit(denom)
        * lit(ZGridCells.toDouble))
    }
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("zcell", shiftright(
        graft.functions.ZInterleave16.zinterleave16(
          cell("l_partkey", pLo, pHi), cell("l_suppkey", sLo, sHi)),
        ZCellShift))
      .groupBy(col("zcell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
  }

  /** The corpus key extents (min/max of both Z dimensions), one tiny
    * aggregation cached per (session, sf) like every index artifact.
    */
  private def zorderExtent(s: SparkSession, dir: String): Seq[Long] =
    graft.queries.FrameCache.cachedStrings(s, s"p10_zorder_extent:$dir") {
      val r = Tables.lineitem(s, dir).agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).collect()(0)
      (0 until 4).map(i => r.getLong(i).toString).toArray
    }.toSeq.map(_.toLong)

  /** h3_shipping_priority — TPC-H Q3 shape: selective filters on all
    * three tables push into the parquet scans, customer broadcasts into
    * orders, the orders⋈lineitem join shuffles on orderkey, and the final
    * top-10 plans TakeOrderedAndProject (bounded heap per task — no
    * global sort). The canonical "would this survive 100×" join-agg.
    */
  def h3ShippingPriority: Q = (s, dir) => {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(bround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** h5_nation_revenue — TPC-H Q5 shape: five-way join where every
    * dimension (supplier/customer/nation/region) broadcasts and only the
    * orders⋈lineitem edge shuffles; the local-supplier condition
    * (c_nationkey = s_nationkey) is a post-join filter on broadcast
    * columns. Revenue per nation within one region.
    */
  def h5NationRevenue: Q = (s, dir) => {
    val region = Tables.region(s, dir).filter(col("r_name") === "AMERICA")
    val nation = Tables.nation(s, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(bround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** sql_tpch_q6 — the raw SQL surface: a user who writes ANSI SQL (not
    * the DataFrame API) runs it verbatim through `spark.sql` over
    * registered views — same Catalyst plan, same pushdown (both
    * l_shipdate range bounds and the discount/quantity predicates reach
    * the parquet scan). TPC-H Q6's forecasting-revenue-change query.
    */
  def sqlTpchQ6: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q6")
    s.sql("""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             count(*) AS n_rows
      FROM lineitem_q6
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    """)
  }

  /** sql_tpch_q4 — the EXISTS→left-semi decorrelation shape (TPC-H Q4,
    * adapted to this schema's columns): orders in a half-year window
    * having at least one lineitem shipped after the order date. The
    * correlated EXISTS must plan as ONE left-semi hash join on
    * l_orderkey (the non-equi `l_shipdate > o_orderdate` conjunct rides
    * the join condition) — never a per-row subquery re-execution.
    */
  def sqlTpchQ4: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM ord_sql
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
        AND EXISTS (SELECT 1 FROM li_sql
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
    """)
  }

  /** sql_tpch_q21 — the double-correlated EXISTS + NOT EXISTS shape
    * (TPC-H Q21, the hardest standard decorrelation, adapted to this
    * schema: "late" = shipped >60 days after the order date): suppliers
    * who were the ONLY late shipper on a multi-supplier finished order.
    * Both subqueries correlate on l1.l_orderkey AND the outer
    * o_orderdate; the planner must produce one left-semi and one
    * left-anti join over lineitem — three scans of lineitem total, no
    * nested-loop re-execution. PLANS.md records the semi/anti shape.
    */
  def sqlTpchQ21: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT s_name, count(*) AS numwait
      FROM supp_sql, li_sql l1, ord_sql
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM li_sql l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li_sql l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100
    """)
  }

  /** sql_tpch_q2 — the correlated-min-equality (argmin) shape of TPC-H
    * Q2, adapted to this schema (no partsupp table; lineitem is the
    * part↔supplier bridge): for every part of one brand, the lineitems
    * priced at that part's minimum. The correlated scalar subquery must
    * decorrelate to ONE aggregate of lineitem joined back on partkey —
    * never a per-outer-row min re-scan.
    */
  def sqlTpchQ2: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT p_brand, p_partkey, l_suppkey, l_extendedprice AS min_price
      FROM part_sql, li_sql
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM li_sql l2
                               WHERE l2.l_partkey = p_partkey)
    """)
  }

  /** sql_tpch_q11 — TPC-H Q11's HAVING-over-global-scalar-subquery shape:
    * parts whose shipped quantity exceeds a fraction of the corpus total.
    * The subquery is uncorrelated — planned ONCE as a scalar subquery
    * stage, broadcast into the filter above the aggregation, so the
    * threshold costs one extra scan, not one per group. Quantities are
    * integral-valued doubles: sums are exact, the comparison cannot
    * float-flip between engines.
    */
  def sqlTpchQ11: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      FROM li_sql
      GROUP BY l_partkey
      HAVING sum(l_quantity) > (SELECT 1.2 * sum(l_quantity) / count(DISTINCT l_partkey)
                                FROM li_sql)
    """)
  }

  /** sql_tpch_q19 — TPC-H Q19's disjunctive join predicate: an OR of
    * brand×quantity-band conjuncts over a shared equi key. The planner
    * must extract `p_partkey = l_partkey` as the hash-join key and keep
    * the disjunction as a residual filter — a naive reading of the OR
    * would fall back to a nested-loop join over the whole fact table.
    */
  def sqlTpchQ19: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM li_sql, part_sql
      WHERE p_partkey = l_partkey
        AND ((p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30))
    """)
  }

  /** sql_tpch_q20 — TPC-H Q20's nested shape: an IN subquery whose
    * filter references a CORRELATED scalar subquery (here: suppliers
    * shipping >4× a part's fair per-supplier share — "dominant
    * suppliers"; the reference Q20 compares availability to half the
    * shipped quantity the same way). The oracle keeps the user-facing
    * nested form; the engine runs the algebraic single-scan plan:
    * Spark's decorrelation of the nested form materializes the fact
    * TWICE (the IN's (partkey, suppkey) aggregate, plus the correlated
    * scalar's per-partkey aggregate with an Expand for the
    * count(DISTINCT)) — but the inner aggregate is derivable from the
    * outer one (suppkeys are unique within it: sum(q) ≡ the partkey's
    * shipped total, count(*) ≡ its distinct-supplier count), so a
    * window over the aggregated frame computes the same threshold with
    * ONE fact scan. The REPARTITION(l_partkey) hint on that scan is
    * load-bearing: (l_partkey, l_suppkey) groups are ~98.5% unique in
    * this corpus, so the default plan's map-side partial aggregate
    * builds a row-sized hash table per task that combines nothing and
    * then shuffles ~every row anyway; hinting the exchange onto the
    * raw rows BY THE WINDOW'S KEY makes the aggregation run
    * post-shuffle (HashPartitioning(pk) satisfies the (pk, sk)
    * clustering requirement) and the window inherit the partitioning —
    * one exchange total instead of two plus a wasted partial
    * (measured 2.17 s → 1.10 s at sf1; the same reasoning holds at any
    * scale because group uniqueness is a property of the schema, not
    * the SF). Bit-safe across plans: quantities are small integers, so
    * the double sums are exact in either grouping order. (Correlated
    * decorrelation stays exercised by h17_small_quantity / the
    * EXISTS family.)
    */
  def sqlTpchQ20: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT s_name, s_nationkey
      FROM supp_sql
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_suppkey, q,
                 sum(q)   OVER (PARTITION BY l_partkey) AS part_total,
                 count(*) OVER (PARTITION BY l_partkey) AS n_supp
          FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
                FROM (SELECT /*+ REPARTITION(l_partkey) */
                        l_partkey, l_suppkey, l_quantity FROM li_sql)
                GROUP BY l_partkey, l_suppkey))
        WHERE q > 4.0 * part_total / n_supp)
    """)
  }

  /** Last directory whose tables were registered as the `*_sql` views,
    * per session. Re-registering seven views costs seven catalog
    * round-trips per query construction (~0.3-0.5 s each invocation,
    * paid by every raw-SQL entry in a 200-query suite) and is a no-op
    * unless the data directory changed — so register once per
    * (session, dir) and only re-register on a dir switch (tests drive
    * multiple SFs through one session; the bench never does).
    */
  private val sqlViewsDir =
    new java.util.WeakHashMap[SparkSession, String]()

  private def registerSqlViews(s: SparkSession, dir: String): Unit =
    sqlViewsDir.synchronized {
      if (sqlViewsDir.get(s) != dir) {
        Tables.lineitem(s, dir).createOrReplaceTempView("li_sql")
        Tables.orders(s, dir).createOrReplaceTempView("ord_sql")
        Tables.customer(s, dir).createOrReplaceTempView("cust_sql")
        Tables.supplier(s, dir).createOrReplaceTempView("supp_sql")
        Tables.part(s, dir).createOrReplaceTempView("part_sql")
        Tables.nation(s, dir).createOrReplaceTempView("nat_sql")
        Tables.region(s, dir).createOrReplaceTempView("reg_sql")
        sqlViewsDir.put(s, dir)
        ()
      }
    }

  // --- TPC-H Q7/Q8/Q9/Q14/Q16, adapted to this corpus' columns (no
  // partsupp/shipmode/commitdate). ONE template per query drives BOTH
  // engines — the Spark run substitutes registered view names, the
  // DuckDB oracle the parquet table names — so the SQL under test and
  // its oracle cannot drift apart.
  //
  // Money sums accumulate as DECIMAL(18,4), not DOUBLE: the per-row
  // price*(1-discount) doubles are bit-identical across engines (same
  // IEEE inputs, same multiply), but double SUMS are order-dependent —
  // Spark's partial-aggregate order differs from DuckDB's, and a 1-ulp
  // difference on a multi-million total flips round(x, 2) at a cent
  // boundary (observed on 2 of 175 Q9 groups). Exact decimal addition is
  // associative, so the totals agree regardless of plan or partitioning.
  // Money TOTALS are emitted as the unrounded exact sum cast to DOUBLE:
  // one Q9 group's true total lands exactly on a half cent (…9.9450),
  // where Spark's round() sees the decimal representation (HALF_UP →
  // .95) but a double-typed round sees the nearest binary double
  // (…944999… → .94) — and a DECIMAL output column renders trailing
  // zeros differently per client. The exact-decimal→double conversion is
  // bit-identical in both engines, so no rounding is needed at all;
  // ratio outputs (Q8, Q14) divide as identical doubles and round far
  // from any midpoint.

  private def fillNames(template: String, names: Map[String, String]): String =
    names.foldLeft(template) { case (t, (k, v)) => t.replace(s"{$k}", v) }

  private val sparkViews = Map("lineitem" -> "li_sql", "orders" -> "ord_sql",
    "customer" -> "cust_sql", "supplier" -> "supp_sql", "part" -> "part_sql",
    "nation" -> "nat_sql", "region" -> "reg_sql")
  private val duckNames: Map[String, String] =
    sparkViews.keys.map(k => k -> k).toMap

  /** Q7 volume shipping: the disjunctive two-nation-pair predicate over a
    * 4-table join. Both nation dims broadcast; the only real shuffle is
    * orders⋈lineitem on orderkey. */
  private[queries] val tpchQ7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(sum(volume) AS DOUBLE) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
      |      FROM {supplier}, {lineitem}, {orders}, {customer}, {nation} n1, {nation} n2
      |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |        AND c_nationkey = n2.n_nationkey
      |        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |        AND l_shipdate >= TIMESTAMP '1996-01-01'
      |        AND l_shipdate < TIMESTAMP '1998-01-01') v
      |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  def sqlTpchQ7: Q = (s, dir) => {
    registerSqlViews(s, dir); s.sql(fillNames(tpchQ7Sql, sparkViews))
  }

  /** Q12 shipmode priority split, the last of the 22 TPC-H shapes
    * (adapted: no l_shipmode/l_commitdate in this schema, so the mode
    * stand-in is l_returnflag and "late" is shipped >30 days after the
    * order date). One orderkey shuffle join, conditional two-way counts
    * in a single aggregate — the filter on the fact side reaches the
    * scan before the join.
    */
  private[queries] val tpchQ12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM {orders}, {lineitem}
      |WHERE o_orderkey = l_orderkey
      |  AND l_returnflag IN ('A', 'R')
      |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag""".stripMargin

  def sqlTpchQ12: Q = (s, dir) => {
    registerSqlViews(s, dir); s.sql(fillNames(tpchQ12Sql, sparkViews))
  }

  /** Q8 national market share: conditional-sum ratio over a two-level
    * aggregate; the region→nation chain prunes the customer side before
    * the fact join. */
  private[queries] val tpchQ8Sql: String =
    """SELECT o_year, round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
      |         / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
      |        n2.n_name AS nation
      |      FROM {part}, {supplier}, {lineitem}, {orders}, {customer},
      |           {nation} n1, {nation} n2, {region}
      |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
      |        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |        AND p_type = 'PROMO') t
      |GROUP BY o_year""".stripMargin

  def sqlTpchQ8: Q = (s, dir) => {
    registerSqlViews(s, dir); s.sql(fillNames(tpchQ8Sql, sparkViews))
  }

  /** Q9 product-type profit (adapted: profit = discounted revenue; the
    * reference corpus has no partsupp cost side). The p_name LIKE filter
    * pushes into the part scan, which then broadcasts. */
  private[queries] val tpchQ9Sql: String =
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
      |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS amount
      |      FROM {part}, {supplier}, {lineitem}, {orders}, {nation}
      |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |        AND p_name LIKE '%gear%') t
      |GROUP BY nation, o_year""".stripMargin

  def sqlTpchQ9: Q = (s, dir) => {
    registerSqlViews(s, dir); s.sql(fillNames(tpchQ9Sql, sparkViews))
  }

  /** Q14 promo revenue share: one fact⋈dim join, conditional aggregate,
    * tight shipdate range pushed to the lineitem scan. */
  private[queries] val tpchQ14Sql: String =
    """SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |        / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
      |        2) AS promo_revenue,
      |        count(*) AS n_rows
      |FROM {lineitem}, {part}
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin

  def sqlTpchQ14: Q = (s, dir) => {
    registerSqlViews(s, dir); s.sql(fillNames(tpchQ14Sql, sparkViews))
  }

  /** Q16 supplier-part relationship (adapted: lineitem IS the
    * part-supplier relation; the complaint filter becomes a supplier-name
    * pattern). The NOT IN subquery must plan as an anti join against the
    * tiny excluded-supplier list, never a per-row re-execution; the
    * count(DISTINCT) re-shuffles on the full group key. */
  private[queries] val tpchQ16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM {part}, {lineitem}
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 14, 23, 45, 9, 19, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM {supplier}
      |                        WHERE s_name LIKE '%000000001%')
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  def sqlTpchQ16: Q = (s, dir) => {
    registerSqlViews(s, dir); s.sql(fillNames(tpchQ16Sql, sparkViews))
  }

  /** h13_custdist — TPC-H Q13 shape through the raw SQL surface: the
    * order-count distribution, a LEFT join whose count(o_orderkey)
    * correctly yields 0 for orderless customers, re-aggregated into a
    * histogram. Two cascaded aggregations, each partial-aggregated
    * map-side; the outer one's key space is tiny (distinct counts).
    */
  def h13Custdist: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM cust_sql LEFT JOIN ord_sql ON c_custkey = o_custkey
        GROUP BY 1)
      GROUP BY 1
      ORDER BY custdist DESC, c_count DESC LIMIT 10
    """)
  }

  /** h15_top_supplier — TPC-H Q15 shape: a CTE referenced TWICE (revenue
    * per supplier feeds both the max and the filter). Catalyst plans the
    * scalar `max` as a subquery over the same aggregate — at scale the
    * CTE is one shuffle reused, not two scans of lineitem.
    */
  def h15TopSupplier: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        FROM li_sql GROUP BY 1)
      SELECT s_suppkey, s_name, total_revenue
      FROM supp_sql JOIN rev ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """)
  }

  /** h17_small_quantity — TPC-H Q17 shape: a CORRELATED scalar subquery
    * (per-part average quantity) gating the fact scan. Catalyst
    * decorrelates it into an aggregate + equi-join on l_partkey — the
    * textbook subquery-to-join rewrite; naive per-row re-execution would
    * be O(rows × parts). Decimal sum so both engines round identically.
    */
  def h17SmallQuantity: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                  AS DOUBLE) AS avg_yearly,
             count(*) AS n
      FROM li_sql l1
      WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM li_sql l2
                          WHERE l2.l_partkey = l1.l_partkey)
    """)
  }

  /** h22_wealthy_inactive — TPC-H Q22 shape: an uncorrelated scalar
    * subquery (global average balance, computed once and broadcast as a
    * literal-like filter) plus NOT EXISTS decorrelated to a left-anti
    * join. The anti join's build side is the filtered orders projection.
    */
  def h22WealthyInactive: Q = (s, dir) => {
    registerSqlViews(s, dir)
    s.sql("""
      SELECT count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
      FROM cust_sql
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cust_sql WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM ord_sql
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    """)
  }

  /** u5_merge_upsert — MERGE semantics (the lakehouse upsert: apply a
    * change set of inserts/updates/deletes to a base table) expressed as
    * one full-outer join + null-safe delete filter + coalesce resolution.
    * The change set is derived deterministically from the base (keys mod
    * 10: 0→update, 1→delete, 2→insert under a shifted key). The update
    * value is an exact double shift (+1.0), not a multiply — multiplying
    * 2-decimal prices creates genuine half-cent boundaries where engines'
    * rounding rules diverge. At scale this is one shuffle on the merge
    * key (or zero with both sides bucketed on it — see Layout).
    */
  def u5MergeUpsert: Q = (s, dir) => {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val m = pmod(col("o_orderkey"), lit(10))
    val changes = Tables.orders(s, dir)
      .filter(pmod(col("o_orderkey"), lit(10)) <= 2)
      .select(
        when(m === 2, col("o_orderkey") + lit(1000000000L))
          .otherwise(col("o_orderkey")).as("k"),
        when(m === 0, lit("update"))
          .when(m === 1, lit("delete"))
          .otherwise(lit("insert")).as("op"),
        (col("o_totalprice") + lit(1.0)).as("new_price"))
    base.join(changes, col("o_orderkey") === col("k"), "full_outer")
      .filter(!(col("op") <=> lit("delete")))
      .select(
        coalesce(col("o_orderkey"), col("k")).as("merge_key"),
        coalesce(col("new_price"), col("o_totalprice")).as("price"),
        col("op"))
  }

  /** u7_scd2 — Slowly-Changing-Dimension Type-2 history build (the
    * lakehouse companion to u5's MERGE: turn a keyed change log into
    * validity-interval dimension rows). Each customer's order stream,
    * ordered by (date, orderkey), is collapsed to its PRIORITY CHANGES
    * (lag ≠ current drops same-value repeats — SCD2 records transitions,
    * not observations); each surviving row then takes valid_from = its
    * change date and valid_to = the next change's date (lead), open
    * interval + is_current on the last.
    *
    * Scale: one shuffle on the dimension key. Both windows and the
    * filter between them share the (cust_key) partitioning and the
    * (valid_from, ok) sort order, so Catalyst plans a single
    * exchange+sort with two Window nodes over it — the change-filter
    * never repartitions. Per-partition state is one row of lookbehind /
    * lookahead, streaming-friendly at any key cardinality.
    */
  def u7Scd2: Q = (s, dir) =>
    scd2History(Tables.orders(s, dir)
      .select(col("o_custkey").as("cust_key"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").cast("date").as("valid_from"),
        col("o_orderkey").as("ok")))

  /** The SCD2 interval builder over any (cust_key, priority, valid_from,
    * ok) change log — see [[u7Scd2]] for semantics and the plan shape.
    */
  private[graft] def scd2History(changes: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("cust_key"))
      .orderBy(col("valid_from").asc, col("ok").asc)
    changes
      .withColumn("prev", lag(col("priority"), 1).over(byKey))
      .filter(col("prev").isNull || col("prev") =!= col("priority"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKey))
      .select(col("cust_key"), col("priority"), col("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, lit(1)).otherwise(lit(0)).as("is_current"))
  }

  /** a15_hll_union — sketch ALGEBRA (the 100 TB rollup capability the
    * single-shot a2_approx_distinct doesn't show): per-source
    * distinct-3-gram HLL sketches built once over the shared gram
    * stream, then MERGED (register-wise max — commutative, associative,
    * idempotent) to the corpus-level content-diversity estimate — the
    * pre-aggregated-sketch pattern that lets a warehouse answer
    * "distinct across any source subset" without rescanning raw data.
    * Built on the engine-portable explicit-register HLL
    * ([[graft.functions.PortableHll]], p=7 ⇒ m=128/source), so the
    * per-source sketches, the merge, AND both estimates hash-match a
    * DuckDB oracle — the previous native-DataSketches face could only
    * be rows-checked. sum_source_estimates − union_estimate exposes the
    * cross-source overlap, all sketch-side: no exact distinct pass
    * anywhere. The two rollups (per-source, merged) share one shuffle:
    * both aggregate the same (source, bucket) register exchange.
    */
  def a15HllUnion: Q = (s, dir) => {
    import graft.functions.PortableHll
    val P = 7
    val srcOf = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val h = TextQueries.sharedGramStream(s, dir)
      .join(broadcast(srcOf), Seq("doc_id"))
      .select(col("source"), graft.functions.Hashing.md5Long(col("gram")).as("h"))
    // EAGER cut (r15): the register table is tiny (m=128 × n_sources)
    // but has TWO consumers (per-source rollup + merged rollup). As two
    // branches of one plan their shared subtree is only computed once
    // when AQE stage reuse fires — measured NOT firing on the first
    // timed run (reps=1 bench read 2.7 s vs 0.97 at reps=3: the md5
    // pass over the gram stream ran once per branch). Materializing the
    // registers guarantees ONE gram pass per invocation at any scale —
    // exactly what a warehouse does with pre-aggregated sketches.
    val regs = h
      .select(col("source"), PortableHll.bucket(col("h"), P).as("b"),
        PortableHll.rho(col("h"), P).as("rho"))
      .groupBy(col("source"), col("b")).agg(max(col("rho")).as("reg"))
      .localCheckpoint()
    val perSource = regs.groupBy(col("source"))
      .agg(PortableHll.z48(col("reg"), P).as("z48"))
      .select(PortableHll.estimate(col("z48"), P).as("est"))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("est")).cast("long").as("sum_source_estimates"))
    val merged = regs.groupBy(col("b")).agg(max(col("reg")).as("reg"))
      .agg(PortableHll.z48(col("reg"), P).as("z48"))
      .select(PortableHll.estimate(col("z48"), P).as("union_estimate"))
    perSource.crossJoin(merged) // two 1-row frames
      .select(col("n_sources"), col("union_estimate"), col("sum_source_estimates"))
  }

  /** a16_topk_agg — per-user top-3 events by spend as a MERGEABLE
    * k-heap aggregate ([[graft.functions.TopKAgg]]), composed with a
    * plain count IN THE SAME groupBy — the single-pass leaderboard.
    * The window formulation (`row_number() OVER (PARTITION BY user
    * ORDER BY spend DESC)`, the ev_window_topk shape) needs its own
    * partitioning pass and a per-partition SORT; here top-k rides the
    * ONE hash aggregate: map-side partial heaps bound what the
    * exchange carries to k slots per (group, partition), the reduce
    * side folds heaps, and no sort exists anywhere in the plan.
    * Exact, merge-order-independent (top-k under a total order is a
    * bounded-set monoid), hence DuckDB-oracle-able — unlike the sketch
    * aggregates. Spend is keyed as ⌊value·100⌋ cents with an event-id
    * tiebreak: every slot is integer-deterministic cross-engine.
    */
  def a16TopkAgg: Q = (s, dir) => {
    // user-cardinality group key under a typed-imperative agg: raise
    // the object-hash-agg fallback valve (bounded k-heap states; see
    // TopKAgg.ensureHashAggCapacity)
    graft.functions.TopKAgg.ensureHashAggCapacity(s)
    val ev = Tables.events(s, dir).select(
      col("user_id"),
      floor(col("value") * 100).cast("long").as("cents"),
      col("event_id"))
    ev.groupBy(col("user_id"))
      .agg(graft.functions.TopKAgg.topK(col("cents"), col("event_id"), 3).as("top"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), posexplode(col("top")), col("n_events"))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("event_id"), col("col.score").as("cents"),
        col("n_events"))
  }

  /** a17_equidepth — equi-depth (equal-height) histogram of lineitem
    * price: 32 buckets of (lo, hi, count), the ANALYZE-statistics shape
    * every optimizer's selectivity estimation is built on. Bucket
    * membership is by GLOBAL RANK — bucket = ⌊(rank−1)·B/N⌋ — which is
    * exactly what `Window.orderBy(price)` cannot provide at scale (no
    * partition key → every row to one partition), so the rank comes
    * from [[graft.operators.PrefixSum]]: one range exchange +
    * per-partition offsets, then a bucket-keyed aggregate. Ties get
    * arbitrary relative rank, but the OUTPUT is tie-invariant: counts
    * are fixed by the rank formula alone, and when a tie run straddles
    * a boundary the left bucket's hi and the right bucket's lo both
    * equal the tied value regardless of which tied row lands where —
    * so the integer-cents histogram is deterministic cross-engine and
    * fully oracled (DuckDB mirrors the same ⌊(rn−1)·B/N⌋ arithmetic,
    * not `ntile`, whose front-loaded remainder sizing differs).
    */
  def a17Equidepth: Q = (s, dir) => {
    val B = 32
    val cents = Tables.lineitem(s, dir).select(
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      lit(1L).as("one"))
    val n = FrameCache.cachedCount(s, s"a17_n_lineitem:$dir")(cents.count())
    graft.operators.PrefixSum.withRunningSum(cents, "cents", "one", "rank")
      .select(col("cents"),
        expr(s"((rank - 1) * $B) div $n").as("bucket_id"))
      .groupBy(col("bucket_id"))
      .agg(min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"),
        count(lit(1)).as("n_rows"))
  }

  /** o7_mom_change — month-over-month revenue deltas per nation (the
    * time-series reporting shape: grouped monthly rollup composed with
    * a lag window). Money accumulates in exact DECIMAL and the delta is
    * a DECIMAL subtraction — the ranking/delta key can never flip on a
    * float reduction order; the month key is the integer y·12+m, no
    * calendar intervals. Plan: dims broadcast, one aggregate shuffle on
    * (nation, month), then the lag window over the tiny monthly frame.
    */
  def o7MomChange: Q = (s, dir) => {
    val monthly = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.partitionBy(col("nation")).orderBy(col("ym").asc)
    monthly
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .select(col("nation"), col("ym"),
        col("rev").cast("double").as("revenue"),
        (col("rev") - col("prev")).cast("double").as("mom_delta"))
  }

  /** Week length in microseconds — the retention bucket. */
  private val WeekUs = 604800000000L

  /** ev_retention — cohort retention matrix (the product-analytics
    * staple: of users first seen in week w, how many were active again
    * in week w+k). Weeks are integer epoch-week indices
    * (unix_micros div 7·86400·10⁶) — no calendar/timezone arithmetic to
    * diverge between engines. ONE event scan: distinct (user, week),
    * per-user cohort as a min-over-window on the SAME frame (a separate
    * cohort aggregate joined back would rescan the raw events), then
    * the (cohort, offset) rollup — the event stream shuffles once by
    * (user, week); everything after runs on the distinct table.
    */
  def evRetention: Q = (s, dir) => {
    // integer `div`, never `/`: micros exceed 2^53, double division
    // would corrupt the week index
    val uw = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${WeekUs}L").as("week"))
      .distinct()
    uw.withColumn("cohort", min(col("week")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Day length in microseconds — [[evCumUniques]]' bucket. */
  private val DayUs = 86400000000L

  /** ev_cum_uniques — cumulative distinct users by day (the growth-curve
    * staple: "total users ever seen, as of each day", plus that day's
    * new-user count). A windowed COUNT(DISTINCT) is not something any
    * engine executes directly — the scale form is the FIRST-SEEN
    * reduction: distinct-count-so-far ≡ running sum of first-seen
    * counts, because each user contributes exactly once, on their first
    * day. Days are integer epoch-day indices (unix_micros div 86400·10⁶
    * — no calendar/timezone arithmetic to diverge between engines).
    *
    * Scale: one shuffle on user_id collapses the event stream to one
    * row per user (min-day, map-side combined), one tiny aggregate to
    * per-day new-user counts, then the running sum windows over a frame
    * the size of the DATE RANGE — thousands of rows whatever the event
    * volume (the deliberate partitionless window, same note as
    * [[o8Pareto]]). Days with events but no new users are absent by
    * construction (their cumulative equals the previous emitted day's).
    */
  def evCumUniques: Q = (s, dir) => {
    val firstSeen = Tables.events(s, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div ${DayUs}L").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    firstSeen.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users",
        sum(col("n_new")).over(Window.orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** ev_rolling_distinct — rolling 7-day distinct users for every day
    * in the data's range (the DAU/WAU dashboard pair, plus the
    * ⌊10⁶·DAU/WAU⌋ stickiness ratio). Distinct-over-a-sliding-window is
    * the one windowed aggregate NO engine's window functions express
    * (COUNT(DISTINCT) OVER a range frame is invalid SQL almost
    * everywhere) and the naive form — join every day against its
    * trailing 7 days of events — rescans event volume 7×. The scale
    * form is the INTERVAL-MERGE + SWEEP reduction: a user active on
    * days d₁..dₙ is present in exactly the window-ends covered by
    * ∪[dᵢ, dᵢ+6]; merging those per user (gap > 6 starts a new
    * interval) turns membership into ±1 boundary deltas, and the
    * per-day running sum of deltas IS the rolling distinct count.
    *
    * Scale: ONE exchange on user_id carries the per-user stage — the
    * (user, day) dedup, the lag/break windows, and the interval
    * aggregate all share it (user_id partitioning satisfies every
    * grouping it prefixes). Deltas then aggregate to a DATE-RANGE-sized
    * frame, and the final running sum windows over the day grid —
    * thousands of rows whatever the event volume (the deliberate
    * partitionless window, same note as [[evCumUniques]]). Event rows
    * are read once; nothing is rescanned per window position.
    */
  def evRollingDistinct: Q = (s, dir) => {
    // The deduped (user, day) frame feeds three consumers (intervals,
    // DAU, the day grid) — cached so the event scan and its one
    // user_id exchange happen once, not per consumer.
    val ud = FrameCache.cached(s, s"ev_user_day:$dir")(
      Tables.events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) div ${DayUs}L").as("day"))
        .repartition(col("user_id"))
        .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("_n")).drop("_n"))
    val wU = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    val prev = lag(col("day"), 1).over(wU)
    val ivl = ud
      .withColumn("brk",
        when(prev.isNull || col("day") > prev + 6, 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("day")).as("lo"), (max(col("day")) + 6).as("hi"))
    // both boundary deltas from ONE pass over the interval frame — a
    // union of two selects would recompute the whole per-user subtree
    val deltas = ivl
      .select(explode(array(
        struct(col("lo").as("day"), lit(1L).as("delta")),
        struct((col("hi") + 1).as("day"), lit(-1L).as("delta")))).as("d"))
      .groupBy(col("d.day").as("day")).agg(sum(col("d.delta")).as("net"))
    val grid = ud.agg(min(col("day")).as("glo"), max(col("day")).as("ghi"))
      .select(explode(sequence(col("glo"), col("ghi"))).as("day"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    grid.join(deltas, Seq("day"), "left").join(dau, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("net"), lit(0L)).as("net"))
      .withColumn("wau", sum(col("net")).over(Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("dau"), col("wau"),
        expr("case when wau > 0 then (1000000L * dau) div wau else 0L end")
          .as("stickiness_micro"))
  }

  /** ev_anomaly — per-user 2σ outlier detection over event values (the
    * telemetry pass that flags users' anomalous events before alerting
    * or filtering). The test |v − μ| > 2σ is evaluated WITHOUT floats:
    * values are exact cents (the data's 2-decimal grid ×100), and the
    * inequality is cross-multiplied to (n·v − Σv)² > 4·(n·Σv² − (Σv)²)
    * — all-integer, so the flag can never flip on a reduction-order ulp
    * the way a naive stddev comparison can. One shuffle on user_id: the
    * moment sums ride a window over the same partitioning the flags are
    * evaluated in, then the per-user rollup reuses it.
    *
    * Overflow bound: safe while n·v_max < 3·10⁹ cents (longs); at
    * larger per-key volumes the same identity runs in DECIMAL(38,0).
    */
  def evAnomaly: Q = (s, dir) => anomalyReport(Tables.events(s, dir))

  /** The integer 2σ detector over any (user_id, event_id, value) frame
    * — see [[evAnomaly]].
    */
  private[graft] def anomalyReport(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      .select(col("user_id"), col("event_id"), col("v"),
        count(lit(1)).over(w).as("n"),
        sum(col("v")).over(w).as("s1"),
        sum(col("v") * col("v")).over(w).as("s2"))
      .withColumn("flag",
        (col("n") * col("v") - col("s1")) * (col("n") * col("v") - col("s1"))
          > lit(4L) * (col("n") * col("s2") - col("s1") * col("s1")))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"),
        sum(when(col("flag"), 1L).otherwise(0L)).cast("long").as("n_outliers"),
        sum(when(col("flag"), col("event_id")).otherwise(0L)).cast("long").as("outlier_id_sum"))
  }

  /** o4_range_frame — RANGE (value-range) frame: per-user trailing-1-hour
    * moving sum over event time. Unlike a ROWS frame, the frame edge is a
    * VALUE bound (ts − 1 h), so tied timestamps are peers and enter the
    * frame together — the semantics behind every "activity in the last N
    * minutes" feature. Ordering key is integer epoch-millis: exact frame
    * arithmetic, no float time math, identical truncation in any engine.
    * One shuffle on user_id; the frame scan is a per-partition sliding
    * pointer, O(n) per user, no quadratic re-sum.
    */
  def o4RangeFrame: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms").asc)
      .rangeBetween(-3600000L, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        bround(sum(col("value")).over(w), 4).as("hour_sum"))
  }

  /** o5_dist_stats — distribution-position functions in one window pass:
    * ntile quartile bucketing, percent_rank, cume_dist per market segment.
    * The ordering carries a unique tiebreaker (acctbal, custkey) so ntile's
    * bucket boundaries are deterministic; percent_rank/cume_dist are exact
    * integer-count ratios, bit-identical across engines.
    */
  def o5DistStats: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, dir).select(
      col("c_custkey"), col("c_mktsegment"),
      ntile(4).over(w).as("quartile"),
      bround(percent_rank().over(w), 6).as("pr"),
      bround(cume_dist().over(w), 6).as("cd"))
  }

  /** o6_first_last — frame-sensitive value functions: first_value under
    * the default growing frame vs last_value / nth_value forced to the
    * FULL partition frame (the classic bug: default-frame last_value is
    * just the current row). One exchange + one sort serves all three.
    */
  def o6FirstLast: Q = (s, dir) => {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      first(col("o_orderkey")).over(ord).as("first_ord"),
      last(col("o_orderkey")).over(full).as("last_ord"),
      nth_value(col("o_orderkey"), 2).over(full).as("second_ord"))
  }

  /** a13_grouping_sets — explicit non-hierarchical GROUPING SETS (neither
    * rollup nor cube): two independent 1-D marginals in one pass through
    * the raw SQL surface. Same Expand-before-exchange machinery as
    * a10/a11 — the input is read once, not once per set.
    */
  def a13GroupingSets: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("customer_gs")
    s.sql("""
      SELECT c_mktsegment, c_nationkey, count(*) AS n,
             CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
             CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat
      FROM customer_gs
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """)
  }

  /** h10_returned_items — TPC-H Q10 shape: revenue lost to returns per
    * customer, top 20. The selective l_returnflag filter pushes to the
    * lineitem scan (reads ~1/4 of rows), orders⋈lineitem shuffles on
    * orderkey — and the per-customer aggregate runs BEFORE the customer
    * join: c_custkey is customer's key, so grouping by it alone is the
    * same partition of fact rows as grouping by (custkey, name, nation)
    * after the join, and only ≤|customers| aggregated rows (not the
    * ~10M joined fact rows) reach the dimension joins. The tiny nation
    * dim broadcasts; final top-20 is TakeOrderedAndProject — per-task
    * bounded heap, no global sort at any scale.
    */
  def h10ReturnedItems: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev_raw"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        bround(col("rev_raw"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** h18_large_orders — TPC-H Q18 shape: the "large volume customer"
    * having-filter. The lineitem self-aggregation partial-aggregates
    * map-side, the HAVING predicate cuts the aggregate BEFORE the joins
    * (orders of magnitude fewer rows enter them), and the surviving keys
    * are few enough that AQE turns both joins into broadcasts at runtime.
    */
  def h18LargeOrders: Q = (s, dir) => {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big.join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey")),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** j8_bloom_prefilter — runtime-filter join pruning, the star-schema
    * 100 TB pattern: build a Bloom filter over the selective dim-side
    * keys (one small job), prune the fact scan with it BEFORE the
    * shuffle, then let the exact semi-join remove the false positives.
    * At sf0.01 the bloom drops nothing the semi-join wouldn't; at 100 TB
    * it is the difference between shuffling the full fact table and
    * shuffling the ~matching slice — exactly what Spark's own
    * spark.sql.optimizer.runtime.bloomFilter does for plans it can see
    * through; here it is explicit and composable. The sketch is sized
    * from the build side's actual key count (3% fpp), so the broadcast
    * stays proportional to the dim slice at every scale.
    */
  def j8BloomPrefilter: Q = (s, dir) => {
    // persisted: the build side feeds the bloom job AND the exact
    // semi-join — one orders scan, and its count sizes the sketch so the
    // fpp holds at any scale instead of degrading past a fixed capacity.
    // FrameCache-keyed by input dir: bench reps reuse one entry instead
    // of leaking a persisted copy per invocation.
    val urgent = FrameCache.cached(s, s"j8_urgent:$dir")(
      Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")))
    val urgentKeys = urgent.count()
    // bloomFilter() is the build-side job of the runtime-filter pattern —
    // an eager action by design (Spark's own runtime bloom does the same
    // in its subquery). The probe side is Spark's native
    // BloomFilterMightContain over the serialized sketch as a binary
    // literal — the same expression InjectRuntimeFilter plants — so the
    // fact-scan filter stays inside whole-stage codegen (the earlier UDF
    // form broke the codegen span at exactly the hottest point). Both
    // sides speak sketch.BloomFilterImpl putLong/mightContainLong, so
    // build and probe hash identically; the literal ships with the task
    // binary like the old closure did — nothing to destroy() across
    // bench reps.
    // empty build side -> the semi-join below returns nothing anyway;
    // also guards stat.bloomFilter's NPE on an empty frame
    if (urgentKeys == 0L) {
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice")).filter(lit(false))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), bround(sum(col("l_extendedprice")), 2).as("sum_price"))
    } else {
    val bloom = urgent.stat.bloomFilter("o_orderkey", urgentKeys, 0.03)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    val mightContain = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes,
          org.apache.spark.sql.types.BinaryType),
        Bridge.expression(col("l_orderkey"))))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      .filter(mightContain)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        bround(sum(col("l_extendedprice")), 2).as("sum_price"))
    }
  }

  /** j9_range_join — point-in-interval join through the
    * [[graft.plans.BinnedRangeJoin]] optimizer rule: events falling in
    * each user's first-six-hours window, written as the natural
    * `ts BETWEEN lo AND hi` join. Without the rule Catalyst has no equi
    * key and plans a BroadcastNestedLoopJoin (every event × every
    * interval); the rule rewrites to an hour-bin equi-join — one shuffle
    * of events by bin, ~7 exploded rows per 6 h interval — and re-applies
    * the exact predicate. The join is intentionally CROSS-user (an event
    * can fall in any user's window): a genuine m×n range join, not one an
    * equi key could express.
    *
    * The interval side is the FIXED pilot cohort (`user_id < 150` — all
    * users at the sf0.01 correctness gate), not every user: with both
    * sides growing ∝ SF over the generator's fixed 30-day span, the
    * all-users join's OUTPUT is Θ(events·users·len/span) — quadratic in
    * SF for any engine, an output lower bound no plan can beat. Bounding
    * the interval side keeps the query linear in events and the exploded
    * interval table broadcast-sized (≤ 150×7 rows), which is exactly how
    * a production point-in-interval probe is shaped: events stream past
    * a bounded window table.
    *
    * The rule arrives with the session — every entry point (Verify,
    * Bench, SparkTestBase) builds with
    * `spark.sql.extensions=graft.GraftExtensions`, the cluster
    * deployment model — so this query function mutates NO session state
    * and bench results cannot depend on query order. The rule is
    * semantics-preserving and its eligibility is narrow (exactly two
    * range conjuncts, no equi key), so coexisting queries are untouched;
    * `spark.graft.rangeJoin.enabled=false` opts out.
    */
  def j9RangeJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("value"))
    val iv = ev.filter(col("user_id") < 150)
      .groupBy(col("user_id").as("iv_user"))
      .agg(min(col("ts_ms")).as("lo"))
      .select(col("iv_user"), col("lo"), (col("lo") + lit(21600000L)).as("hi"))
    ev.join(iv, col("ts_ms") >= col("lo") && col("ts_ms") <= col("hi"))
      .groupBy(col("iv_user"))
      .agg(count(lit(1)).as("n_in_window"),
        bround(sum(col("value")), 4).as("sum_value"))
  }

  /** j10_nullsafe_join — equi-join on NULL-SAFE equality (`<=>`): NULL
    * keys match the dim's NULL row instead of dropping out, the lookup
    * shape for "unknown bucket" enrichment. Spark plans `<=>` as a hash
    * join key (EqualNullSafe is an equi key, NOT a theta join), so this
    * broadcasts like any lookup — semantics the plain `===` join cannot
    * express without a coalesce-to-sentinel hack that corrupts real
    * sentinel values.
    */
  def j10NullsafeJoin: Q = (s, dir) => {
    import s.implicits._
    val facts = Tables.orders(s, dir).select(
      col("o_orderkey"),
      when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("k"))
    val dim = Seq((Some("O"), "open"), (Some("F"), "finished"),
      (Some("P"), "pending"), (Option.empty[String], "unknown"))
      .toDF("dk", "label")
    facts.join(broadcast(dim), col("k") <=> col("dk"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).cast("long").as("sum_keys"))
  }

  /** j11_skew_salted — deliberately skewed fact→dim join through
    * [[graft.operators.SkewJoin.saltedJoin]]: every 4th supplier key is
    * remapped to nation 7, so one join key carries ~28% of the fact
    * table (25× its fair share). The salt — a deterministic hash of the
    * row, retry-safe — spreads that hot key over `factor` reducers; the
    * dim side explodes `factor`× so every (key, salt) bucket matches.
    * Result ≡ the plain join (the DuckDB oracle IS the plain join);
    * OperatorsSpec asserts the (key, salt) shuffle and that every
    * expression in the plan is deterministic.
    */
  def j11SkewSalted: Q = (s, dir) => {
    val fact = Tables.lineitem(s, dir).select(
      when(pmod(col("l_suppkey"), lit(4)) === 0, lit(7L))
        .otherwise(pmod(col("l_suppkey"), lit(25)).cast("long")).as("k"),
      col("l_quantity"))
    val dim = Tables.nation(s, dir)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
    graft.operators.SkewJoin.saltedJoin(fact, dim, Seq("k"), factor = 8)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
  }

  /** u6_intersect — row-level INTERSECT (distinct-set semantics), the
    * set-op the reference's surface lacks (COVERAGE §2.6 notes U-family
    * has union/except only): customers with both open AND finished
    * orders. Spark plans one hash-partitioned left-semi over
    * pre-distincted sides — a single exchange per side on the same key.
    */
  def u6Intersect: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
  }

  /** o8_pareto — the 2-D skyline (pareto front): orders no other order
    * dominates on the (earlier date, higher price) tradeoff — the
    * "best seen so far" frontier query (price in exact integer cents;
    * dominance can never flip on a float ulp). Same-date same-price
    * ties are all on the front (neither strictly dominates).
    *
    * Scale: the classic sweep, not the O(n²) dominance join — one
    * aggregation collapses the fact table to per-date maxima (the
    * frontier can only live there), a window over that DATE-sized
    * frame computes the strictly-before running max, and the surviving
    * frontier dates broadcast back onto the fact scan to recover every
    * tied row. Cost at 100 TB: one shuffle keyed by date + one
    * broadcast-joined rescan; the window runs over thousands of rows
    * regardless of fact cardinality. (d > 2 dimensions need the
    * grid-partition skyline — local fronts per cell, prune cells
    * dominated by a whole better cell, merge — this operator is the
    * d = 2 special case where a total order exists.)
    */
  def o8Pareto: Q = (s, dir) =>
    paretoFront(Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents")))

  /** The 2-D skyline core over any (id, date, cents) frame: rows where
    * cents = max(cents) at their date AND that per-date max strictly
    * exceeds every earlier date's max — exactly the non-dominated set
    * for (minimize date, maximize cents). See [[o8Pareto]]; the spec
    * drives this against a brute-force O(n²) dominance reference.
    */
  private[graft] def paretoFront(points: DataFrame): DataFrame = {
    val Seq(idC, dateC, centsC) = points.columns.toSeq
    val dmax = points.groupBy(col(dateC))
      .agg(max(col(centsC)).as("dmax"))
    val prevW = Window.orderBy(col(dateC).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = dmax
      .withColumn("prevmax", max(col("dmax")).over(prevW))
      .filter(col("prevmax").isNull || col("dmax") > col("prevmax"))
      .select(col(dateC).as("f_date"), col("dmax"))
    points.join(broadcast(front),
      col(dateC) === col("f_date") && col(centsC) === col("dmax"))
      .select(col(idC), col(dateC), col(centsC))
  }

  /** The [[u8MvDelta]] base/delta boundary (oracle shares it). */
  val MvSplitDate = "1998-01-01"

  /** u8_mv_delta — incremental materialized-view maintenance: a
    * per-customer order summary (count, revenue in exact cents, last
    * order date) is materialized over the history BEFORE [[MvSplitDate]],
    * then brought current by MERGING the delta batch's partial
    * aggregate states — never rescanning history. Each state is
    * mergeable algebra (sum+sum, sum+sum, max+max), so merged-partials
    * ≡ full recompute bit-for-bit — which is exactly what the oracle
    * checks: it computes the view the naive way, one GROUP BY over all
    * of orders, a structurally different derivation.
    *
    * Scale: THE pattern that keeps a 100 TB rollup fresh — per-refresh
    * cost is agg(delta) + a merge join sized by the VIEW, not the
    * history. At cluster scale both the stored view and the delta
    * aggregate are bucketed on the group key, so the full-outer merge
    * is exchange-free; history is never touched after its one
    * founding aggregation. Derived values (averages etc.) come from
    * the stored sums at read time — only mergeable states are stored.
    */
  def u8MvDelta: Q = (s, dir) => {
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderdate"))
    def mv(part: DataFrame): DataFrame = part.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"),
        max(col("o_orderdate")).as("last"))
    val base = mv(o.filter(col("o_orderdate") < lit(MvSplitDate).cast("timestamp")))
      .select(col("o_custkey").as("bk"), col("n").as("bn"),
        col("rev").as("br"), col("last").as("bl"))
    val delta = mv(o.filter(col("o_orderdate") >= lit(MvSplitDate).cast("timestamp")))
      .select(col("o_custkey").as("dk"), col("n").as("dn"),
        col("rev").as("dr"), col("last").as("dl"))
    base.join(delta, col("bk") === col("dk"), "full_outer")
      .select(coalesce(col("bk"), col("dk")).as("cust_key"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("br"), lit(0L)) + coalesce(col("dr"), lit(0L))).as("revenue_cents"),
        greatest(coalesce(col("bl"), col("dl")),
          coalesce(col("dl"), col("bl"))).as("last_order"))
  }

  val queries: Map[String, Q] = Map(
    "o8_pareto" -> o8Pareto,
    "u8_mv_delta" -> u8MvDelta,
    "j9_range_join" -> j9RangeJoin,
    "j10_nullsafe_join" -> j10NullsafeJoin,
    "h13_custdist" -> h13Custdist,
    "h15_top_supplier" -> h15TopSupplier,
    "h17_small_quantity" -> h17SmallQuantity,
    "h22_wealthy_inactive" -> h22WealthyInactive,
    "u6_intersect" -> u6Intersect,
    "u7_scd2" -> u7Scd2,
    "ev_anomaly" -> evAnomaly,
    "ev_retention" -> evRetention,
    "ev_cum_uniques" -> evCumUniques,
    "ev_rolling_distinct" -> evRollingDistinct,
    "o7_mom_change" -> o7MomChange,
    "a15_hll_union" -> a15HllUnion,
    "a16_topk_agg" -> a16TopkAgg,
    "a17_equidepth" -> a17Equidepth,
    "o4_range_frame" -> o4RangeFrame,
    "o5_dist_stats" -> o5DistStats,
    "o6_first_last" -> o6FirstLast,
    "a13_grouping_sets" -> a13GroupingSets,
    "h10_returned_items" -> h10ReturnedItems,
    "h18_large_orders" -> h18LargeOrders,
    "j8_bloom_prefilter" -> j8BloomPrefilter,
    "u5_merge_upsert" -> u5MergeUpsert,
    "sql_tpch_q6" -> sqlTpchQ6,
    "sql_tpch_q4" -> sqlTpchQ4,
    "sql_tpch_q21" -> sqlTpchQ21,
    "sql_tpch_q2" -> sqlTpchQ2,
    "sql_tpch_q11" -> sqlTpchQ11,
    "sql_tpch_q19" -> sqlTpchQ19,
    "sql_tpch_q20" -> sqlTpchQ20,
    "sql_tpch_q7" -> sqlTpchQ7,
    "sql_tpch_q8" -> sqlTpchQ8,
    "sql_tpch_q9" -> sqlTpchQ9,
    "sql_tpch_q12" -> sqlTpchQ12,
    "sql_tpch_q14" -> sqlTpchQ14,
    "sql_tpch_q16" -> sqlTpchQ16,
    "j11_skew_salted" -> j11SkewSalted,
    "o2_window_rank" -> o2WindowRank,
    "o3_running_total" -> o3RunningTotal,
    "a10_rollup" -> a10Rollup,
    "a11_cube" -> a11Cube,
    "a12_percentiles" -> a12Percentiles,
    "a14_approx_percentiles" -> a14ApproxPercentiles,
    "p8_pivot" -> p8Pivot,
    "p9_unpivot" -> p9Unpivot,
    "p10_zorder" -> p10Zorder,
    "h3_shipping_priority" -> h3ShippingPriority,
    "h5_nation_revenue" -> h5NationRevenue)

  val oracle: Map[String, String] = Map(
    "a15_hll_union" -> {
      import graft.functions.PortableHll._
      val p = 7
      s"""${DedupQueries.duckShingles},
        |g AS (SELECT doc_id, unnest(list_distinct(shingles)) AS gram FROM sh),
        |h AS (SELECT d.source AS source, ${duckH("g.gram")} AS h
        |      FROM g JOIN documents d USING (doc_id)),
        |w AS (SELECT source, h >> ${60 - p} AS b, ${duckWindow("h", p)} AS w FROM h),
        |r AS (SELECT source, b, ${duckRho("w", p)} AS rho FROM w),
        |regs AS (SELECT source, b, max(rho) AS reg FROM r GROUP BY 1, 2),
        |per_src AS (
        |  SELECT count(*) AS n_sources,
        |    sum(est)::BIGINT AS sum_source_estimates
        |  FROM (SELECT source, ${duckEstimate(duckZ48(p), p)} AS est
        |        FROM regs GROUP BY 1)),
        |merged AS (
        |  SELECT ${duckEstimate(duckZ48(p), p)} AS union_estimate
        |  FROM (SELECT b, max(reg) AS reg FROM regs GROUP BY 1) m)
        |SELECT n_sources, union_estimate, sum_source_estimates
        |FROM per_src, merged""".stripMargin
    },
    "a16_topk_agg" ->
      """SELECT user_id, rn AS rank, event_id, cents, n_events FROM (
        |  SELECT user_id, event_id,
        |    floor(value * 100)::BIGINT AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY floor(value * 100)::BIGINT DESC, event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events) t
        |WHERE rn <= 3""".stripMargin,
    "a17_equidepth" ->
      """WITH r AS (
        |  SELECT round(l_extendedprice * 100)::BIGINT AS cents,
        |    row_number() OVER (
        |      ORDER BY round(l_extendedprice * 100)::BIGINT) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem)
        |SELECT ((rn - 1) * 32) // n AS bucket_id,
        |  min(cents) AS lo_cents, max(cents) AS hi_cents,
        |  count(*)::BIGINT AS n_rows
        |FROM r GROUP BY 1""".stripMargin,
    "o8_pareto" ->
      """WITH p AS (
        |  SELECT o_orderkey, o_orderdate,
        |    round(o_totalprice * 100)::BIGINT AS price_cents
        |  FROM orders),
        |d AS (SELECT o_orderdate, max(price_cents) AS dmax FROM p GROUP BY 1),
        |r AS (
        |  SELECT o_orderdate, dmax,
        |    max(dmax) OVER (ORDER BY o_orderdate
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM d),
        |f AS (SELECT o_orderdate, dmax FROM r
        |      WHERE prevmax IS NULL OR dmax > prevmax)
        |SELECT p.o_orderkey, p.o_orderdate, p.price_cents
        |FROM p JOIN f ON p.o_orderdate = f.o_orderdate
        |  AND p.price_cents = f.dmax""".stripMargin,
    "u8_mv_delta" ->
      s"""SELECT o_custkey AS cust_key, count(*)::BIGINT AS n_orders,
        |  sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS revenue_cents,
        |  max(o_orderdate) AS last_order
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "sql_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "sql_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "sql_tpch_q7" -> fillNames(tpchQ7Sql, duckNames),
    "sql_tpch_q8" -> fillNames(tpchQ8Sql, duckNames),
    "sql_tpch_q9" -> fillNames(tpchQ9Sql, duckNames),
    "sql_tpch_q12" -> fillNames(tpchQ12Sql, duckNames),
    "sql_tpch_q14" -> fillNames(tpchQ14Sql, duckNames),
    "sql_tpch_q16" -> fillNames(tpchQ16Sql, duckNames),
    "sql_tpch_q2" ->
      """SELECT p_brand, p_partkey, l_suppkey, l_extendedprice AS min_price
        |FROM part, lineitem
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
        |                         WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "sql_tpch_q11" ->
      """SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING sum(l_quantity) > (SELECT 1.2 * sum(l_quantity) / count(DISTINCT l_partkey)
        |                          FROM lineitem)""".stripMargin,
    "sql_tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND ((p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "sql_tpch_q20" ->
      """SELECT s_name, s_nationkey
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT sp.l_suppkey FROM
        |    (SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
        |     FROM lineitem GROUP BY l_partkey, l_suppkey) sp
        |  WHERE sp.q > (SELECT 4.0 * sum(l2.l_quantity) / count(DISTINCT l2.l_suppkey)
        |                FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey))""".stripMargin,
    "j11_skew_salted" ->
      """SELECT n_name, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN nation
        |  ON (CASE WHEN l_suppkey % 4 = 0 THEN 7 ELSE l_suppkey % 25 END) = n_nationkey
        |GROUP BY 1""".stripMargin,
    "h13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC LIMIT 10""".stripMargin,
    "h15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        |  FROM lineitem GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "h17_small_quantity" ->
      """SELECT round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
        |   AS avg_yearly,
        | count(*) AS n
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "h22_wealthy_inactive" ->
      """SELECT count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')""".stripMargin,
    "j10_nullsafe_join" ->
      """WITH facts AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS k
        |  FROM orders),
        |dim(dk, label) AS (VALUES ('O', 'open'), ('F', 'finished'),
        |                          ('P', 'pending'), (NULL, 'unknown'))
        |SELECT label, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM facts JOIN dim ON k IS NOT DISTINCT FROM dk
        |GROUP BY 1""".stripMargin,
    "j9_range_join" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        |iv AS (SELECT user_id AS iv_user, min(ts_ms) AS lo,
        |         min(ts_ms) + 21600000 AS hi FROM ev
        |       WHERE user_id < 150 GROUP BY 1)
        |SELECT iv_user, count(*) AS n_in_window,
        |       round(sum(value), 4) AS sum_value
        |FROM ev JOIN iv ON ts_ms >= lo AND ts_ms <= hi
        |GROUP BY 1""".stripMargin,
    "u6_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "o4_range_frame" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 4) AS hour_sum
        | FROM events""".stripMargin,
    "o5_dist_stats" ->
      """SELECT c_custkey, c_mktsegment,
        | ntile(4) OVER w AS quartile,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd
        | FROM customer
        | WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin,
    "o6_first_last" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_ord,
        | last_value(o_orderkey) OVER wf AS last_ord,
        | nth_value(o_orderkey, 2) OVER wf AS second_ord
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "a13_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
        | CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
        | CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat
        | FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))""".stripMargin,
    "h10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        | FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN nation ON c_nationkey = n_nationkey
        | WHERE l_returnflag = 'R'
        | GROUP BY 1, 2, 3
        | ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "h18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |  GROUP BY 1 HAVING sum(l_quantity) > 250)
        |SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "j8_bloom_prefilter" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS sum_price
        | FROM lineitem
        | WHERE l_orderkey IN
        |   (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        | GROUP BY 1""".stripMargin,
    "u5_merge_upsert" ->
      """WITH changes AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 2 THEN o_orderkey + 1000000000
        |              ELSE o_orderkey END AS k,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'update'
        |         WHEN o_orderkey % 10 = 1 THEN 'delete'
        |         ELSE 'insert' END AS op,
        |    o_totalprice + 1.0 AS new_price
        |  FROM orders WHERE o_orderkey % 10 <= 2)
        |SELECT coalesce(o.o_orderkey, c.k) AS merge_key,
        |  coalesce(c.new_price, o.o_totalprice) AS price, c.op AS op
        |FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.k
        |WHERE op IS DISTINCT FROM 'delete'""".stripMargin,
    "o7_mom_change" ->
      """WITH m AS (
        |  SELECT n.n_name AS nation,
        |    year(o.o_orderdate) * 12 + month(o.o_orderdate) AS ym,
        |    sum(o.o_totalprice::DECIMAL(18,2)) AS rev
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2)
        |SELECT nation, ym, rev::DOUBLE AS revenue,
        |  (rev - lag(rev) OVER (PARTITION BY nation ORDER BY ym))::DOUBLE AS mom_delta
        |FROM m""".stripMargin,
    "ev_cum_uniques" ->
      """WITH fs AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY user_id),
        |d AS (SELECT first_day AS day, count(*)::BIGINT AS n_new
        |      FROM fs GROUP BY 1)
        |SELECT day, n_new,
        |  sum(n_new) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS cum_users
        |FROM d""".stripMargin,
    // The oracle takes the form the engine-side reduction avoids: the
    // day-grid range join against (user, day) with COUNT(DISTINCT) —
    // correct by definition, 7x-rescanning by construction.
    "ev_rolling_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
        |grid AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b),
        |w AS (SELECT g.day, count(DISTINCT u.user_id)::BIGINT AS wau
        |      FROM grid g JOIN ud u ON u.day BETWEEN g.day - 6 AND g.day
        |      GROUP BY 1),
        |d AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1)
        |SELECT g.day, coalesce(d.dau, 0)::BIGINT AS dau,
        |  coalesce(w.wau, 0)::BIGINT AS wau,
        |  (CASE WHEN coalesce(w.wau, 0) > 0
        |        THEN (1000000 * coalesce(d.dau, 0)) // w.wau
        |        ELSE 0 END)::BIGINT AS stickiness_micro
        |FROM grid g LEFT JOIN w ON g.day = w.day
        |LEFT JOIN d ON g.day = d.day""".stripMargin,
    "ev_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |c AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id)
        |SELECT c.cohort, uw.week - c.cohort AS week_offset,
        |  count(*) AS n_active
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "ev_anomaly" ->
      """WITH e AS (
        |  SELECT user_id, event_id, round(value * 100)::BIGINT AS v
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, v,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    sum(v) OVER (PARTITION BY user_id) AS s1,
        |    sum(v * v) OVER (PARTITION BY user_id) AS s2
        |  FROM e),
        |f AS (
        |  SELECT *, (n * v - s1) * (n * v - s1) > 4 * (n * s2 - s1 * s1) AS flag
        |  FROM m)
        |SELECT user_id, max(n)::BIGINT AS n_events,
        |  sum(CASE WHEN flag THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        |  sum(CASE WHEN flag THEN event_id ELSE 0 END)::BIGINT AS outlier_id_sum
        |FROM f GROUP BY user_id""".stripMargin,
    "u7_scd2" ->
      """WITH s AS (
        |  SELECT o_custkey AS cust_key, o_orderpriority AS priority,
        |    CAST(o_orderdate AS DATE) AS valid_from, o_orderkey AS ok
        |  FROM orders),
        |c AS (
        |  SELECT *, lag(priority) OVER
        |    (PARTITION BY cust_key ORDER BY valid_from, ok) AS prev
        |  FROM s),
        |chg AS (SELECT cust_key, priority, valid_from, ok
        |        FROM c WHERE prev IS NULL OR prev <> priority),
        |h AS (
        |  SELECT cust_key, priority, valid_from,
        |    lead(valid_from) OVER
        |      (PARTITION BY cust_key ORDER BY valid_from, ok) AS valid_to
        |  FROM chg)
        |SELECT cust_key, priority,
        |  CAST(valid_from AS VARCHAR) AS valid_from,
        |  CAST(valid_to AS VARCHAR) AS valid_to,
        |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM h""".stripMargin,
    "sql_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        | count(*) AS n_rows
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |   AND l_shipdate < TIMESTAMP '1998-01-01'
        |   AND l_discount BETWEEN 0.05 AND 0.07
        |   AND l_quantity < 24""".stripMargin,
    "o2_window_rank" ->
      """SELECT c_custkey, c_mktsegment, c_nationkey, c_acctbal, rn, rnk, drnk FROM (
        |  SELECT c_custkey, c_mktsegment, c_nationkey, c_acctbal,
        |   row_number() OVER (PARTITION BY c_mktsegment
        |     ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
        |   rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey ASC) AS rnk,
        |   dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey ASC) AS drnk
        |  FROM customer)
        | WHERE rn <= 5""".stripMargin,
    "o3_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
        | lag(o_orderkey, 1) OVER w AS prev_order,
        | lead(o_orderkey, 1) OVER w AS next_order,
        | date_diff('second',
        |   coalesce(lag(o_orderdate, 1) OVER w, o_orderdate), o_orderdate) AS gap_seconds
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "a10_rollup" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
        | round(sum(c_acctbal), 2) AS sum_bal,
        | CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
        | CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat
        | FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)""".stripMargin,
    "a11_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice), 2) AS sum_price,
        | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        | FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "a12_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(quantile_cont(l_quantity, 0.25), 6) AS q1_qty,
        | round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        | round(quantile_cont(l_quantity, 0.75), 6) AS q3_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        | FROM lineitem GROUP BY 1""".stripMargin,
    "p8_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_O,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_F,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_P
        | FROM orders GROUP BY 1""".stripMargin,
    "p9_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        | UNION ALL
        | SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part""".stripMargin,
    "p10_zorder" -> {
      val z = graft.functions.ZOrderUtil.duckInterleave16("ca", "cb")
      s"""WITH ext AS (
        |  SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx,
        |         min(l_suppkey) AS smn, max(l_suppkey) AS smx
        |  FROM lineitem),
        |g AS (
        |  SELECT l_partkey, l_suppkey,
        |    floor((l_partkey - pmn) / greatest((pmx - pmn)::DOUBLE, 1.0)
        |          * $ZGridCells.0)::BIGINT AS ca,
        |    floor((l_suppkey - smn) / greatest((smx - smn)::DOUBLE, 1.0)
        |          * $ZGridCells.0)::BIGINT AS cb
        |  FROM lineitem, ext)
        |SELECT ($z >> $ZCellShift) AS zcell, count(*) AS n_rows,
        | min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
        | min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
        | FROM g GROUP BY 1""".stripMargin
    },
    "h3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        | FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | WHERE c_mktsegment = 'BUILDING'
        |   AND o_orderdate < TIMESTAMP '1998-06-01'
        |   AND l_shipdate > TIMESTAMP '1998-06-01'
        | GROUP BY 1, 2, 3
        | ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "h5_nation_revenue" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'AMERICA'
        | GROUP BY 1""".stripMargin)
}
