package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        bround(expr("percentile(l_quantity, 0.25)"), 6).as("q1_qty"),
        bround(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        bround(expr("percentile(l_quantity, 0.75)"), 6).as("q3_qty"),
        bround(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))

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

  val queries: Map[String, Q] = Map(
    "u5_merge_upsert" -> u5MergeUpsert,
    "sql_tpch_q6" -> sqlTpchQ6,
    "o2_window_rank" -> o2WindowRank,
    "o3_running_total" -> o3RunningTotal,
    "a10_rollup" -> a10Rollup,
    "a11_cube" -> a11Cube,
    "a12_percentiles" -> a12Percentiles,
    "p8_pivot" -> p8Pivot,
    "p9_unpivot" -> p9Unpivot,
    "h3_shipping_priority" -> h3ShippingPriority,
    "h5_nation_revenue" -> h5NationRevenue)

  val oracle: Map[String, String] = Map(
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
