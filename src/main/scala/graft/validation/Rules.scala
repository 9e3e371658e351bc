package graft.validation

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's validation surface (SURVEY §2.10, V1–V17) as a
  * combinator library of aggregate queries returning data instead of the
  * reference's logger/error-flag side channel
  * (`src/iatlascbioportalexport/utils.py:52-58`). Each rule is one of the
  * aggregate shapes in SURVEY §2.4; rules over the same frame fuse into a
  * single aggregate pass so the report costs O(#tables) scans, not
  * O(#rules).
  */
object Rules {

  /** One named check: an aggregate expression + the predicate on its value
    * that means "pass".
    */
  final case class Rule(name: String, agg: Column, passWhenZero: Boolean = true)

  /** V5/V6-style: null count of a key column (must be 0). */
  def noNulls(c: String): Rule =
    Rule(s"no_null_$c", sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** V9/A4: full-row duplicate count (count - distinct count over cols). */
  def noKeyedDups(c: String): Rule =
    Rule(s"no_dup_$c", (count(lit(1)) - countDistinct(col(c))))

  /** V2/V8-style raw row count (reported, not pass/fail on its own). */
  def rowCount(label: String): Rule =
    Rule(s"rows_$label", count(lit(1)), passWhenZero = false)

  /** A 128-bit tuple fingerprint (two independently-salted xxhash64
    * words) that is SAFE to count distinct in place of the tuple itself:
    * equal tuples always collide, unequal tuples collide with
    * probability ~n²/2¹²⁹ (~10⁻²³ at 60M rows). Spark's hash functions
    * skip null inputs entirely — ('A', null) and (null, 'A') would fold
    * identically — so a null-position bitmap leads the hash input and
    * restores SQL DISTINCT-tuple semantics: null components group as
    * equal, tuples differing only in WHICH field is null stay distinct.
    *
    * Why: `countDistinct(struct(...))` over a mostly-unique fact-wide
    * key shuffles the full tuple bytes — on the sf10 MAF dup-variant
    * rule that is 60M wide-struct rows and the dominant cost of the
    * whole report. Counting distinct fingerprints shuffles 16 bytes per
    * row instead, with the same two-level partial-distinct plan. The
    * hash↔tuple agreement is collision-audited in RulesSpec against
    * adversarial null placements and the sf corpus.
    */
  def tupleHash128(cols: Seq[Column]): Column = {
    val bitmap = cols.zipWithIndex
      .map { case (c, i) => when(c.isNull, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    struct(
      xxhash64((bitmap +: cols): _*).as("h1"),
      xxhash64((lit("graft-tuple-salt") +: bitmap +: cols): _*).as("h2"))
  }

  /** V7: all-NA column check — non-null count of a column (pass when > 0,
    * reported as the count of MISSING values being less than rows).
    */
  def notAllNa(c: String): Rule =
    Rule(s"not_all_na_$c", count(col(c)), passWhenZero = false)

  /** Attach a rule set to a frame as `observe` metrics — ZERO-extra-pass
    * validation: the counters are computed by whatever action
    * materializes the frame (an export write, a downstream aggregate)
    * instead of a separate scan per table. `evaluate` costs one extra
    * pass per frame; this costs none — at 100 TB that is the difference
    * between validating for free and re-reading the table. Returns the
    * instrumented frame (use it IN PLACE of the original for exactly one
    * action) and the Observation; read results with [[observedReport]]
    * after the action ran. Aggregates are coalesced to 0 so an empty
    * frame yields counts, not nulls. Limitation (Spark's, by design):
    * observe metrics cannot contain distinct aggregates — dup checks
    * stay in `evaluate`.
    */
  def observed(df: DataFrame, name: String,
               rules: Seq[Rule]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "observed() needs at least one rule")
    val obs = org.apache.spark.sql.Observation(name)
    val aggs = rules.map(r => coalesce(r.agg, lit(0L)).cast("long").as(r.name))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** The (rule, value, passed) rows from an [[observed]] frame's metrics;
    * blocks until the instrumented action has completed.
    */
  def observedRows(obs: org.apache.spark.sql.Observation,
                   rules: Seq[Rule]): Seq[(String, Long, Boolean)] = {
    val m = obs.get
    rules.map { r =>
      val v = m(r.name).asInstanceOf[Long]
      (r.name, v, if (r.passWhenZero) v == 0L else v > 0L)
    }
  }

  /** [[observedRows]] as a report DataFrame. */
  def observedReport(spark: SparkSession,
                     obs: org.apache.spark.sql.Observation,
                     rules: Seq[Rule]): DataFrame = {
    import spark.implicits._
    observedRows(obs, rules).toDF("rule", "value", "passed")
  }

  /** Does this aggregate column contain a DISTINCT aggregate? Delegates
    * to the bridge: the naive Catalyst-tree check silently answered
    * false for every DSL-built `countDistinct` since the Spark 4
    * Column/ColumnNode split (the unresolved tree hides behind a leaf
    * wrapper), which made EVERY rule fuse — including multi-distinct
    * sets, the exact Expand shape this routing exists to avoid.
    */
  private def hasDistinctAgg(c: Column): Boolean =
    org.apache.spark.sql.graftbridge.Bridge.hasDistinctAggregate(c)

  /** Evaluate a set of rules over one frame, returning (rule, value,
    * passed) rows in the rules' order.
    *
    * Distinct-free rules — plus the FIRST distinct-containing rule —
    * fuse into ONE aggregate pass: Spark only plans the row-replicating
    * Expand at ≥2 distinct groups in one Aggregate (a single distinct
    * alongside plain aggregates is the two-level partial-distinct
    * shape), so one distinct always rides the fused scan for free where
    * splitting it out would pay an extra full pass of an uncached frame.
    * Each ADDITIONAL distinct rule runs as its OWN job, concurrently:
    * fusing two-plus distinct aggregates makes Spark plan an Expand that
    * replicates every input row once per distinct group — over a
    * fact-sized frame that multiplies the shuffle by the rule count
    * (measured 60M→180M rows on the sf10 MAF report, the dominant cost
    * of the whole report).
    */
  /** The pass routing [[evaluate]] uses: (fused single-scan rules,
    * rules that get their own job). One distinct rule always rides the
    * fused pass (no Expand below 2 distinct groups); only the 2nd+
    * split. Exposed for the RulesSpec routing lock.
    */
  private[validation] def splitForEvaluation(rules: Seq[Rule]): (Seq[Rule], Seq[Rule]) = {
    val (distinctAll, plainRules) = rules.partition(r => hasDistinctAgg(r.agg))
    (plainRules ++ distinctAll.take(1), distinctAll.drop(1))
  }

  def evaluate(spark: SparkSession, df: DataFrame, rules: Seq[Rule]): DataFrame = {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.groupBy(_.name).filter(_._2.size > 1).keys.mkString(", ")}")
    val (fused, distinctRules) = splitForEvaluation(rules)
    val plainF: Future[Map[String, Long]] =
      if (fused.isEmpty) Future.successful(Map.empty)
      else Future {
        val row = df.agg(fused.head.agg.as(fused.head.name),
          fused.tail.map(r => r.agg.as(r.name)): _*).head()
        fused.zipWithIndex.map { case (r, i) => r.name -> row.getLong(i) }.toMap
      }
    val distinctF = distinctRules.map(r =>
      r.name -> Future(df.agg(r.agg.as(r.name)).head().getLong(0)))
    val vals = Await.result(plainF, Duration.Inf) ++
      distinctF.map { case (n, f) => n -> Await.result(f, Duration.Inf) }
    rules.map { r =>
      val v = vals(r.name)
      (r.name, v, if (r.passWhenZero) v == 0L else v > 0L)
    }.toDF("rule", "value", "passed")
  }

  /** V10/V12/A9: distinct-set equality between two key columns, both
    * directions (reference `maf.py:241-247`, `validate.py:152-157`).
    */
  def setEquality(spark: SparkSession, name: String,
                  a: DataFrame, aKey: String, b: DataFrame, bKey: String): DataFrame = {
    import spark.implicits._
    // Both directions in ONE job: tag sides, one shuffle on the key, then
    // count keys seen on only one side. Equivalent to two `except`s (nulls
    // group like values, matching EXCEPT's null-safe semantics) at half
    // the shuffles — the shape that matters when the fact side is 100 TB.
    val merged = a.select(col(aKey).as("k"), lit(1).as("side"))
      .unionByName(b.select(col(bKey).as("k"), lit(2).as("side")))
      .groupBy(col("k"))
      .agg(max(when(col("side") === 1, 1).otherwise(0)).as("in_a"),
        max(when(col("side") === 2, 1).otherwise(0)).as("in_b"))
    val row = merged.agg(
      sum(when(col("in_a") === 1 && col("in_b") === 0, 1L).otherwise(0L)),
      sum(when(col("in_b") === 1 && col("in_a") === 0, 1L).otherwise(0L))).head()
    val (aNotB, bNotA) = (row.getLong(0), row.getLong(1))
    Seq((s"${name}_a_minus_b", aNotB, aNotB == 0L),
      (s"${name}_b_minus_a", bNotA, bNotA == 0L))
      .toDF("rule", "value", "passed")
  }

  /** V16: no row growth after a left-side-preserving join (reference
    * `clinical.py:283-287`).
    */
  def noRowGrowth(spark: SparkSession, name: String,
                  before: Long, after: Long): DataFrame = {
    import spark.implicits._
    Seq((name, after - before, after <= before)).toDF("rule", "value", "passed")
  }

  /** The standard report over the test corpus — the `v_report` query.
    * Mirrors the reference's clinical/MAF check set on the analogous
    * tables: orders = "samples" table, lineitem = "MAF" fact table.
    */
  def standardReport(spark: SparkSession, dir: String): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val orders = graft.Tables.orders(spark, dir)
    val lineitem = graft.Tables.lineitem(spark, dir)
    // The three rule groups are independent Spark jobs over different
    // frames — submit them concurrently (the scheduler interleaves their
    // stages across executor slots) instead of serializing driver actions.
    val ordersRules = Future(evaluate(spark, orders, Seq(
      rowCount("orders"),
      noNulls("o_orderkey"),
      noNulls("o_custkey"),
      noKeyedDups("o_orderkey"),
      notAllNa("o_orderstatus"))))
    val lineitemRules = Future(evaluate(spark, lineitem, Seq(
      rowCount("lineitem"),
      noNulls("l_orderkey"),
      notAllNa("l_quantity"))))
    val sets = Future(setEquality(spark, "orderkeys",
      orders, "o_orderkey", lineitem, "l_orderkey"))
    Await.result(ordersRules, Duration.Inf)
      .unionByName(Await.result(lineitemRules, Duration.Inf))
      .unionByName(Await.result(sets, Duration.Inf))
  }

  /** DuckDB oracle for [[standardReport]] — same numbers via UNION ALL. */
  val standardReportOracle: String =
    """SELECT 'rows_orders' AS rule, count(*) AS value, count(*) > 0 AS passed FROM orders
      |UNION ALL SELECT 'no_null_o_orderkey', CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
      |UNION ALL SELECT 'no_null_o_custkey', CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
      |UNION ALL SELECT 'no_dup_o_orderkey', count(*) - count(DISTINCT o_orderkey), count(*) - count(DISTINCT o_orderkey) = 0 FROM orders
      |UNION ALL SELECT 'not_all_na_o_orderstatus', count(o_orderstatus), count(o_orderstatus) > 0 FROM orders
      |UNION ALL SELECT 'rows_lineitem', count(*), count(*) > 0 FROM lineitem
      |UNION ALL SELECT 'no_null_l_orderkey', CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0 FROM lineitem
      |UNION ALL SELECT 'not_all_na_l_quantity', count(l_quantity), count(l_quantity) > 0 FROM lineitem
      |UNION ALL SELECT 'orderkeys_a_minus_b', (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders EXCEPT SELECT DISTINCT l_orderkey FROM lineitem)), (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders EXCEPT SELECT DISTINCT l_orderkey FROM lineitem)) = 0
      |UNION ALL SELECT 'orderkeys_b_minus_a', (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem EXCEPT SELECT DISTINCT o_orderkey FROM orders)), (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem EXCEPT SELECT DISTINCT o_orderkey FROM orders)) = 0""".stripMargin
}
