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

  test("saltedJoin shuffles on (key, salt) and every expression is retry-deterministic") {
    val big = (1 to 400).map(i => (if (i % 3 == 0) 1L else i.toLong, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (7L, "cold"), (8L, "x")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, small, Seq("k"), factor = 8)
    // a rand()-salted join recomputes DIFFERENT salts on task retry and
    // rows migrate between reducers mid-shuffle; the hash salt is a pure
    // function of the row, so the whole plan must be deterministic
    assert(out.queryExecution.analyzed.expressions.forall(_.deterministic),
      "salted join must contain no nondeterministic expression")
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    assert("""hashpartitioning\([^)]*__salt""".r.findFirstIn(plan).isDefined,
      s"shuffle must key on (join keys, __salt):\n${plan.take(800)}")
  }

  test("saltedJoin actually spreads the hot key: max partition share ~ 1/factor") {
    // AQE's OptimizeSkewedJoin is the runtime alternative to explicit
    // salting, but it only splits MAP OUTPUT chunks above
    // skewedPartitionThresholdInBytes (256 MB default) — a hot KEY below
    // that threshold, or a non-splittable aggregation downstream, still
    // lands on one reducer. Salting moves the spread into the shuffle
    // key itself. AQE is disabled here so the measurement sees the raw
    // reducer layout, not post-hoc coalescing of the small test data.
    val factor = 8
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // enough reducers that the factor salt buckets rarely collide on a
    // partition id (the test session default of 4 would re-funnel them)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val big = (1 to 4000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
        .toDF("k", "payload") // key 1 carries ~50% of the fact side
      val small = Seq((1L, "hot"), (7L, "cold")).toDF("k", "name")

      def hotShare(df: org.apache.spark.sql.DataFrame): (Int, Double) = {
        val counts = df.filter(col("k") === 1L)
          .groupBy(spark_partition_id().as("pid"))
          .count().as[(Int, Long)].collect().map(_._2)
        (counts.length, counts.max.toDouble / counts.sum)
      }

      // baseline: the plain shuffled join funnels the hot key into ONE reducer
      val plain = big.join(small.hint("shuffle_hash"), Seq("k"))
      val (plainParts, plainShare) = hotShare(plain)
      assert(plainParts == 1 && plainShare == 1.0,
        s"unsalted hot key must land on one reducer, got $plainParts parts")

      // salted: the hot key fans out over ~factor reducers, none holding
      // much more than the fair 1/factor share (hash collisions between
      // salt buckets and the 32 shuffle partitions allow a little slack)
      val salted = SkewJoin.saltedJoin(big, small, Seq("k"), factor)
      val (saltParts, saltShare) = hotShare(salted)
      assert(saltParts >= factor - 2,
        s"hot key must spread over ~$factor reducers, got $saltParts")
      assert(saltShare <= 2.0 / factor,
        f"max partition share $saltShare%.3f exceeds 2/factor = ${2.0 / factor}%.3f")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  // ---- AQE interplay -------------------------------------------------
  // Manual skew remedies (salting; pinned partitioning) must COMPOSE with
  // AQE, not fight it: salting pre-spreads the hot key so AQE's skew-join
  // split finds nothing left to split, and the (key, salt) shuffle key
  // must survive adaptive re-planning. These cases run the same shapes
  // with AQE fully on (skew-join forced) and fully off and require
  // identical results + the salt still in the shuffle key.

  private def withConfs(pairs: (String, String)*)(f: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew-join forced vs AQE off: salted join results identical, salt kept") {
    import graft.SparkTestBase.sf01
    def run(): Array[(String, Long, Long)] =
      graft.queries.OlapQueries.j11SkewSalted(spark, sf01)
        .as[(String, Long, Long)].collect().sortBy(_._1)
    var aqeOff: Array[(String, Long, Long)] = null
    withConfs("spark.sql.adaptive.enabled" -> "false") { aqeOff = run() }
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      // assert on the Dataset that was ACTUALLY executed: .as[...] makes
      // a new QueryExecution, and an un-executed AdaptiveSparkPlanExec
      // prints its initial plan — which would contain __salt trivially
      val ds = graft.queries.OlapQueries.j11SkewSalted(spark, sf01)
        .as[(String, Long, Long)]
      val aqeOn = ds.collect().sortBy(_._1)
      assert(aqeOn.sameElements(aqeOff), "AQE skew-join changed salted-join results")
      val executed = ds.queryExecution.executedPlan.toString
      assert(executed.contains("isFinalPlan=true"),
        s"expected a finalized adaptive plan:\n$executed")
      assert(executed.contains("__salt"),
        s"adaptive re-plan dropped the salt from the shuffle key:\n$executed")
    }
  }

  test("AQE partition coalescing vs off: pinned-partitioning verify stage identical") {
    import graft.SparkTestBase.sf001
    def run(): Seq[String] =
      graft.queries.DedupQueries.ddLevPairs(spark, sf001)
        .collect().map(_.mkString("|")).sorted.toSeq
    var off: Seq[String] = Nil
    withConfs("spark.sql.adaptive.enabled" -> "false") { off = run() }
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true") {
      assert(run() == off, "AQE coalescing changed dd_lev_pairs results")
    }
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
    // structural single-exchange: the result is a computed RDD (both
    // passes ran over ONE shared shuffle lineage), not a plan with two
    // independently-sampled range exchanges ReuseExchange must collapse
    val out = PrefixSum.withRunningSum(df, "id", "w", "cum", numPartitions = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"prefix sum must materialize over one shared RDD lineage:\n${plan.take(600)}")
  }

  test("PrefixSum: correct with extra columns beyond order/weight (pruning hazard)") {
    // The windowed predecessor was only correct if Catalyst's
    // ReuseExchange collapsed both range shuffles; extra columns let
    // column pruning specialize one branch and defeat reuse. The RDD
    // form must be immune: same answer regardless of payload columns.
    val rows = Seq(9L, 2L, 14L, 5L, 1L, 30L, 7L, 11L)
      .map(id => (id, id % 5, s"payload-$id", id * 2.5))
    val df = rows.toDF("id", "w", "tag", "extra")
    val got = PrefixSum.withRunningSum(df, "id", "w", "cum", numPartitions = 3)
      .select($"id", $"tag", $"cum").as[(Long, String, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    var acc = 0L
    val want = rows.sortBy(_._1)
      .map { case (id, w, tag, _) => acc += w; id -> (tag, acc) }.toMap
    assert(got == want)
  }

  test("PrefixSum: fractional weights accumulate in Double") {
    val rows = Seq((3L, 0.5), (1L, 1.25), (2L, 2.0), (5L, 0.25))
    val got = PrefixSum.withRunningSum(rows.toDF("id", "w"), "id", "w", "cum",
        numPartitions = 2)
      .select($"id", $"cum").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.25, 2L -> 3.25, 3L -> 3.75, 5L -> 4.0))
  }
}
