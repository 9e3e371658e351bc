package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** SpaceSaving guarantees asserted against exact counts — the sketch is
  * merge-order dependent, so the LAW is tested, not run-to-run equality:
  * every item above the n/capacity threshold is reported, and every
  * reported estimate brackets the true count (est − err ≤ true ≤ est).
  */
class SpaceSavingAggSpec extends AnyFunSuite {
  import spark.implicits._

  private def reported(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.collect().map(r => (r.getAs[String]("item"),
      r.getAs[Long]("est"), r.getAs[Long]("err"))).toSeq

  test("skewed stream across 8 partitions: heavy items surface with valid bounds") {
    val k = 16
    val rows = Seq.fill(1000)("hot") ++ Seq.fill(100)("warm") ++
      (0 until 500).map(i => s"tail_$i")
    val df = rows.toDF("tok").repartition(8)
    val exact = rows.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = rows.size.toLong
    val out = reported(df.agg(SpaceSavingAgg.spaceSaving(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"), col("e.err").as("err")))
    assert(out.size == k)
    val byItem = out.map(t => t._1 -> t).toMap
    // heavy-hitter recall: anything above n/k must be present
    exact.filter(_._2 > n / k).keys.foreach(t =>
      assert(byItem.contains(t), s"$t above n/k but not reported"))
    // bounds: est - err <= true <= est for every reported item
    out.foreach { case (item, est, err) =>
      val t = exact.getOrElse(item, 0L)
      assert(est >= t, s"$item est=$est < true=$t")
      assert(est - err <= t, s"$item est-err=${est - err} > true=$t")
    }
    // the two genuinely heavy items rank first, exactly counted
    assert(out.head._1 == "hot" && byItem("hot")._2 - byItem("hot")._3 <= 1000L)
    assert(byItem.contains("warm"))
  }

  test("spaceSavingText == spaceSaving over exploded tokens " +
    "(single partition: identical offer order => identical sketch)") {
    // in one partition + one group the update order is row/token order,
    // so the two forms must produce the SAME sketch bit-for-bit — this
    // pins the in-aggregate tokenizer to the wsSplit scanner
    val docs = Seq("the cat sat on the mat", "THE Dog", "", "   ",
      "tail one  two\tthe\nthe", "unicode καλά καλά x")
      .toDF("text").coalesce(1)
    val k = 4
    def run(df: org.apache.spark.sql.DataFrame) = reported(
      df.select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.est").as("est"),
          col("e.err").as("err")))
    val viaText = run(docs.agg(
      SpaceSavingAgg.spaceSavingText(lower(trim(col("text"))), k).as("hh")))
    val viaToks = run(docs
      .select(explode(TextExprs.wsSplit(lower(trim(col("text"))))).as("tok"))
      .agg(SpaceSavingAgg.spaceSaving(col("tok"), k).as("hh")))
    assert(viaText == viaToks)
    assert(viaText.nonEmpty)
  }

  test("ta_heavy_hitters: per-source guarantees hold on the real corpus") {
    import graft.SparkTestBase.sf001
    val toks = graft.Tables.documents(spark, sf001)
      .select(col("source"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0)).as("tok"))
    val exact = toks.groupBy("source", "tok").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = exact.groupMapReduce(_._1._1)(_._2)(_ + _)
    val out = graft.queries.TextQueries.taHeavyHitters(spark, sf001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("item"),
        r.getAs[Long]("est"), r.getAs[Long]("err")))
    assert(out.nonEmpty)
    val bySource = out.groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      val items = rows.map(_._2).toSet
      exact.collect { case ((s, t), c) if s == src && c > totals(src) / 16 => t }
        .foreach(t => assert(items.contains(t), s"$src/$t above n/k but missing"))
      rows.foreach { case (_, item, est, err) =>
        val t = exact.getOrElse((src, item), 0L)
        assert(est >= t && est - err <= t, s"$src/$item est=$est err=$err true=$t")
      }
    }
  }
}
