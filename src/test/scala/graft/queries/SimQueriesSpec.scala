package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}

/** Recall characteristics of the approximate ANN paths against the
  * exact brute-force ranking — the measured counterpart of each
  * docstring's recall claim, on the same fixed corpus the oracles pin.
  *
  * Measured at sf0.001 (10 queries, k=3): IVF nprobe=1 mean recall
  * 0.73 (coarse-cell loss only); composed IVF-PQ 0.20 — the
  * deterministic stand-in codebook (16 codewords = the first 16
  * vectors, no k-means) bounds ADC precision, exactly the "recall set
  * by codebook quality" trade the sim_ivfpq_topk docstring names. The
  * floors below are set under those measurements to catch structural
  * regressions (a broken join, a scrambled tie break), not to certify
  * index quality; a production deployment trains the codebook.
  */
class SimQueriesSpec extends AnyFunSuite {

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] =
    df.filter(col("rank") <= k).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private lazy val exact = topk(SimQueries.simTopkBrute(spark, sf001), 3)

  test("IVF nprobe=1 mean recall@3 >= 0.6 vs brute force") {
    val ivf = topk(SimQueries.simIvfTopk(spark, sf001), 3)
    val recalls = exact.keys.toSeq.sorted
      .map(q => ivf.getOrElse(q, Set.empty).intersect(exact(q)).size / 3.0)
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@3: $mean%.3f")
    assert(mean >= 0.6, f"IVF recall regressed: $mean%.3f")
  }

  test("IVF-PQ neighbors all come from the query's coarse cell") {
    // the structural half of the composition: PQ may re-rank, but it
    // must never surface a candidate IVF pruning excluded
    val cell = SimQueries.simIvfAssign(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val bad = SimQueries.simIvfpqTopk(spark, sf001).collect()
      .filter(r => cell(r.getLong(0)) != cell(r.getLong(1)))
    assert(bad.isEmpty,
      s"cross-cell neighbors leaked: ${bad.map(r => (r.getLong(0), r.getLong(1))).toSeq}")
  }

  test("IVF-PQ mean recall@3 >= 0.15 with the untrained stand-in codebook") {
    val ivfpq = topk(SimQueries.simIvfpqTopk(spark, sf001), 3)
    val recalls = exact.keys.toSeq.sorted
      .map(q => ivfpq.getOrElse(q, Set.empty).intersect(exact(q)).size / 3.0)
    val mean = recalls.sum / recalls.size
    info(f"IVF-PQ mean recall@3: $mean%.3f (measured 0.200 at spec-writing)")
    assert(mean >= 0.15, f"IVF-PQ recall regressed: $mean%.3f")
  }

  test("kNN graph: neighbors rank in true-cosine order and come from the corpus") {
    val emb = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val rows = SimQueries.simKnnGraph(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, ns) =>
      // structural: contiguous ranks from 1, at most k, no self-loops
      assert(ns.length <= SimQueries.LshTopK, s"src=$src")
      assert(ns.map(_._3).sorted.toSeq == (1 to ns.length).toSeq, s"src=$src")
      assert(ns.forall(_._2 != src), s"self-loop at $src")
      // semantic: rank order == descending true cosine (dst tie-break)
      val byRank = ns.sortBy(_._3).map(n => (cos(emb(src), emb(n._2)), n._2))
      val resorted = byRank.sortBy { case (c, d) => (-c, d) }
      assert(byRank.toSeq == resorted.toSeq, s"rank order broken at $src")
    }
    // the graph should cover most of the corpus (isolated bucket
    // singletons are the only legitimate absences)
    assert(rows.map(_._1).distinct.length >= emb.size * 8 / 10,
      "kNN graph lost more than 20% of vectors to empty buckets")
  }
}
