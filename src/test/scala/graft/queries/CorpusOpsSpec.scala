package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}

/** Semantics of the round-8 corpus operators: exact repeated-substring
  * span detection (dd_substring), distributed Lloyd k-means
  * (sim_kmeans), the domain-mixture table (td_domain_mix), and the
  * per-source KL drift monitor (ta_kl_drift). The DuckDB oracles pin
  * engine parity; these pin the SEMANTICS on constructed fixtures and
  * driver-side recomputations.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import spark.implicits._

  // ---- dd_substring ---------------------------------------------------

  private def spans(rows: (Long, String)*) =
    DedupQueries.substringSpans(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))

  test("dd_substring reports the shared run in both documents, at its offsets") {
    // 6 shared words => two 5-grams => one span of 2 grams per doc
    val shared = "alpha beta gamma delta epsilon zeta"
    val got = spans(
      1L -> s"$shared unique1 unique2",
      2L -> s"pre1 pre2 $shared post1",
      3L -> "totally fresh words with no duplicated run at all")
    assert(got === Seq((1L, 0L, 6L, 2L), (2L, 2L, 8L, 2L)))
  }

  test("dd_substring merges gram hits within SubGram words into one maximal span") {
    // doc 10 = P1 ++ P2 back to back: dup grams at pos 0 and 5, gap == SubGram
    // => single island [0, 10); docs 11/12 carry one phrase each.
    val p1 = "one two three four five"
    val p2 = "six seven eight nine ten"
    val got = spans(
      10L -> s"$p1 $p2",
      11L -> s"$p1 tail11 tail12 tail13",
      12L -> s"head12a head12b $p2")
    assert(got.filter(_._1 == 10L) === Seq((10L, 0L, 10L, 2L)))
    assert(got.filter(_._1 == 11L) === Seq((11L, 0L, 5L, 1L)))
    assert(got.filter(_._1 == 12L) === Seq((12L, 2L, 7L, 1L)))
  }

  test("dd_substring spans on the corpus are disjoint, ordered, and >= SubGram wide") {
    val rows = DedupQueries.ddSubstring(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, a, b, n) =>
        assert(b - a >= DedupQueries.SubGram)
        assert(n >= 1 && n <= b - a - DedupQueries.SubGram + 1)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // maximality: islands merge when consecutive gram starts are
          // within SubGram, so the next span's first gram (s2) must sit
          // beyond the previous island's last gram start (e1 - SubGram)
          // by more than SubGram — i.e. strictly past e1
          assert(s2 > e1)
        case _ => ()
      }
    }
  }

  // ---- sim_kmeans -----------------------------------------------------

  test("sim_kmeans assignment equals a driver-side argmin over the final centroids") {
    val v = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    val init = v.filter(col("vec_id") < SimQueries.KmK)
      .collect().toSeq
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble)))
      .sortBy(_._1)
    val cents = (1 until SimQueries.KmRounds)
      .foldLeft(init)((c, _) => SimQueries.kmUpdate(v, c))

    val got = SimQueries.simKmeans(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    val vecs = v.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    vecs.foreach { case (id, e) =>
      val best = cents.map { case (cid, c) =>
        val d = e.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        (d, cid)
      }.minBy(identity) // smallest distance, ties to smallest cid
      assert(got(id) === best._2, s"vec $id")
    }
  }

  test("sim_kmeans is deterministic across invocations") {
    val a = SimQueries.simKmeans(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = SimQueries.simKmeans(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  // ---- td_domain_mix --------------------------------------------------

  test("td_domain_mix weights normalize and compress the token-share spread") {
    val rows = TextQueries.tdDomainMix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // monotone: more tokens => no smaller weight; and α<1 flattens the spread
    val byTokens = rows.sortBy(_._2)
    byTokens.sliding(2).foreach {
      case Array((_, t1, _, w1), (_, t2, _, w2)) =>
        if (t1 < t2) assert(w1 <= w2 + 1e-9)
      case _ => ()
    }
    val pMax = rows.map(_._3).max; val pMin = rows.map(_._3).min
    val wMax = rows.map(_._4).max; val wMin = rows.map(_._4).min
    if (pMin > 0 && wMin > 0) assert(wMax / wMin <= pMax / pMin + 1e-6)
  }

  // ---- ta_kl_drift ----------------------------------------------------

  test("ta_kl_drift: KL is non-negative and per-source token totals cover the corpus") {
    val rows = TextQueries.taKlDrift(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kl) =>
      assert(kl >= -1e-6, s"KL($src) = $kl")
      assert(n > 0)
    }
    val totalToks = graft.Tables.documents(spark, sf001)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .count()
    assert(rows.map(_._2).sum === totalToks)
  }
}
