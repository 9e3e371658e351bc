package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** Cluster-resolution semantics: the driver union-find fast path and the
  * distributed min-label-propagation path must agree — same components,
  * min-id labels — on graphs with chains, triangles, merged components,
  * and isolated vertices.
  */
class DedupQueriesSpec extends AnyFunSuite {
  import spark.implicits._

  // chain 1-2-3-4, triangle 10-11-12, late merge 3-10, pair 20-21
  private val edges = Seq(
    (2L, 1L), (2L, 3L), (3L, 4L),
    (10L, 11L), (11L, 12L), (12L, 10L),
    (3L, 10L),
    (20L, 21L)).toDF("doc_a", "doc_b")

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 1L, 11L -> 1L, 12L -> 1L, // merged into the chain's component
    20L -> 20L, 21L -> 20L)

  test("union-find fast path labels components by min id") {
    val got = DedupQueries.connectedComponents(edges, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // roots may be absent (callers coalesce to self); fill them in
    val full = expected.keys.map(k => k -> got.getOrElse(k, k)).toMap
    assert(full == expected)
  }

  test("distributed propagation path (forced) agrees with the fast path") {
    val got = DedupQueries.connectedComponents(edges, "doc_a", "doc_b",
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = expected.keys.map(k => k -> got.getOrElse(k, k)).toMap
    assert(full == expected)
  }

  test("dd_para_dedup: each distinct paragraph survives exactly once, in order") {
    import graft.SparkTestBase.sf001
    val out = DedupQueries.ddParaDedup(spark, sf001).collect()
    assert(out.nonEmpty)
    // global invariant: total kept paragraphs == distinct paragraphs
    val docs = graft.Tables.documents(spark, sf001)
    val distinctParas = docs
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("""explode(transform(sequence(0, cast(ceil(size(ws)/10.0) as int)-1),
                     g -> array_join(slice(ws, g*10+1, 10), ' '))) AS para""")
      .distinct().count()
    assert(out.map(_.getAs[Long]("n_keep")).sum == distinctParas)
    // a doc whose paragraphs are all globally-first keeps its text verbatim
    val original = docs.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val intact = out.filter { r =>
      original(r.getAs[Long]("doc_id")) == r.getAs[String]("text")
    }
    assert(intact.nonEmpty, "some documents must survive unmodified")
    // and every reassembled text is a subsequence of the original's chunks
    out.take(50).foreach { r =>
      val orig = original(r.getAs[Long]("doc_id"))
      r.getAs[String]("text").split(' ').foreach(w =>
        assert(orig.contains(w), "reassembly must not invent tokens"))
    }
  }

  test("distributed path converges on a chain with diameter > 30") {
    // chain 0-1-2-...-40: plain min-label propagation needs ~40 rounds —
    // the old fixed 30-round cap silently split this into two clusters;
    // pointer jumping closes it in O(log n) rounds instead.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = DedupQueries.connectedComponents(chain, "doc_a", "doc_b",
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L), s"chain must be ONE component, got ${got.values.toSet}")
    assert(got.keySet == (0L to 40L).toSet)
  }
}
