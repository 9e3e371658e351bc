package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** PageRank semantics: the distributed integer fixed-point iteration must
  * match an independent sequential Scala reference exactly (the whole
  * point of the integer design is reduction-order independence), and the
  * trade-graph face must obey structural invariants.
  */
class GraphQueriesSpec extends AnyFunSuite {
  import spark.implicits._

  /** Sequential reference: same recurrence, same integer ops. */
  private def refPagerank(edges: Seq[(String, String)]): Map[String, Long] = {
    import GraphQueries._
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = out.keySet
    val n = nodes.size.toLong
    val teleport = (PrTotalPpb - PrDampNum * PrTotalPpb / PrDampDen) / n
    var rank = nodes.map(_ -> PrTotalPpb / n).toMap
    for (_ <- 1 to PrIters) {
      val inbound = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / out(src) }.sum
      }
      rank = nodes.map(v => v -> (teleport + PrDampNum * inbound.getOrElse(v, 0L) / PrDampDen)).toMap
    }
    rank
  }

  // a small asymmetric digraph, every node with outdegree >= 1
  private val handEdges = Seq(
    "a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a",
    "d" -> "c", "d" -> "a", "c" -> "d")

  test("integer pagerank matches the sequential reference bit-for-bit") {
    val e = handEdges.toDF("src", "dst")
    val deg = e.groupBy($"src").count()
      .select($"src".as("node"), $"count".as("outdeg"))
    val got = GraphQueries.pagerank(e, deg, 4L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refPagerank(handEdges))
  }

  test("higher in-degree hub outranks leaves, ranks are positive") {
    // star: 5 leaves all pointing at hub h, h points back at l0
    val star = (0 until 5).map(i => s"l$i" -> "h") :+ ("h" -> "l0")
    val e = star.toDF("src", "dst")
    val deg = e.groupBy($"src").count()
      .select($"src".as("node"), $"count".as("outdeg"))
    val got = GraphQueries.pagerank(e, deg, 6L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("h") > got("l1"), "the hub must outrank a plain leaf")
    assert(got.values.forall(_ > 0L))
    assert(got == refPagerank(star))
  }

  test("g_jaccard_sim matches a driver-side set recomputation exactly") {
    import org.apache.spark.sql.functions.col
    import graft.SparkTestBase.sf001
    val li = graft.Tables.lineitem(spark, sf001).select("l_orderkey", "l_suppkey")
    val ord = graft.Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs: Map[Long, Set[Long]] =
      edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val expect = nbrs.keys.filter(_ < GraphQueries.JaccPilot).flatMap { s1 =>
      nbrs.keys.filter(_ != s1).flatMap { s2 =>
        val c = nbrs(s1).intersect(nbrs(s2)).size.toLong
        if (c == 0) None
        else Some((s1, s2, c,
          1000000L * c / (nbrs(s1).size + nbrs(s2).size - c)))
      }.toSeq
        .sortBy { case (_, s2, _, jm) => (-jm, s2) }
        .take(GraphQueries.JaccTopK)
        .zipWithIndex.map { case ((a, b, c, jm), i) => (s"S$a", s"S$b", c, jm, i + 1) }
    }.toSet
    val got = GraphQueries.gJaccardSim(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("g_khop distances equal a driver-side BFS over the trade graph") {
    import graft.SparkTestBase.sf001
    val edges = GraphQueries.tradeEdges(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val seeds = adj.keySet.filter(n =>
      n.startsWith("S") && n.drop(1).toLong < GraphQueries.KhopSeedMax)
    assert(seeds.nonEmpty, "seed cohort present in the sf0.001 graph")
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (i <- 1 to GraphQueries.KhopRounds) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> i)
      frontier = next
    }
    val got = GraphQueries.gKhop(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == dist)
    assert(got.values.exists(_ > 0), "BFS reached beyond the seeds")
  }

  test("g_random_walk follows the argmin-hash neighbor at every step") {
    import graft.SparkTestBase.sf001
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.SketchOps
    val edges = GraphQueries.tradeEdges(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2) }
    val seeds = adj.keySet.filter(n =>
      n.startsWith("S") && n.drop(1).toLong < GraphQueries.KhopSeedMax)
    def h(k: Int, start: String, dst: String): Long =
      SketchOps.md5Long60(SketchOps.seedPrefix(k), UTF8String.fromString(s"$start:$dst"))
    val expect = seeds.flatMap { s0 =>
      var cur = s0
      (s0, 0, s0) +: (1 to GraphQueries.WalkSteps).map { k =>
        cur = adj(cur).minBy(v => (h(k, s0, v), v))
        (s0, k, cur)
      }
    }
    val got = GraphQueries.gRandomWalk(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == expect.toSet)
    assert(got.size == seeds.size * (GraphQueries.WalkSteps + 1))
  }

  test("trade-graph face: symmetric edges, mass ~conserved, one row per node") {
    import graft.SparkTestBase.sf001
    val pr = GraphQueries.gPagerank(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val edges = GraphQueries.tradeEdges(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nodes = edges.map(_._1).toSet
    assert(pr.keySet == nodes, "one rank per node with an edge")
    assert(edges.toSet.map((p: (String, String)) => (p._2, p._1)) == edges.toSet,
      "symmetrized edge set")
    // integer floors only LOSE mass: total in (0.9, 1.0] of 1e9 ppb
    val total = pr.values.sum
    assert(total <= GraphQueries.PrTotalPpb)
    assert(total > GraphQueries.PrTotalPpb * 9 / 10,
      s"flooring should lose <10% of rank mass, kept $total")
  }

  test("triangle counts: K4 + pendant — every K4 node in C(3,2)=3 triangles") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = GraphQueries.triangleCounts(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // node 5 closes no triangle => absent from the census entirely
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("degree-oriented triangle count == brute force on a hash-generated graph") {
    def h64(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    // ~1/4 edge density over 36 nodes, includes hubs and isolated nodes
    val edges = (for {
      a <- 0L until 36L; b <- (a + 1) until 36L
      if math.floorMod(h64(s"tri:$a:$b"), 4L) == 0L
    } yield (a, b)).toSeq
    val es = edges.toSet
    val brute = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- 0L until 36L; b <- (a + 1) until 36L; c <- (b + 1) until 36L
      if es((a, b)) && es((b, c)) && es((a, c))
    } Seq(a, b, c).foreach(n => brute(n) += 1L)
    val got = GraphQueries.triangleCounts(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == brute.toMap)
    assert(got.nonEmpty, "the generated graph must actually contain triangles")
  }

  test("clustering coefficient: K4 nodes are 10^6-cliquey, pendant-degree excluded") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = GraphQueries.clusteringOf(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // nodes 1..3: deg 3 inside K4, all C(3,2)=3 wedges closed => exactly 1.0
    Seq(1L, 2L, 3L).foreach(n => assert(got(n) == ((3L, 3L, 1000000L))))
    // node 4: the pendant opens its neighborhood: 2*3e6/(4*3) = 500000
    assert(got(4L) == ((4L, 3L, 500000L)))
    // node 5 has degree 1: no defined coefficient, excluded
    assert(!got.contains(5L))
  }

  test("g_triangles on the corpus == brute force over the MUTUAL top-T near-dup graph") {
    import graft.SparkTestBase.sf001
    // Independent driver-side re-derivation of the mutual top-T rule
    // from the raw candidate pairs (also re-verifies mutualTopT itself).
    val raw = DedupQueries.ddSimhashPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val sym = raw.flatMap { case (a, b, h) => Seq((a, b, h), (b, a, h)) }
    val sel: Set[(Long, Long)] = sym.groupBy(_._1).iterator.flatMap {
      case (src, out) =>
        out.sortBy(e => (e._3, e._2)).take(GraphQueries.TriDeg)
          .map(e => (src, e._2))
    }.toSet
    val pairs = sel.filter { case (a, b) => a < b && sel((b, a)) }.toArray
    val es = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val brute = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } Seq(a, b, c).foreach(n => brute(n) += 1L)
    val got = GraphQueries.gTriangles(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == brute.toMap)
  }

  test("g_concomp == driver union-find over the strong trade graph; labels are component minima") {
    import graft.SparkTestBase.sf001
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val li = graft.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val ord = graft.Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("l_suppkey") * 2).as("a"), (col("o_custkey") * 2 + 1).as("b"))
      .agg(fsum(col("l_quantity")).as("q"))
      .filter(col("q") >= GraphQueries.CcQtyMin)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    val got = GraphQueries.gConcomp(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // every component label is its own minimum member
    val byComp = got.groupBy(_._2)
    byComp.foreach { case (c, m) => assert(m.keys.min == c) }
  }

  test("g_sssp equals a sequential Bellman-Ford unrolled the same number of rounds") {
    import graft.SparkTestBase.sf001
    import org.apache.spark.sql.functions.col
    val li = graft.Tables.lineitem(spark, sf001).select("l_orderkey", "l_suppkey")
    val ord = graft.Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
    val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"), col("o_custkey"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => (s"S${r.getLong(0)}", s"C${r.getLong(1)}", math.max(1L, 10L - r.getLong(2))))
    val edges = raw.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    var dist: Map[String, Long] = edges.map(_._1).distinct
      .filter(n => n.startsWith("S") && n.drop(1).toLong < GraphQueries.KhopSeedMax)
      .map(_ -> 0L).toMap
    for (_ <- 1 to GraphQueries.SsspRounds) {
      val relaxed = edges.flatMap { case (s0, d0, w) =>
        dist.get(s0).map(x => d0 -> (x + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).min }
    }
    val got = GraphQueries.gSssp(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == dist)
    // seeds stay at 0; a weighted distance is never below the hop count
    assert(got.filter(_._1.drop(1).toLong < GraphQueries.KhopSeedMax)
      .filter(_._1.startsWith("S")).values.forall(_ == 0L))
  }

  test("connectedComponents keeps nodes that only ever appear as surviving roots") {
    // 1-2, 1-3: node 1 is always the surviving (min) root; before the
    // round-8 fix the driver union-find path dropped it from the output
    // while the distributed path kept it.
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val small = DedupQueries.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // same edges through the distributed path (maxDriverEdges = 0)
    val dist = DedupQueries.connectedComponents(pairs, "doc_a", "doc_b", maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == small)
  }
}
