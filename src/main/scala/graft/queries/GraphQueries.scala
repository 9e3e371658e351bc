package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Graph analytics over the trade graph the star schema implies —
  * supplier ↔ customer edges through orders — extension surface for the
  * corpus-curation jobs that rank sources by link authority (the
  * CommonCrawl-style "how reputable is this domain" signal a web-scale
  * training-data pipeline feeds into its quality mix).
  *
  * Scale design: PageRank is iterated sparse matrix–vector product.
  * Each round is ONE shuffle — contributions grouped by destination —
  * over an edge table that is built once, symmetrized, and cached (at
  * cluster scale: persisted partitioned by `src` so every round's
  * rank⋈edges join co-locates on the same partitioning instead of
  * re-shuffling the edges). Driver state is nothing but the node count;
  * rounds are a fixed constant, so the lineage is bounded and needs no
  * checkpoint. Rank mass is INTEGER parts-per-billion with integer
  * division throughout — Σ over longs is reduction-order-independent,
  * which is what lets a 32-way map-side-combined Spark aggregation and
  * DuckDB's sequential sum land on bit-identical ranks (a double-typed
  * PageRank differs in the last ulps between any two engines — or any
  * two RUNS — and can never hash-match an oracle).
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Power-iteration rounds (fixed — the oracle unrolls them). */
  val PrIters = 4

  /** Total rank mass: 1.0 in parts-per-billion. */
  val PrTotalPpb = 1000000000L

  /** Damping d = 0.85 as the integer pair 85/100 (never a float). */
  val PrDampNum = 85L
  val PrDampDen = 100L

  /** Byte-derived stage width for the graph family (optimization r15):
    * one task per ~1 MB of fact input, clamped to
    * [1, 4 × defaultParallelism]. The edge caches were previously
    * `repartition(col("src"))` → `spark.sql.shuffle.partitions`
    * (= the core count in the bench), so every per-round stage ran
    * `cpus` near-empty tasks on KB-sized frames — measured ANTI-scaling
    * (g_sssp 6.35 s at 32 cores vs 0.94 s at 8 in the r14 driver bench;
    * task/stage overhead, not compute). Width now follows DATA volume:
    * sf0.1 (11 MB fact) → 11 tasks, sf10 (~1.1 GB) → cores-capped —
    * and at cluster scale the cap scales with the cluster while the
    * byte term keeps partitions at the guide's sane-grain range.
    */
  private[queries] def graphWidth(s: SparkSession, dir: String): Int = {
    val bytes = graft.Tables.fileBytes(dir, "lineitem")
    val cap = 4 * s.sparkContext.defaultParallelism
    // floor 2, not 1: repartition(1, col) collapses to SinglePartition,
    // which EnsureRequirements refuses to co-locate a join against — the
    // cache would be RE-shuffled every round (PlanChecksSpec locks this)
    math.max(2, math.min(cap.toLong, bytes / (1L << 20) + 1L)).toInt
  }

  /** Run `body` with the graph family's build-time SQL conf scoped on:
    * shuffle partitions width-matched to the edge cache (so round
    * exchanges are the same small width as the co-located cache) and
    * adaptive execution OFF, so the per-round plans compile STATIC.
    * With AQE on, every `localCheckpoint` materializes its stages as
    * separate blocking jobs (measured 60–300 ms each on a 32-core
    * local master — GraphProfile5) and the r14 LAZY checkpoints
    * additionally RECOMPUTED all prior rounds inside the final fused
    * job (per-round stage runSum grew 402→1120 ms — GraphProfile8).
    * Static width-matched plans with EAGER checkpoints run each round
    * exactly once as one tiny job: sssp 1.85 → 0.82 s at 32 cores
    * (GraphProfile9), bit-equal output. AQE contributes nothing to
    * these rounds at any scale: join strategy is hinted, the cache
    * side's partitioning is fixed, and round frames are node-sized.
    */
  private[queries] def withGraphBuildConf[A](s: SparkSession, width: Int)(body: => A): A =
    Tuned.withWidth(s, width)(body)

  /** The per-pair trade aggregate every graph edge view derives from:
    * one row per (suppkey, custkey) that ever traded, with the distinct
    * order count (weighted-edge costs) and total quantity (strong-edge
    * threshold). Built ONCE per (session, sf) — previously
    * [[tradeEdges]], [[weightedEdges]], [[gJaccardSim]]'s edge set and
    * [[gConcomp]]'s strong edges EACH paid their own lineitem⋈orders
    * pass over the fact table (optimization r15: 4 fact scans → 1).
    */
  private[queries] def tradePairs(s: SparkSession, dir: String): DataFrame =
    FrameCache.cached(s, s"g_trade_pairs:$dir") {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          // small integers stored as double — exact under any reduction
          // order (the g_concomp contract)
          sum(col("l_quantity")).as("qty"))
        .repartition(graphWidth(s, dir), col("sk"))
    }

  /** The symmetrized trade graph: one edge per DISTINCT supplier–customer
    * pair that ever traded (lineitem ⋈ orders), in both directions, so
    * every node has out-degree ≥ 1 and PageRank has no dangling-mass
    * term. Node ids are prefixed ('S'/'C') into one namespace. Built
    * once per (session, sf) and reused by every round and every graph
    * query ([[FrameCache]]); derives from [[tradePairs]], so the fact
    * scan is shared with the other edge views.
    */
  private[queries] def tradeEdges(s: SparkSession, dir: String): DataFrame =
    FrameCache.cached(s, s"g_trade_edges:$dir") {
      val e0 = tradePairs(s, dir)
        .select(concat(lit("S"), col("sk")).as("src"),
          concat(lit("C"), col("ck")).as("dst"))
      // persisted hash-partitioned on src at the byte-derived width:
      // every round's rank⋈edges join then satisfies ENSURE_REQUIREMENTS
      // from the cache — only the (tiny) rank frame moves per round,
      // never the edge table
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(graphWidth(s, dir), col("src"))
    }

  /** g_pagerank — damped PageRank (d = 0.85, [[PrIters]] rounds) over
    * the symmetrized trade graph, in exact integer fixed-point:
    * r⁰ = ⌊10⁹/N⌋ ppb per node, then each round
    * rᵏ⁺¹(v) = ⌊0.15·10⁹/N⌋ + ⌊85·Σ_{u→v}⌊rᵏ(u)/deg(u)⌋ / 100⌋.
    * Every operation is long division/multiplication — deterministic
    * under ANY reduction order, so the DuckDB oracle (the same rounds
    * unrolled as CTEs with `//`) matches bit-for-bit. Output: one row
    * per node, (node, rank_ppb).
    */
  def gPagerank: Q = (s, dir) => {
    val edges = tradeEdges(s, dir)
    val deg = tradeDeg(s, dir)
    val n = FrameCache.cachedCount(s, s"g_trade_n:$dir")(deg.count())
    // Compile the 4-round plan STATIC at the byte-derived width (r15;
    // see withGraphBuildConf): the rounds are a linear plan over the
    // co-located cache, so AQE's only effect is ~10 blocking
    // stage-materialization jobs at action time. Touching executedPlan
    // inside the scope pins the static width-matched plan.
    withGraphBuildConf(s, graphWidth(s, dir)) {
      val df = pagerank(edges, deg, n)
      df.queryExecution.executedPlan
      df
    }
  }

  /** The trade graph's (node, outdeg) table — one aggregation over the
    * cached edge frame, itself cached so [[gPagerank]] and
    * [[gDegreeStats]] share it within a session.
    */
  private[queries] def tradeDeg(s: SparkSession, dir: String): DataFrame =
    FrameCache.cached(s, s"g_trade_deg:$dir")(
      tradeEdges(s, dir).groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .withColumnRenamed("src", "node"))

  /** The power-iteration core over a (src, dst) edge frame with its
    * (node, outdeg) degree table and node count — see [[gPagerank]] for
    * semantics; split out so the spec can drive it on hand graphs
    * against an independent Scala reference.
    *
    * CONTRACT: every dst must appear in deg (equivalently, every sink
    * must also be a source — the symmetrized trade graph guarantees it,
    * and refPagerank in the spec assumes the same). A dst outside deg
    * would silently drop its inbound mass at the left join — classic
    * dangling-node PageRank, which this integer recurrence deliberately
    * does NOT model.
    */
  private[queries] def pagerank(edges: DataFrame, deg: DataFrame, n: Long): DataFrame = {
    val teleport = (PrTotalPpb - PrDampNum * PrTotalPpb / PrDampDen) / n
    val init = deg.withColumn("rank", lit(PrTotalPpb / n))
    val fin = (1 to PrIters).foldLeft(init) { (r, _) =>
      pagerankRound(edges, deg, r, teleport)
    }
    fin.select(col("node"), col("rank").as("rank_ppb"))
  }

  /** One power-iteration round of [[pagerank]] — split out so the
    * ScaleChecks graph accounting can materialize and cost each round
    * separately with the exact production plan shape (one co-located
    * join against the src-partitioned edge cache + one aggregate).
    *
    * The rank side carries a `shuffle_hash` hint: without it Spark plans
    * a SortMergeJoin whose edge-side Sort re-sorts the ENTIRE cached
    * edge table every round (the cache's hash(src) partitioning
    * satisfies the distribution requirement but not the ordering one) —
    * measured as the dominant per-round cost at sf10 (117M edges,
    * ScaleChecks graph mode). A shuffled hash join builds on the
    * node-sized rank frame and STREAMS the edge cache unsorted, which is
    * the iteration shape that scales: per-round cost = one pass over the
    * co-located edges + a build of rank/numPartitions rows.
    */
  private[queries] def pagerankRound(edges: DataFrame, deg: DataFrame,
                                     r: DataFrame, teleport: Long): DataFrame = {
    val inbound = r.hint("shuffle_hash").join(edges, r("node") === edges("src"))
      .select(col("dst"), expr("rank div outdeg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("m"))
    deg.join(inbound.hint("shuffle_hash"), deg("node") === inbound("dst"), "left")
      .select(col("node"), col("outdeg"),
        (lit(teleport) +
          expr(s"($PrDampNum * coalesce(m, 0L)) div $PrDampDen")).as("rank"))
  }

  /** Per-node neighbor count for [[gJaccardSim]]'s top-k, and the pilot
    * cohort (suppkey < [[JaccPilot]]) similarity is computed FOR — the
    * sim_lsh_topk / j9 pattern: the query side is a bounded cohort, the
    * candidate side is the whole catalog.
    */
  val JaccTopK = 5
  val JaccPilot = 100

  /** g_jaccard_sim — common-neighbor Jaccard similarity: for each
    * supplier in the pilot cohort, the [[JaccTopK]] suppliers (from the
    * WHOLE catalog) whose customer sets overlap it most — the item-item
    * collaborative-filtering shape, the graph-side twin of the MinHash
    * document Jaccard. J = |common| / (d₁ + d₂ − |common|) with TRUE
    * (unpiloted) degrees, kept as INTEGER micro-units (`(10⁶·common)
    * div union` — one integer division, bit-exact in any engine),
    * ranked per pilot supplier with a neighbor tie-break.
    *
    * Scale: co-occurrence pair generation is the self-join on the
    * shared customer. UNPILOTED it is the classic explosion — the
    * intermediate is Σ_c deg(c)² (linear in data) but the aggregation
    * KEY SPACE is all supplier pairs, which grows with catalog² and
    * measured 22× wall at 10× data. Piloting one side bounds both:
    * Σ_c degP(c)·deg(c) intermediate rows and ≤ pilot×catalog keys —
    * linear in data at fixed pilot, the same contract as the ANN
    * query families. For ALL-pairs similarity at catalog scale the
    * library's MinHash-LSH machinery over neighbor sets is the path
    * ([[DedupQueries]]), not this exact form. The rank ≤ k filter
    * plans WindowGroupLimit; keys stay INT until the output prefix.
    */
  def gJaccardSim: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // the (sk, ck) pair set IS the shared per-pair aggregate's key set
    // (r15) — no separate fact scan
    val e = FrameCache.cached(s, s"g_sup_edges_int:$dir")(
      tradePairs(s, dir).select(col("sk"), col("ck")))
    val deg = e.groupBy(col("sk")).agg(count(lit(1)).as("d"))
    // Measured negative result (r14): hinting these three joins
    // shuffle_hash (to drop the SortMergeJoin sorts, the pagerankRound
    // idiom) read 2.30 s vs 0.99 s unhinted at sf0.1 — the SMJ sorts
    // over the small post-aggregate frames are cheaper than the SHJ
    // hash-table builds here, and the sorted runs feed the downstream
    // window's ordering. Catalyst's unhinted choice stands.
    val common = e.filter(col("sk") < JaccPilot)
      .select(col("sk").as("s1"), col("ck"))
      .join(e.select(col("sk").as("s2"), col("ck")), Seq("ck"))
      .filter(col("s1") =!= col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("common"))
    val j = common
      .join(deg.select(col("sk").as("s1"), col("d").as("d1")), Seq("s1"))
      .join(deg.select(col("sk").as("s2"), col("d").as("d2")), Seq("s2"))
      .withColumn("jaccard_micro", expr("(1000000 * common) div (d1 + d2 - common)"))
    val w = Window.partitionBy(col("s1")).orderBy(col("jaccard_micro").desc, col("s2").asc)
    j.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= JaccTopK)
      .select(concat(lit("S"), col("s1")).as("supplier"),
        concat(lit("S"), col("s2")).as("neighbor"),
        col("common"), col("jaccard_micro"), col("rank"))
  }

  /** BFS depth bound and seed-cohort cutoff for [[gKhop]]. */
  val KhopRounds = 4
  val KhopSeedMax = 10L

  /** g_khop — k-hop BFS distance from a seed cohort (suppliers with
    * suppkey < [[KhopSeedMax]]) over the symmetrized trade graph, up to
    * [[KhopRounds]] hops: the "link distance from trusted seed domains"
    * signal a web-curation pipeline mixes into its source-quality score.
    * Output is (node, dist) for every node reached, dist = exact
    * minimum hop count (integers end to end — nothing to drift).
    *
    * Scale: textbook frontier BFS — each round joins the CURRENT
    * frontier (shrinking; never the visited set) against the cached
    * edge table, which is persisted hash-partitioned on `src`
    * ([[tradeEdges]]), so every round's expansion satisfies
    * ENSURE_REQUIREMENTS from the cache and only frontier rows move.
    * Rounds are a fixed constant; each round's frontier is
    * localCheckpoint'ed so the plan stays O(1) per round (the
    * dd_cluster pattern) instead of re-deriving all prior frontiers —
    * at cluster scale those per-round frontier frames are exactly what
    * you'd persist. The anti-join keeps dist = first-visit minimal.
    */
  def gKhop: Q = (s, dir) => {
    val edges = tradeEdges(s, dir)
    val seeds = tradeDeg(s, dir)
      .filter(col("node").startsWith("S") &&
        substring(col("node"), 2, 18).cast("long") < KhopSeedMax)
      .select(col("node"))
    // EAGER width-matched static rounds (r15; see withGraphBuildConf).
    // The r14 lazy checkpoints were measured RECOMPUTING prior rounds
    // inside the final fused job; eager cuts materialize each round
    // exactly once as one tiny static job at the byte-derived width.
    withGraphBuildConf(s, graphWidth(s, dir)) {
      val init = seeds.withColumn("dist", lit(0)).localCheckpoint()
      val (visited, _) = (1 to KhopRounds).foldLeft((init, init.select(col("node")))) {
        case ((vis, frontier), i) =>
          val next = khopExpand(edges, vis, frontier, i).localCheckpoint()
          (vis.union(next), next.select(col("node")))
      }
      visited
    }
  }

  /** One BFS expansion round of [[gKhop]] — split out so PlanChecksSpec
    * can lock the round's physical shape (the src-partitioned edge cache
    * serves the join; only the frontier shuffles).
    */
  private[queries] def khopExpand(edges: DataFrame, vis: DataFrame,
                                  frontier: DataFrame, i: Int): DataFrame =
    // shuffle_hash on the frontier: stream the cached edges unsorted
    // into a hash join built from the frontier (see pagerankRound — the
    // SortMergeJoin alternative re-sorts the full edge cache per hop)
    frontier.hint("shuffle_hash").join(edges, frontier("node") === edges("src"))
      .select(col("dst").as("node")).distinct()
      .join(vis, Seq("node"), "left_anti")
      .withColumn("dist", lit(i))

  /** Relaxation rounds for [[gSssp]] (fixed — the oracle unrolls them). */
  val SsspRounds = 4

  /** g_sssp — WEIGHTED shortest path from the seed cohort, as
    * [[SsspRounds]] Bellman-Ford min-plus relaxations over the strong
    * trade graph: edge cost = max(1, 10 − n_orders) (sustained
    * relationships are cheap to traverse, one-off trades expensive) —
    * the weighted complement of [[gKhop]]'s hop counting, and the
    * "cheapest trust path from seed domains" curation signal. Output:
    * (node, dist) for every node within [[SsspRounds]] relaxations,
    * i.e. the cheapest ≤4-edge path cost. All costs are small positive
    * integers, so min-plus is reduction-order-independent and the
    * unrolled DuckDB oracle matches bit-for-bit (the same argument as
    * [[gPagerank]]'s fixed-point ranks — a float-weighted Dijkstra can
    * never cross-engine-hash).
    *
    * Scale: no priority queue exists at cluster scale — the round-based
    * relaxation IS the distributed form (Pregel SSSP). Each round is
    * one join of the current distance frame against the src-partitioned
    * cached weighted edges + one min aggregate; the distance frame
    * stays node-sized, lineage is cut per round, rounds are a fixed
    * constant.
    */
  def gSssp: Q = (s, dir) => {
    val edges = weightedEdges(s, dir)
    // eager width-matched static rounds — see gKhop (r15)
    withGraphBuildConf(s, graphWidth(s, dir)) {
      val init = edges
        .filter(col("src").startsWith("S") &&
          substring(col("src"), 2, 18).cast("long") < KhopSeedMax)
        .select(col("src").as("node")).distinct()
        .withColumn("dist", lit(0L)).localCheckpoint()
      (1 to SsspRounds).foldLeft(init) { (d, _) =>
        ssspRound(edges, d).localCheckpoint()
      }
    }
  }

  /** One Bellman-Ford relaxation round of [[gSssp]] — split out so
    * PlanChecksSpec can lock the round's physical shape (edge cache
    * served from its src partitioning, min map-side combined).
    */
  private[queries] def ssspRound(edges: DataFrame, d: DataFrame): DataFrame = {
    // shuffle_hash: build on the distance frame, stream the edge cache
    // unsorted (see pagerankRound)
    val relaxed = d.hint("shuffle_hash").join(edges, d("node") === edges("src"))
      .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
    d.select(col("node"), col("dist")).union(relaxed)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
  }

  /** The weighted symmetrized trade graph for [[gSssp]]: one edge per
    * distinct supplier–customer pair, cost max(1, 10 − n_orders) —
    * built once per (session, sf), hash-partitioned on `src` like
    * [[tradeEdges]] so every relaxation round's join is co-located.
    */
  private[queries] def weightedEdges(s: SparkSession, dir: String): DataFrame =
    FrameCache.cached(s, s"g_weighted_edges:$dir") {
      // derives from the shared per-pair aggregate (r15) — the distinct
      // order count per (sk, ck) is exactly tradePairs.n_orders
      val e0 = tradePairs(s, dir)
        .select(concat(lit("S"), col("sk")).as("src"),
          concat(lit("C"), col("ck")).as("dst"),
          greatest(lit(1L), lit(10L) - col("n_orders")).as("w"))
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .repartition(graphWidth(s, dir), col("src"))
    }

  /** Walk length for [[gRandomWalk]] (seeds share [[KhopSeedMax]]). */
  val WalkSteps = 4

  /** g_random_walk — deterministic hash-seeded random walks from the
    * seed cohort: the node2vec/DeepWalk-style walk-corpus generator of
    * graph-embedding pipelines, with the "random" choice derandomized
    * the library's standard way (td_shuffle, td_split): at step k a
    * walk at u moves to the neighbor v minimizing
    * md5Long("k:start:v") — a per-(walk, step) uniform draw that any
    * engine reproduces bit-for-bit, no RNG state. Output: one row per
    * (start_node, step 0..[[WalkSteps]], node).
    *
    * Each step is ONE join of the walk frontier (|seeds| rows) against
    * the src-partitioned cached edge table + an argmin aggregate —
    * `min(struct(h, dst))` — whose lexicographic order equals the
    * oracle's two-stage min(h)-then-min(dst), so even a 60-bit hash
    * tie resolves identically in both engines. Walk count scales with
    * the seed cohort, not the graph.
    */
  def gRandomWalk: Q = (s, dir) => {
    val edges = tradeEdges(s, dir)
    val seeds = tradeDeg(s, dir)
      .filter(col("node").startsWith("S") &&
        substring(col("node"), 2, 18).cast("long") < KhopSeedMax)
      .select(col("node").as("start"), col("node").as("cur"))
    val init = seeds.select(col("start"), col("cur"), lit(0).as("step"))
    // Per-step EAGER localCheckpoint under the width-matched static
    // build conf (r15; see gKhop): without the cut the output union's
    // branch for step k re-derives steps 1..k-1 — the edge cache is
    // streamed 1+2+3+4 = 10 times instead of 4, quadratic in walk
    // length at any scale. Each step is tiny (|seeds| rows).
    val (walks, _) = withGraphBuildConf(s, graphWidth(s, dir)) {
      (1 to WalkSteps).foldLeft((init, seeds)) {
        case ((acc, frontier), k) =>
          val next = walkStep(edges, frontier, k).localCheckpoint()
          (acc.union(next.select(col("start"), col("cur"), lit(k).as("step"))), next)
      }
    }
    walks.select(col("start").as("start_node"), col("step"), col("cur").as("node"))
  }

  /** One derandomized walk step of [[gRandomWalk]] — split out so
    * PlanChecksSpec can lock the step's physical shape (edge cache served
    * from its src partitioning, argmin map-side combined).
    */
  private[queries] def walkStep(edges: DataFrame, frontier: DataFrame, k: Int): DataFrame =
    // shuffle_hash: build on the walk frontier, stream the edge cache
    // unsorted (see pagerankRound)
    frontier.hint("shuffle_hash").join(edges, frontier("cur") === edges("src"))
      .select(col("start"),
        Hashing.md5Long(concat_ws(":", lit(k), col("start"), col("dst"))).as("h"),
        col("dst"))
      .groupBy(col("start"))
      .agg(min(struct(col("h"), col("dst"))).as("m"))
      .select(col("start"), col("m.dst").as("cur"))

  /** Per-node selection bound for [[mutualTopT]] (oracle shares it). */
  val TriDeg = 8

  /** The MUTUAL top-[[TriDeg]] near-dup graph: each doc keeps its
    * [[TriDeg]] closest candidates by (hamming asc, id asc) over the
    * symmetrized [[DedupQueries.ddSimhashPairs]] list, and an edge
    * survives only if BOTH endpoints selected each other — the
    * mutual-kNN sparsification every similarity-graph pipeline applies
    * before structural analysis. It is what makes triangle counting
    * WELL-POSED here at all: a near-dup CLUSTER is a clique by
    * construction, so the raw candidate graph carries Θ(c³) triangles
    * per c-doc cluster (measured: 3104 nodes, avg degree 109, 61M
    * wedges at sf0.1 — and growing cubically with cluster size). The
    * mutual rule caps degree at [[TriDeg]] STRUCTURALLY (one-sided
    * top-T only caps out-degree — a clique's lowest ids collect
    * unbounded in-selections), so wedge volume is ≤ N·C(T,2): linear
    * in the corpus at ANY duplication profile. Deterministic: ties
    * break by id, no scores to drift.
    */
  private[queries] def mutualTopT(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"), col("hamming"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"), col("hamming")))
    val w = Window.partitionBy(col("src")).orderBy(col("hamming").asc, col("dst").asc)
    val sel = sym.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TriDeg).select(col("src"), col("dst"))
    sel.as("a").join(sel.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .filter(col("a.src") < col("a.dst"))
      .select(col("a.src").as("doc_a"), col("a.dst").as("doc_b"))
  }

  /** g_triangles — triangle census of the mutual near-dup graph
    * ([[mutualTopT]] over the SimHash candidate pairs): per-doc
    * triangle counts, the triadic-closure / cluster-cohesion signal —
    * a near-dup pair supported by a third mutual near-dup is a clique
    * forming, not a band-collision accident, so this is the cheapest
    * confidence score over the candidate graph before cluster
    * resolution commits to components ([[DedupQueries.ddCluster]]).
    *
    * Scale: the candidate substrate is linear in the corpus by LSH
    * design (banded buckets, never all-pairs), the mutual-top-T rule
    * bounds degree ≤ [[TriDeg]] (see [[mutualTopT]] — without it the
    * dup-cluster cliques make triangle ENUMERATION itself cubic), and
    * the count uses DEGREE-ORDERED orientation — each undirected edge
    * points low→high (degree, id) rank, each triangle is enumerated
    * exactly once from its lowest-rank apex; the wedge join fans out
    * on ORIENTED out-degree, O(m^{3/2}) worst case on any input (the
    * triangle SET is orientation-independent, which is why the
    * id-ordered oracle agrees). Two equi-joins co-partitioned on the
    * apex/closing keys; the degree table is edge-aggregated and
    * broadcasts.
    */
  def gTriangles: Q = (s, dir) =>
    triangleCounts(FrameCache.cachedCut(s, s"g_neardup_edges:$dir")(
      mutualTopT(DedupQueries.ddSimhashPairs(s, dir))))

  /** The oriented triangle-count core over unique undirected edges
    * (doc_a < doc_b) — see [[gTriangles]]; the spec drives it on hand
    * graphs and against a brute-force driver-side enumeration.
    */
  private[queries] def triangleCounts(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("doc_a").as("n"))
      .union(pairs.select(col("doc_b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val withDeg = pairs
      .join(broadcast(deg.select(col("n").as("doc_a"), col("deg").as("da"))), Seq("doc_a"))
      .join(broadcast(deg.select(col("n").as("doc_b"), col("deg").as("db"))), Seq("doc_b"))
    val ordA = struct(col("da").as("d"), col("doc_a").as("i"))
    val ordB = struct(col("db").as("d"), col("doc_b").as("i"))
    val aFirst = ordA < ordB
    val oriented = withDeg.select(
      when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("src"),
      when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("dst"),
      when(aFirst, ordB).otherwise(ordA).as("dst_ord"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst_ord") < col("e2.dst_ord"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tri = wedges.join(oriented.as("e3"),
        col("b") === col("e3.src") && col("c") === col("e3.dst"))
      .select(col("a"), col("b"), col("c"))
    tri.select(col("a").as("doc_id"))
      .union(tri.select(col("b").as("doc_id")))
      .union(tri.select(col("c").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** g_clustering — local clustering coefficient over the mutual
    * near-dup graph: per node, how close its neighborhood is to a
    * clique, as the INTEGER micro-ratio
    * ⌊2·triangles·10⁶ / (deg·(deg−1))⌋ — 10⁶ = my neighbors all
    * near-duplicate each other (a solid dup cluster), 0 = my candidate
    * pairs share nothing (band-collision noise). The per-node
    * continuation of [[gTriangles]]' census, and the standard
    * graph-cohesion score.
    *
    * Scale: reuses the cached [[mutualTopT]] graph and the oriented
    * triangle core — the only additions are the degree aggregate
    * (edge-linear) and a LEFT join of the (smaller) triangle table onto
    * it; integer division keeps the ratio bit-stable cross-engine.
    * Nodes of degree 1 carry no defined coefficient and are excluded
    * (deg ≥ 2).
    */
  def gClustering: Q = (s, dir) =>
    clusteringOf(FrameCache.cachedCut(s, s"g_neardup_edges:$dir")(
      mutualTopT(DedupQueries.ddSimhashPairs(s, dir))))

  /** The coefficient core over unique undirected edges (doc_a < doc_b)
    * — see [[gClustering]]; spec-driven on hand graphs.
    */
  private[queries] def clusteringOf(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
    deg.filter(col("deg") >= 2)
      .join(triangleCounts(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("(2000000L * coalesce(n_triangles, 0L)) div (deg * (deg - 1))")
          .as("coef_micro"))
  }

  /** Total-quantity threshold defining a STRONG trade edge — pairs at
    * or above it are sustained relationships, below it casual trades.
    * 95 fragments the sf0.01 graph into 20 components (the full graph
    * is one giant component, where the labeling is correct but tells
    * you nothing). Quantities are small integers stored as double, so
    * the sum is exact under any reduction order and the threshold
    * comparison is deterministic cross-engine.
    */
  val CcQtyMin = 95

  /** g_concomp — connected components over the strong trade graph:
    * supplier–customer pairs whose total traded quantity is ≥
    * [[CcQtyMin]], each node labeled with its component's minimum id.
    * The "which suppliers and customers form one connected market"
    * question, and the graph-native face of the same component
    * machinery [[DedupQueries.ddCluster]] uses for near-dup clusters.
    * Node ids share one integer namespace: supplier k → 2k, customer
    * k → 2k+1 (integers end-to-end — no string keys in the shuffle).
    *
    * Scale: the threshold is applied inside the ONE pair aggregation
    * (map-side combined sum over lineitem⋈orders), so the edge list is
    * sparse by construction before anything graph-shaped runs. Then
    * [[DedupQueries.connectedComponents]]'s hybrid takes over: sparse
    * edge lists (≤4M) resolve in one driver union-find pass; bigger
    * graphs fall back to distributed min-label propagation with
    * pointer jumping (O(log diameter) rounds, lineage truncated per
    * round). The oracle is the same fixpoint as a recursive min-label
    * CTE.
    */
  def gConcomp: Q = (s, dir) => {
    // the per-pair quantity total is tradePairs.qty (r15) — the strong
    // filter is a cheap scan of the shared cached aggregate, not its
    // own lineitem⋈orders pass
    val strong = tradePairs(s, dir)
      .filter(col("qty") >= CcQtyMin)
      .select((col("sk") * 2).as("a"), (col("ck") * 2 + 1).as("b"))
    DedupQueries.connectedComponents(strong, "a", "b")
      .select(col("id").as("node"), col("component"))
  }

  /** g_degree_stats — degree distribution of the trade graph in one
    * aggregation pass: nodes per (side, degree) bucket. The companion
    * sanity report for [[gPagerank]] (rank concentration tracks degree
    * skew) and the cheapest first question asked of any new graph.
    */
  def gDegreeStats: Q = (s, dir) =>
    tradeDeg(s, dir)
      .groupBy(substring(col("node"), 1, 1).as("side"),
        col("outdeg").as("degree"))
      .agg(count(lit(1)).as("n_nodes"))

  val queries: Map[String, Q] = Map(
    "g_pagerank" -> gPagerank,
    "g_jaccard_sim" -> gJaccardSim,
    "g_khop" -> gKhop,
    "g_random_walk" -> gRandomWalk,
    "g_triangles" -> gTriangles,
    "g_clustering" -> gClustering,
    "g_concomp" -> gConcomp,
    "g_sssp" -> gSssp,
    "g_degree_stats" -> gDegreeStats)

  // ---- DuckDB oracles ------------------------------------------------

  /** Oracle mirror of [[mutualTopT]] over the shared `sp(doc_a, doc_b,
    * hamming)` candidate pairs: symmetrize, keep each node's top
    * [[TriDeg]] by (hamming asc, dst asc), then require both directions
    * — ends in `me(doc_a, doc_b)` with doc_a < doc_b.
    */
  private val duckMutualCtes: String =
    s"""sym AS (
      |  SELECT doc_a AS src, doc_b AS dst, hamming FROM sp
      |  UNION ALL SELECT doc_b AS src, doc_a AS dst, hamming FROM sp),
      |sel AS (
      |  SELECT src, dst FROM (
      |    SELECT src, dst, row_number() OVER (
      |      PARTITION BY src ORDER BY hamming ASC, dst ASC) AS rn
      |    FROM sym)
      |  WHERE rn <= $TriDeg),
      |me AS (
      |  SELECT a.src AS doc_a, a.dst AS doc_b
      |  FROM sel a JOIN sel b ON a.src = b.dst AND a.dst = b.src
      |  WHERE a.src < a.dst)""".stripMargin

  /** One unrolled PageRank round: rank table `prev` → `out`. */
  private def duckPrRound(prev: String, out: String): String =
    s"""$out AS (
      |  SELECT d.node, d.outdeg,
      |    ((SELECT ($PrTotalPpb::BIGINT - $PrDampNum::BIGINT * $PrTotalPpb // $PrDampDen) // n FROM nn)
      |      + ($PrDampNum * coalesce(s.m, 0)) // $PrDampDen)::BIGINT AS rank
      |  FROM deg d LEFT JOIN (
      |    SELECT e.dst AS node, sum(r.rank // r.outdeg)::BIGINT AS m
      |    FROM $prev r JOIN edges e ON r.node = e.src GROUP BY e.dst) s
      |  ON d.node = s.node)""".stripMargin

  private val duckEdges: String =
    """e0 AS (
      |  SELECT DISTINCT 'S' || l_suppkey AS src, 'C' || o_custkey AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (
      |  SELECT src, dst FROM e0
      |  UNION ALL SELECT dst AS src, src AS dst FROM e0),
      |deg AS (SELECT src AS node, count(*)::BIGINT AS outdeg
      |        FROM edges GROUP BY src)""".stripMargin

  val oracle: Map[String, String] = Map(
    "g_pagerank" -> {
      val rounds = (1 to PrIters).map(i =>
        duckPrRound(if (i == 1) "r0" else s"r${i - 1}", s"r$i"))
      s"""WITH $duckEdges,
        |nn AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT node, outdeg, ($PrTotalPpb // n)::BIGINT AS rank
        |       FROM deg CROSS JOIN nn),
        |${rounds.mkString(",\n")}
        |SELECT node, rank AS rank_ppb FROM r$PrIters""".stripMargin
    },
    "g_jaccard_sim" ->
      s"""WITH e0 AS (
        |  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |dg AS (SELECT sk, count(*) AS d FROM e0 GROUP BY sk),
        |cm AS (
        |  SELECT a.sk AS s1, b.sk AS s2, count(*) AS common
        |  FROM e0 a JOIN e0 b ON a.ck = b.ck AND a.sk <> b.sk
        |  WHERE a.sk < $JaccPilot
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT cm.s1, cm.s2, cm.common,
        |    (1000000 * cm.common) // (d1.d + d2.d - cm.common) AS jaccard_micro
        |  FROM cm JOIN dg d1 ON cm.s1 = d1.sk JOIN dg d2 ON cm.s2 = d2.sk)
        |SELECT 'S' || s1 AS supplier, 'S' || s2 AS neighbor,
        |  common, jaccard_micro, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY s1
        |    ORDER BY jaccard_micro DESC, s2) AS rank FROM j)
        |WHERE rank <= $JaccTopK""".stripMargin,
    "g_khop" -> {
      val rounds = (1 to KhopRounds).map { i =>
        s"""n$i AS (
          |  SELECT DISTINCT e.dst AS node
          |  FROM v${i - 1} v JOIN edges e ON v.node = e.src
          |  WHERE v.dist = ${i - 1}),
          |d$i AS (SELECT node, $i AS dist FROM n$i
          |        WHERE node NOT IN (SELECT node FROM v${i - 1})),
          |v$i AS (SELECT * FROM v${i - 1} UNION ALL SELECT * FROM d$i)""".stripMargin
      }
      s"""WITH $duckEdges,
        |v0 AS (SELECT node, 0 AS dist FROM deg
        |       WHERE node LIKE 'S%' AND substr(node, 2)::BIGINT < $KhopSeedMax),
        |${rounds.mkString(",\n")}
        |SELECT node, dist FROM v$KhopRounds""".stripMargin
    },
    "g_random_walk" -> {
      val steps = (1 to WalkSteps).map { k =>
        s"""c$k AS (
          |  SELECT w.start, e.dst,
          |    ('0x' || substr(md5($k || ':' || w.start || ':' || e.dst), 1, 15))::BIGINT AS h
          |  FROM w${k - 1} w JOIN edges e ON w.cur = e.src),
          |m$k AS (SELECT start, min(h) AS mh FROM c$k GROUP BY start),
          |w$k AS (
          |  SELECT c.start, min(c.dst) AS cur
          |  FROM c$k c JOIN m$k m ON c.start = m.start AND c.h = m.mh
          |  GROUP BY c.start)""".stripMargin
      }
      val union = (0 to WalkSteps).map(k =>
        s"SELECT start AS start_node, $k AS step, cur AS node FROM w$k")
        .mkString("\nUNION ALL ")
      s"""WITH $duckEdges,
        |w0 AS (SELECT node AS start, node AS cur FROM deg
        |       WHERE node LIKE 'S%' AND substr(node, 2)::BIGINT < $KhopSeedMax),
        |${steps.mkString(",\n")}
        |$union""".stripMargin
    },
    "g_triangles" ->
      s"""${DedupQueries.duckSimhashPairsCtes},
        |$duckMutualCtes,
        |tri AS (
        |  SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
        |  FROM me p1
        |  JOIN me p2 ON p2.doc_a = p1.doc_b
        |  JOIN me p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
        |tn AS (
        |  SELECT a AS doc_id FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT doc_id, count(*)::BIGINT AS n_triangles
        |FROM tn GROUP BY doc_id""".stripMargin,
    "g_clustering" ->
      s"""${DedupQueries.duckSimhashPairsCtes},
        |$duckMutualCtes,
        |dg AS (
        |  SELECT doc_id, count(*)::BIGINT AS deg FROM (
        |    SELECT doc_a AS doc_id FROM me
        |    UNION ALL SELECT doc_b FROM me)
        |  GROUP BY doc_id),
        |tri AS (
        |  SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
        |  FROM me p1
        |  JOIN me p2 ON p2.doc_a = p1.doc_b
        |  JOIN me p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
        |tc AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_triangles FROM (
        |    SELECT a AS doc_id FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY doc_id)
        |SELECT dg.doc_id, dg.deg,
        |  coalesce(tc.n_triangles, 0)::BIGINT AS n_triangles,
        |  ((2000000 * coalesce(tc.n_triangles, 0)) // (dg.deg * (dg.deg - 1)))::BIGINT
        |    AS coef_micro
        |FROM dg LEFT JOIN tc ON dg.doc_id = tc.doc_id
        |WHERE dg.deg >= 2""".stripMargin,
    "g_degree_stats" ->
      s"""WITH $duckEdges
        |SELECT substr(node, 1, 1) AS side, outdeg AS degree,
        |  count(*)::BIGINT AS n_nodes
        |FROM deg GROUP BY 1, 2""".stripMargin,
    "g_sssp" -> {
      val rounds = (1 to SsspRounds).map { i =>
        s"""d$i AS (
          |  SELECT node, min(dist)::BIGINT AS dist FROM (
          |    SELECT node, dist FROM d${i - 1}
          |    UNION ALL
          |    SELECT e.d AS node, p.dist + e.w AS dist
          |    FROM d${i - 1} p JOIN wedges e ON p.node = e.s)
          |  GROUP BY node)""".stripMargin
      }
      s"""WITH we AS (
        |  SELECT 'S' || l_suppkey AS s, 'C' || o_custkey AS d,
        |    count(DISTINCT l_orderkey) AS n
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |wedges AS (
        |  SELECT s, d, greatest(1, 10 - n)::BIGINT AS w FROM we
        |  UNION ALL SELECT d, s, greatest(1, 10 - n)::BIGINT FROM we),
        |d0 AS (
        |  SELECT DISTINCT s AS node, 0::BIGINT AS dist FROM wedges
        |  WHERE s LIKE 'S%' AND substr(s, 2)::BIGINT < $KhopSeedMax),
        |${rounds.mkString(",\n")}
        |SELECT node, dist FROM d$SsspRounds""".stripMargin
    },
    // Min-label fixpoint as a recursive CTE: `reach` accumulates every
    // (node, label-of-a-node-that-can-reach-it) pair over the
    // symmetrized strong edges; UNION dedup terminates it, min(label)
    // per node is the component = min member id — the same fixpoint
    // the Spark side's union-find / pointer-jumping computes.
    "g_concomp" ->
      s"""WITH RECURSIVE strong AS (
        |  SELECT l_suppkey*2 AS a, o_custkey*2+1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2 HAVING sum(l_quantity) >= $CcQtyMin),
        |cedges AS (SELECT a AS s, b AS d FROM strong
        |           UNION ALL SELECT b, a FROM strong),
        |reach(node, label) AS (
        |  SELECT DISTINCT s, s FROM cedges
        |  UNION
        |  SELECT e.d, r.label FROM reach r JOIN cedges e ON r.node = e.s)
        |SELECT node, min(label)::BIGINT AS component
        |FROM reach GROUP BY node""".stripMargin)
}
