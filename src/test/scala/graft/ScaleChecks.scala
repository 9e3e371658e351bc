package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-audit harness (test scope, never shipped): the measurements the
  * round-10 verdict asked for, runnable at any sfDir —
  *
  *  1. `knn`  — sim_knn_graph candidate accounting (the dd_typo_pairs-
  *     style decomposition): candidate-pair volume, bucket occupancy,
  *     and the output size that together explain the query's
  *     second-decade ratio.
  *  2. `simhash` — machine-verified wide ≡ narrow equivalence of the
  *     two SimHash candidate generators AT the scale where the switch
  *     actually changes the generator (the sf0.01 oracle gate runs far
  *     below the 100k-doc threshold, and DuckDB times out at sf10, so
  *     only a Spark-vs-Spark comparison can cover the wide path's
  *     domain).
  *  3. `prefix` — lshSigBits prefix stability at scale: the ladder's
  *     widened signature masked to its low bits must equal the narrower
  *     signature bit-for-bit (the invariant that makes the N-adaptive
  *     ladder safe to extend).
  *
  * Run: sbt "Test/runMain graft.queries.ScaleChecks <sfDir> [knn|simhash|prefix|all]"
  */
object ScaleChecks {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val what = args.lift(1).getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (what == "knn" || what == "all") knnAccounting(spark, dir)
    if (what == "simhash" || what == "all") simhashEquivalence(spark, dir)
    if (what == "prefix" || what == "all") prefixStability(spark, dir)
    spark.stop()
  }

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scale] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** Candidate volume + bucket occupancy of sim_knn_graph's banded
    * self-join at this corpus size, under the CURRENT planes ladder.
    */
  def knnAccounting(spark: SparkSession, dir: String): Unit = {
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val p = DedupQueries.lshPlanesPerBand(n)
    println(s"[scale] knn: n_vectors=$n planesPerBand=$p buckets/band=${1L << p}")
    val banded = SimQueries.explodeBands(
      emb.withColumn("sig", SimQueries.lshSigBits(2 * p)), p)
      .select(col("vec_id"), col("band"), col("bv"))
    val occ = banded.groupBy(col("band"), col("bv")).agg(count(lit(1)).as("sz"))
    val stats = occ.agg(
      count(lit(1)).as("n_buckets"),
      max(col("sz")).as("max_occ"),
      avg(col("sz")).as("avg_occ"),
      sum(expr("sz * (sz - 1) DIV 2")).as("cand_pairs")).head()
    println(s"[scale] knn: occupied_buckets=${stats.getLong(0)} " +
      s"max_occ=${stats.getLong(1)} avg_occ=${"%.1f".format(stats.getDouble(2))} " +
      s"candidate_pairs=${stats.getLong(3)}")
    val out = time("knn graph full query")(
      SimQueries.simKnnGraph(spark, dir).count())
    println(s"[scale] knn: output_edges=$out")
  }

  /** Wide (Manku–Jain–Sarma block-combination) vs narrow (4×15-bit
    * band) SimHash candidate generation must produce the SAME final
    * pair set — both are supersets of hamming ≤ 3 ahead of the same
    * exact filter. Verified by symmetric anti-joins (count both ways).
    */
  def simhashEquivalence(spark: SparkSession, dir: String): Unit = {
    val sh = DedupQueries.ddSimhash(spark, dir)
      .localCheckpoint() // one simhash pass feeds both generators
    def pairs(wide: Boolean): DataFrame =
      DedupQueries.simhashPairsOf(sh, wide)
        .select(col("doc_a"), col("doc_b"))
    val narrow = time("narrow (4x15) generator")(pairs(wide = false).localCheckpoint())
    val wide = time("wide (MJS 3-of-6) generator")(pairs(wide = true).localCheckpoint())
    val nOnly = narrow.join(wide, Seq("doc_a", "doc_b"), "left_anti").count()
    val wOnly = wide.join(narrow, Seq("doc_a", "doc_b"), "left_anti").count()
    val nN = narrow.count(); val nW = wide.count()
    println(s"[scale] simhash: narrow_pairs=$nN wide_pairs=$nW " +
      s"narrow_only=$nOnly wide_only=$wOnly " +
      (if (nOnly == 0 && wOnly == 0) "EQUAL" else "MISMATCH"))
    require(nOnly == 0 && wOnly == 0,
      "wide and narrow SimHash generators disagree — pigeonhole guarantee broken")
  }

  /** lshSigBits(m) masked to w low bits must equal lshSigBits(w) for
    * every even width w ≤ m — verified on the full corpus, not a
    * fixture.
    */
  def prefixStability(spark: SparkSession, dir: String): Unit = {
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val full = SimQueries.lshSigBits(SimQueries.MaxPlanes)
    val steps = (3 to SimQueries.MaxPlanes / 2).map(_ * 2)
    val checks = steps.map { w =>
      val narrow = SimQueries.lshSigBits(w)
      sum(when(full.bitwiseAND(lit((1L << w) - 1)) =!= narrow, 1L).otherwise(0L))
        .as(s"mismatch_$w")
    }
    val row = emb.select(checks: _*).head()
    val bad = steps.zipWithIndex.filter { case (_, i) => row.getLong(i) != 0L }
    println(s"[scale] prefix: widths=${steps.mkString(",")} " +
      (if (bad.isEmpty) "ALL-STABLE"
       else s"MISMATCH at ${bad.map(_._1).mkString(",")}"))
    require(bad.isEmpty, "lshSigBits prefix stability violated")
  }
}
