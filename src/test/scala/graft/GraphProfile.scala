package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: eager vs lazy per-round localCheckpoints in the iterative graph
  * queries (optimization r14). Eager checkpoints serialize one job per
  * round during query CONSTRUCTION; lazy ones cut the Catalyst lineage
  * identically but defer materialization to the single final action. */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.GraphQueries

    def timeQ(label: String)(body: => DataFrame): Unit = {
      body.queryExecution.toRdd.count() // warm
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        body.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[gprof] $label%-28s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // production forms (construct included per rep — the bench shape)
    timeQ("g_khop eager (current)")(GraphQueries.queries("g_khop")(spark, dir))
    timeQ("g_sssp eager (current)")(GraphQueries.queries("g_sssp")(spark, dir))
    timeQ("g_random_walk (current)")(GraphQueries.queries("g_random_walk")(spark, dir))

    // lazy-checkpoint khop variant
    def khopLazy: DataFrame = {
      val m = GraphQueries.getClass.getDeclaredMethod("tradeEdges",
        classOf[SparkSession], classOf[String])
      m.setAccessible(true)
      val edges = m.invoke(GraphQueries, spark, dir).asInstanceOf[DataFrame]
      val md = GraphQueries.getClass.getDeclaredMethod("tradeDeg",
        classOf[SparkSession], classOf[String])
      md.setAccessible(true)
      val deg = md.invoke(GraphQueries, spark, dir).asInstanceOf[DataFrame]
      val seeds = deg
        .filter(col("node").startsWith("S") &&
          substring(col("node"), 2, 18).cast("long") < GraphQueries.KhopSeedMax)
        .select(col("node"))
      val init = seeds.withColumn("dist", lit(0)).localCheckpoint(false)
      val (visited, _) = (1 to GraphQueries.KhopRounds).foldLeft(
        (init, init.select(col("node")))) {
        case ((vis, frontier), i) =>
          val next = frontier.hint("shuffle_hash")
            .join(edges, frontier("node") === edges("src"))
            .select(col("dst").as("node")).distinct()
            .join(vis, Seq("node"), "left_anti")
            .withColumn("dist", lit(i)).localCheckpoint(false)
          (vis.union(next), next.select(col("node")))
      }
      visited
    }
    timeQ("g_khop lazy")(khopLazy)
    // equality
    val a = GraphQueries.queries("g_khop")(spark, dir)
    val b = khopLazy
    println("[gprof] khop equal: " +
      (a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0))
    spark.stop()
  }
}
