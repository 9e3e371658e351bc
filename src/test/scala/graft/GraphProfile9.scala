package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15: eager checkpoints at byte-derived width. GraphProfile8 showed the
  * r14 lazy checkpoints RECOMPUTE prior rounds inside the final fused job
  * (per-round stage runSum grows 402->1120 ms); eager checkpoints
  * materialize each round once as a tiny width-matched job. */
object GraphProfile9 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val nParts = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.GraphQueries

    def timeQ(label: String)(body: => DataFrame): Unit = {
      body.queryExecution.toRdd.count()
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        body.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[gprof9] $label%-38s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def scoped[A](pairs: (String, String)*)(body: => A): A = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(p)) => spark.conf.set(k, p)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val wEdgesSmall = {
      val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(concat(lit("S"), col("l_suppkey")).as("src"),
          concat(lit("C"), col("o_custkey")).as("dst"))
        .agg(countDistinct(col("l_orderkey")).as("n"))
        .select(col("src"), col("dst"),
          greatest(lit(1L), lit(10L) - col("n")).as("w"))
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .repartition(nParts, col("src")).persist()
    }
    wEdgesSmall.count()
    def round(edges: DataFrame, d: DataFrame): DataFrame = {
      val m = GraphQueries.getClass.getDeclaredMethod("ssspRound",
        classOf[DataFrame], classOf[DataFrame])
      m.setAccessible(true)
      m.invoke(GraphQueries, edges, d).asInstanceOf[DataFrame]
    }
    def sssp(eager: Boolean, aqeOff: Boolean, width: Boolean): DataFrame = {
      val pairs = Seq.newBuilder[(String, String)]
      if (width) pairs += ("spark.sql.shuffle.partitions" -> nParts.toString)
      if (aqeOff) pairs += ("spark.sql.adaptive.enabled" -> "false")
      scoped(pairs.result(): _*) {
        val init = wEdgesSmall
          .filter(col("src").startsWith("S") &&
            substring(col("src"), 2, 18).cast("long") < GraphQueries.KhopSeedMax)
          .select(col("src").as("node")).distinct()
          .withColumn("dist", lit(0L)).localCheckpoint(eager)
        val fin = (1 to GraphQueries.SsspRounds).foldLeft(init) { (d, _) =>
          round(wEdgesSmall, d).localCheckpoint(eager)
        }
        fin.queryExecution.executedPlan
        fin
      }
    }
    timeQ("sssp current")(GraphQueries.queries("g_sssp")(spark, dir))
    timeQ("sssp eager width aqe-on")(sssp(eager = true, aqeOff = false, width = true))
    timeQ("sssp eager width aqe-off")(sssp(eager = true, aqeOff = true, width = true))
    timeQ("sssp eager nowidth aqe-off")(sssp(eager = true, aqeOff = true, width = false))
    val a = GraphQueries.queries("g_sssp")(spark, dir)
    val b = sssp(eager = true, aqeOff = true, width = true)
    println("[gprof9] equal: " +
      (a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0))
    spark.stop()
  }
}
