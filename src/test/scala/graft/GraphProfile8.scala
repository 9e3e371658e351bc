package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15: per-stage accounting of the single-job AQE-off sssp combo. */
object GraphProfile8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nParts = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.GraphQueries

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        val run = si.taskMetrics.executorRunTime
        stages.add((si.stageId, wall, run, si.numTasks, si.name.take(60))); ()
      }
    })
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
    def build(): DataFrame =
      scoped("spark.sql.shuffle.partitions" -> nParts.toString,
             "spark.sql.adaptive.enabled" -> "false") {
        val init = wEdgesSmall
          .filter(col("src").startsWith("S") &&
            substring(col("src"), 2, 18).cast("long") < GraphQueries.KhopSeedMax)
          .select(col("src").as("node")).distinct()
          .withColumn("dist", lit(0L)).localCheckpoint(false)
        val fin = (1 to GraphQueries.SsspRounds).foldLeft(init) { (d, _) =>
          round(wEdgesSmall, d).localCheckpoint(false)
        }
        fin.queryExecution.executedPlan
        fin
      }
    build().queryExecution.toRdd.count()
    build().queryExecution.toRdd.count()
    Thread.sleep(300); stages.clear()
    val t0 = System.nanoTime()
    build().queryExecution.toRdd.count()
    println(f"[gprof8] total ${(System.nanoTime() - t0) / 1e9}%6.3f")
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, wall, run, n, name) =>
      println(f"[gprof8]   stage$id%-5d wall=${wall}%5d ms runSum=${run}%5d ms tasks=$n%-3d $name")
    }
    spark.stop()
  }
}
