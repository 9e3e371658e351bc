package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15: job/stage-level accounting of one g_sssp invocation — how many
  * jobs run, how many tasks each, and how much wall each takes, to
  * decide whether the ~2 s construction cost is task launch, AQE
  * stage-materialization round trips, or driver planning.
  */
object GraphProfile5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.GraphQueries

    @volatile var jobStart = Map.empty[Int, Long]
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]() // id, ms, nTasks
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart += e.jobId -> System.nanoTime()
        jobStages.put(e.jobId, e.stageIds)
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageTasks.put(e.stageInfo.stageId, e.stageInfo.numTasks); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrElse(e.jobId, 0L)
        val n = Option(jobStages.get(e.jobId)).getOrElse(Seq.empty)
          .map(sid => Option(stageTasks.get(sid)).map(_.toInt).getOrElse(0)).sum
        jobs.add((e.jobId, (System.nanoTime() - t0) / 1000000, n)); ()
      }
    })

    // warm everything (edge cache, codegen)
    GraphQueries.queries("g_sssp")(spark, dir).queryExecution.toRdd.count()
    GraphQueries.queries("g_sssp")(spark, dir).queryExecution.toRdd.count()
    Thread.sleep(500)
    jobs.clear()

    val t0 = System.nanoTime()
    val df = GraphQueries.queries("g_sssp")(spark, dir)
    val tc = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    df.queryExecution.toRdd.count()
    val te = (System.nanoTime() - t1) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val js = jobs.asScala.toSeq.sortBy(_._1)
    println(f"[gprof5] construct=$tc%6.3f exec=$te%6.3f jobs=${js.size}")
    js.foreach { case (id, ms, n) => println(f"[gprof5]   job$id%-4d ${ms}%5d ms tasks=$n") }
    println(f"[gprof5] sum job wall = ${js.map(_._2).sum} ms")
    spark.stop()
  }
}
