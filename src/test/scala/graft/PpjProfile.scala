package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15: dd_prefix_join width/AQE A/B — the query is ~10 small stages over
  * the shared gram cache; session-width (=cpus) tiny tasks again. */
object PpjProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val w = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.DedupQueries
    def scoped[A](pairs: (String, String)*)(body: => A): A = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(p)) => spark.conf.set(k, p)
        case (k, None) => spark.conf.unset(k)
      }
    }
    def timeQ(label: String)(body: => DataFrame): Unit = {
      body.queryExecution.toRdd.count()
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        body.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ppj] $label%-34s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val grams = {
      val m = Class.forName("graft.queries.TextQueries$")
        .getDeclaredMethod("sharedGramStream", classOf[SparkSession], classOf[String])
      m.setAccessible(true)
      m.invoke(Class.forName("graft.queries.TextQueries$").getField("MODULE$").get(null),
        spark, dir).asInstanceOf[DataFrame]
    }
    println("[ppj] gram cache partitions=" + grams.rdd.getNumPartitions +
      " rows=" + grams.count())
    // narrow copy of the gram cache
    val gramsW = grams.repartition(w, col("gram")).persist()
    gramsW.count()
    def pj(g: DataFrame): DataFrame = {
      val m = Class.forName("graft.queries.DedupQueries$")
        .getDeclaredMethod("prefixJoinOf", classOf[DataFrame])
      m.setAccessible(true)
      m.invoke(DedupQueries, g).asInstanceOf[DataFrame]
    }
    timeQ("current (cache=cpus, AQE on)")(pj(grams))
    timeQ(s"cache=$w, session conf")(pj(gramsW))
    timeQ(s"cache=$w, pinned w=$w aqe-off") {
      scoped("spark.sql.shuffle.partitions" -> w.toString,
             "spark.sql.adaptive.enabled" -> "false") {
        val df = pj(gramsW); df.queryExecution.executedPlan; df
      }
    }
    timeQ(s"cache=$w, pinned w=$w aqe-on") {
      scoped("spark.sql.shuffle.partitions" -> w.toString) {
        val df = pj(gramsW); df.queryExecution.executedPlan; df
      }
    }
    val a = pj(grams); val b = pj(gramsW)
    println("[ppj] equal: " + (a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0))
    spark.stop()
  }
}
