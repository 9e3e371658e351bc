package graft

import org.apache.spark.sql.SparkSession

/** r15: does AQE advisory-size coalescing (parallelismFirst=false) fix
  * the v18 component jobs' tiny-task overhead? Full-query A/B in one
  * session, conf flipped between arms. */
object V18Profile4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries("v18_portal_rules")
    def time(label: String, reps: Int): Unit = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[v18ab] $label%-28s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    fn(spark, dir).queryExecution.toRdd.count() // warm (durable artifacts)
    time("parallelismFirst=true (dflt)", 3)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    time("parallelismFirst=false", 3)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    time("back to true (control)", 2)
    spark.stop()
  }
}
