package graft

import org.apache.spark.sql.SparkSession

/** Print the EXECUTED (post-AQE) plan of one registered query at a given
  * sfDir — local plan-inspection aid.
  * Run: sbt "Test/runMain graft.ExplainOne <query> <sfDir>"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    val n = df.queryExecution.toRdd.count()
    println(f"[explain] $name rows=$n first-run ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    println(f"[explain] $name warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
