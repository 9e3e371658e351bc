package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component decomposition for h10_returned_items at any sfDir (perf
  * scratch, test scope): where does the wall time go — the filtered
  * lineitem scan, the orderkey join, the custkey aggregate, or the
  * dimension joins? Run:
  *   SPARK_DRIVER_MEM=48g sbt "Test/runMain graft.H10Profile <sfDir>"
  */
object H10Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      // warm + min-of-2 timed, the bench convention
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[h10] $name%-42s ${ts.min}%8.3f s")
    }
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    time("lineitem scan+filter (3 cols)")(li.queryExecution.toRdd.count())
    time("orders scan (2 cols)")(ord.queryExecution.toRdd.count())
    time("li JOIN ord")(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.toRdd.count())
    time("li JOIN ord -> agg(custkey)")(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .queryExecution.toRdd.count())
    time("full h10 query")(
      graft.queries.OlapQueries.queries("h10_returned_items")(spark, dir)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
