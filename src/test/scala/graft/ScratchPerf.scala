package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local profiling scratch (test scope, never shipped): stage-by-stage
  * timings for queries under optimization. Run:
  * sbt "Test/runMain graft.ScratchPerf /root/repo/testdata-sf1"
  */
object ScratchPerf {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextExprs

    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    def docs = Tables.documents(spark, dir)

    // warmup
    docs.count(); docs.select(col("text")).queryExecution.toRdd.count()

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      time("scan text only")(docs.select(col("text")).queryExecution.toRdd.count())
      time("norm only")(docs.select(norm.as("n")).queryExecution.toRdd.count())
      time("winnow explode")(
        docs.select(explode(TextExprs.winnowFingerprints(norm)).as("fp"))
          .queryExecution.toRdd.count())
      time("winnow explode + src")(
        docs.select(col("source"), explode(TextExprs.winnowFingerprints(norm)).as("fp"))
          .queryExecution.toRdd.count())
      time("sources distinct collect") {
        docs.select(col("source")).distinct().orderBy(col("source")).collect().length.toLong
      }
      time("bit_or mask agg")(
        docs.select(call_function("shiftleft", lit(1L), lit(1)).as("bit"),
            explode(TextExprs.winnowFingerprints(norm)).as("fp"))
          .groupBy(col("fp")).agg(bit_or(col("bit")).as("mask"))
          .queryExecution.toRdd.count())
      time("full new query")(
        graft.queries.TextQueries.taSourceOverlap(spark, dir)
          .queryExecution.toRdd.count())
      time("heavy_hitters")(
        graft.queries.TextQueries.taHeavyHitters(spark, dir)
          .queryExecution.toRdd.count())
      time("hh tokens explode only")(
        docs.select(col("source"),
            explode(filter(split(lower(trim(col("text"))), "\\s+"),
              t => length(t) > 0)).as("tok"))
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
