package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session interleaved A/B of the v18 durable-MAF layout
  * (optimization r14): the fused 37-rule pass timed alternately against
  * the spread multi-file table (v18maf5) and a 1-file copy of the SAME
  * rows (the v18maf4 degenerate layout). Interleaving makes the
  * comparison robust to the host-level contention windows this machine
  * exhibits (r13 verdict finding 1): both arms see the same environment
  * within each round. */
object V18LayoutAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.validation.{PortalRules, Rules}

    val maf = graft.queries.RefQueries.v18Maf(spark, dir) // spread table
    val oneDir = java.nio.file.Files.createTempDirectory("v18-onefile").toString
    maf.coalesce(1).write.mode("overwrite").parquet(oneDir)
    val mafOne = spark.read.parquet(oneDir)
    println(s"[ab] spread partitions=${maf.queryExecution.toRdd.getNumPartitions} " +
      s"one-file partitions=${mafOne.queryExecution.toRdd.getNumPartitions}")

    def fused(m: org.apache.spark.sql.DataFrame) = {
      val rules = PortalRules.mafFieldRules(m).filterNot(_.name == "maf_no_dup_variants")
      m.agg(rules.head.agg.as(rules.head.name), rules.tail.map(r => r.agg.as(r.name)): _*)
    }
    // warm both
    fused(maf).queryExecution.toRdd.count()
    fused(mafOne).queryExecution.toRdd.count()
    val (as, bs) = (Array.ofDim[Double](rounds), Array.ofDim[Double](rounds))
    (0 until rounds).foreach { i =>
      var t0 = System.nanoTime(); fused(mafOne).queryExecution.toRdd.count()
      bs(i) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); fused(maf).queryExecution.toRdd.count()
      as(i) = (System.nanoTime() - t0) / 1e9
      println(f"[ab] round$i one-file=${bs(i)}%7.2f spread=${as(i)}%7.2f")
    }
    println(f"[ab] MIN one-file=${bs.min}%7.2f spread=${as.min}%7.2f")
    spark.stop()
  }
}
