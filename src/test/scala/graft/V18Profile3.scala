package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does the v18 fused pass's scale-independent ~2.7 s go at
  * sf0.1? (optimization r14) — plan vs exec split, repeated runs,
  * scan-only and no-regex controls. */
object V18Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.validation.{PortalRules, Rules}
    val maf = graft.queries.RefQueries.v18Maf(spark, dir)
    maf.queryExecution.toRdd.count() // warm
    val rules = PortalRules.mafFieldRules(maf)
      .filterNot(_.name == "maf_no_dup_variants")
    def fusedDf = maf.agg(rules.head.agg.as(rules.head.name),
      rules.tail.map(r => r.agg.as(r.name)): _*)

    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[v18f] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f")
    }
    // first-time: plan + compile + exec
    (1 to 4).foreach { i =>
      val df = fusedDf
      t(s"run$i plan")(df.queryExecution.executedPlan)
      t(s"run$i exec")(df.queryExecution.toRdd.count())
    }
    // how many files/tasks does the durable MAF scan produce?
    println("[v18f] maf input partitions: " + maf.queryExecution.toRdd.getNumPartitions)
    // scan-only control over the same pruned columns
    val cols = fusedDf.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.output.map(_.name)).distinct
    println(s"[v18f] referenced cols: ${cols.size}")
    val scanOnly = maf.select(cols.map(c => col(c)): _*)
      .agg(count(lit(1)).as("n"))
    scanOnly.queryExecution.toRdd.count()
    t("scan-only agg over same cols")(scanOnly.queryExecution.toRdd.count())
    // sum(length) control: forces reading every byte of every rule column
    val lenAgg = maf.agg(
      cols.map(c => sum(length(col(c).cast("string"))).as(s"len_$c")).head,
      cols.map(c => sum(length(col(c).cast("string"))).as(s"len_$c")).tail: _*)
    lenAgg.queryExecution.toRdd.count()
    t("sum(length) all rule cols")(lenAgg.queryExecution.toRdd.count())
    spark.stop()
  }
}
