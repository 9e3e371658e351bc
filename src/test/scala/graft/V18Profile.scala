package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the v18 report's component jobs (test scope). */
object V18Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.validation.{PortalRules, Rules}
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[v18] $n%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val maf = graft.queries.RefQueries.v18Maf(spark, dir)
    time("warm lineitem scan")(graft.Tables.lineitem(spark, dir).count())
    time("maf bare scan")(maf.queryExecution.toRdd.count())
    val rules = PortalRules.mafFieldRules(maf)
    val (fused, split) = (rules.filterNot(_.name == "maf_no_dup_variants"),
      rules.filter(_.name == "maf_no_dup_variants"))
    time("fieldRules fused pass")(Rules.evaluate(spark, maf, fused).collect())
    // regex-cost isolation: same rules, same column reads (scan width
    // held constant), but the three tier-9 rlike predicates replaced by
    // a cheap non-regex check on the same column
    val regexRules = Set("maf_dbsnp_rs_format", "maf_swissprot_format",
      "maf_chromosome_no_prefix")
    val colOf = Map("maf_dbsnp_rs_format" -> "dbSNP_RS",
      "maf_swissprot_format" -> "SWISSPROT",
      "maf_chromosome_no_prefix" -> "Chromosome")
    val sansRegex = fused.map { r =>
      if (regexRules(r.name))
        Rules.Rule(r.name, sum(when(length(col(colOf(r.name))) > 1000, 1L)
          .otherwise(0L)))
      else r
    }
    time("fused pass, rlike->length")(
      Rules.evaluate(spark, maf, sansRegex).collect())
    time("dup-variant distinct job")(Rules.evaluate(spark, maf, split).collect())
    time("hugoEntrez")(PortalRules.hugoEntrezInconsistencies(maf))
    val seqIds = (1L to 500L).filter(_ % 6 != 0).map(k => s"S$k") ++ Seq("G1","G2","G3")
    val samplesSmall = graft.Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 500L)
      .select(concat(lit("S"), col("c_custkey").cast("string")).as("SAMPLE_ID"))
    time("casesSequenced")(PortalRules.casesSequencedViolations(
      spark, maf, seqIds, samplesSmall, "SAMPLE_ID"))
    val samples = graft.Tables.customer(spark, dir)
      .select(concat(lit("S"), col("c_custkey").cast("string")).as("SAMPLE_ID"))
    time("barcodes agg+anti")(
      maf.groupBy(col("Tumor_Sample_Barcode").as("bk")).agg(count(lit(1)).as("n"))
        .join(samples.select(col("SAMPLE_ID").as("bk")).distinct(), Seq("bk"), "left_anti")
        .agg(coalesce(sum(col("n")), lit(0L)), count(col("bk"))).head())
    time("full v18 (warm)")(graft.queries.RefQueries.queries("v18_portal_rules")(spark, dir)
      .queryExecution.toRdd.count())
    spark.stop()
  }
}
