package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Component timing of v18_portal_rules CONSTRUCTION at small SF
  * (optimization r14) — which of the driver-side package build, the
  * fused field pass, and the containment jobs owns the ~3.7 s. */
object V18Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.validation.{PortalRules, Rules}
    import graft.queries.RefQueries

    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"[v18p] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f  ($r)")
    }

    // warm everything once (durable MAF, codegen)
    RefQueries.queries("v18_portal_rules")(spark, sfDir).queryExecution.toRdd.count()

    val customer = Tables.customer(spark, sfDir)
    val pk = pmod(col("c_custkey"), lit(1000L))
    def mkSamples(df: org.apache.spark.sql.DataFrame) = df.select(
      concat(lit("S"), col("c_custkey").cast(StringType)).as("SAMPLE_ID"),
      concat(lit("P"), pk.cast(StringType)).as("PATIENT_ID"),
      col("c_mktsegment").as("CANCER_TYPE"))
    val samples = mkSamples(customer)
    val patients = customer.filter(pmod(pk, lit(97L)) =!= 0L)
      .select(concat(lit("P"), pk.cast(StringType)).as("PATIENT_ID")).distinct()
    val maf = {
      val m = RefQueries.getClass.getDeclaredMethod("v18Maf", classOf[SparkSession], classOf[String])
      m.setAccessible(true)
      m.invoke(RefQueries, spark, sfDir).asInstanceOf[org.apache.spark.sql.DataFrame]
    }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      t("mafFieldRules construct")(PortalRules.mafFieldRules(maf).size)
      val fr = PortalRules.mafFieldRules(maf)
      t("field fused pass exec")(Rules.evaluate(spark, maf, fr).collect().length)
      t("subsetViolations s->p")(PortalRules.subsetViolations(samples, "PATIENT_ID", patients, "PATIENT_ID"))
      t("barcodes anti-join")(
        maf.groupBy(col("Tumor_Sample_Barcode").as("bk")).agg(count(lit(1)).as("n"))
          .join(samples.select(col("SAMPLE_ID").as("bk")).distinct(), Seq("bk"), "left_anti")
          .agg(coalesce(sum(col("n")), lit(0L)), count(col("bk"))).head())
      t("dup sample")(Rules.evaluate(spark, samples, Seq(Rules.noKeyedDups("SAMPLE_ID"))).head().getLong(1))
      t("dup patient")(Rules.evaluate(spark, patients, Seq(Rules.noKeyedDups("PATIENT_ID"))).head().getLong(1))
      t("orphans")(PortalRules.subsetViolations(patients, "PATIENT_ID", samples, "PATIENT_ID", distinctChild = true))
      t("gene consistency")(PortalRules.hugoEntrezInconsistencies(maf))
      t("full query construct")(RefQueries.queries("v18_portal_rules")(spark, sfDir).count())
    }
    spark.stop()
  }
}
