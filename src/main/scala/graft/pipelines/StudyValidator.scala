package graft.pipelines

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Schemas
import graft.sources.Tsv

/** The reference's cross-file validation entry point (`validate.py main()`,
  * SURVEY §3.3): load every required output (S6), check presence (V1),
  * the MAF column contract (V13), and barcode↔neoantigen consistency
  * (V12, via [[MafPipeline.barcodesMatchNeoantigen]]).
  */
object StudyValidator {

  /** S6 — the name → DataFrame map over the study's output files
    * (reference `validate.py:175-195`); absent files map to None.
    */
  def loadAllOutputs(spark: SparkSession, dir: String,
                     files: Seq[String] = Schemas.RequiredOutputFiles): Map[String, Option[DataFrame]] =
    files.map { f =>
      val p = Paths.get(dir, f)
      f -> (if (Files.exists(p))
        Some(Tsv.read(spark, p.toString, comment = Some('#')))
      else None)
    }.toMap

  /** V1 — required files missing from the output directory. */
  def missingFiles(dir: String,
                   required: Seq[String] = Schemas.RequiredOutputFiles): Seq[String] =
    required.filterNot(f => Files.exists(Paths.get(dir, f)))

  /** V13 — the MAF column contract against [[Schemas.RequiredMafCols]]. */
  def missingMafColumns(maf: DataFrame): Seq[String] =
    MafPipeline.missingRequiredColumns(maf, Schemas.RequiredMafCols)

  /** The full cross-file report: (rule, detail, passed). */
  def report(spark: SparkSession, dir: String,
             neo: Option[DataFrame] = None): Seq[(String, String, Boolean)] = {
    val missing = missingFiles(dir)
    val outputs = loadAllOutputs(spark, dir)
    val fileRule = ("required_files", missing.mkString(","), missing.isEmpty)
    val mafRules = outputs.getOrElse("data_mutations.txt", None).toSeq.flatMap { maf =>
      val missingCols = missingMafColumns(maf)
      val colRule = ("maf_column_contract", missingCols.mkString(","), missingCols.isEmpty)
      val neoRules = neo.toSeq.flatMap { n =>
        MafPipeline.barcodesMatchNeoantigen(spark, maf, n).collect().toSeq
          .map(r => (r.getString(0), r.getLong(1).toString, r.getBoolean(2)))
      }
      colRule +: neoRules
    }
    // V18 — the portal validator's structural + strict-MAF rule set over
    // the same package (reference `validate.py:198-226` runs the external
    // validateData subprocess here; PortalRules is its native twin)
    val portalRules = graft.validation.PortalRules
      .validateStudyPackage(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1).toString, r.getBoolean(2)))
    (fileRule +: mafRules) ++ portalRules
  }
}
