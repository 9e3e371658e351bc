package graft.pipelines

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Schemas
import graft.sources.{SynapseStore, Tsv}

/** The reference's full study lifecycle as one callable (SURVEY §3:
  * `clinical.py main` → `maf.py main` → `validate.py main` →
  * `load.py` store): inputs fetched from the Synapse-shaped entity
  * store by id (`syn.get` at the head), Spark plans in between, and
  * every produced required output stored back under one version
  * comment (`syn.store` at the tail, `load.py:38-82`). The pieces are
  * the already-tested pipeline stages — this object only sequences
  * them the way the reference's CLIs do.
  */
object StudyRunner {

  /** The synIds a study run consumes (the reference passes these as
    * CLI arguments / constants, e.g. `clinical.py:319`, `maf.py:23`).
    */
  case class StudyInputs(clinicalId: String, oncotreeId: String, neoId: String,
                         attrMappingId: String, attrMetaId: String,
                         oncotreeNamesId: String, mafFolderId: String,
                         annotationsId: String)

  case class StudyResult(outDir: String,
                         clinicalChecks: Seq[(String, Long, Boolean)],
                         validation: Seq[(String, String, Boolean)],
                         storedOutputs: Map[String, String],
                         missingOutputs: Seq[String])

  /** `strictUpload = true` makes a missing required output fail the run
    * (the reference's `syn.store(File(...))` raises on an absent path —
    * `load.py:57-66`); the default records the absences in
    * [[StudyResult.missingOutputs]] and warns, for studies that
    * legitimately carry a subset of the global data types.
    */
  /** `partedSink = true` writes the clinical outputs as distributed cbio
    * dataset directories (one part per partition, header per part) —
    * the 100× mode; default keeps the reference's single-file surface.
    */
  def run(spark: SparkSession, storeRoot: String, in: StudyInputs,
          dataset: String, studyId: String, outDir: String,
          outputFolderId: String, versionComment: String,
          strictUpload: Boolean = false,
          partedSink: Boolean = false): StudyResult = {
    def fetch(id: String): DataFrame =
      spark.read.format("synapse").option("store", storeRoot).load(id)

    // --- §3.1 clinical main: preprocess -> enrich -> split -> export
    val attrMapping = fetch(in.attrMappingId)
    // V16 rides the export write as an observe metric (zero extra pass);
    // read back below once the clinical export has materialized the plan
    val (pre, neoObs, neoRules) = ClinicalPipeline.preprocessObserved(
      fetch(in.clinicalId), fetch(in.oncotreeId), fetch(in.neoId), attrMapping)
    // J4: oncotree code -> cancer-type names via broadcast lookup (the
    // reference shells out to a converter tool here, clinical.py:477-496)
    val enriched = pre.join(
      broadcast(fetch(in.oncotreeNamesId)), Seq("ONCOTREE_CODE"), "left")
    val (patient, sample) = ClinicalPipeline.splitPatientSample(enriched, attrMapping)
    val exportChecks = ClinicalPipeline.exportDataset(
      patient, sample, dataset, fetch(in.attrMetaId), studyId, outDir,
      partedSink = partedSink)
    // the export writes above materialized the observed chain — the V16
    // metric is ready without any extra job
    val clinicalChecks =
      exportChecks ++ graft.validation.Rules.observedRows(neoObs, neoRules)
    ClinicalPipeline.writeClinicalMetas(outDir, studyId)

    // --- §3.2 maf main: folder merge -> annotate -> postprocess -> write
    val maf = MafPipeline.readAndMergeMafsFromStore(spark, storeRoot, in.mafFolderId)
      .getOrElse(throw new IllegalArgumentException(
        s"no .maf children under ${in.mafFolderId}"))
    val (annotated, _) = MafPipeline.annotate(maf, fetch(in.annotationsId))
    MafPipeline.writeOutputs(MafPipeline.postprocess(annotated), studyId, outDir)

    // --- load.py --create_case_lists (cases_all + cases_sequenced)
    val sampleOut = Tsv.read(spark, s"$outDir/data_clinical_sample.txt", comment = Some('#'))
    val mafOut = Tsv.read(spark, s"$outDir/data_mutations.txt", comment = Some('#'))
    LoadPipeline.generateCaseLists(sampleOut, mafOut, studyId, s"$outDir/case_lists")

    // --- §3.3 validate main: cross-file report over what was written
    val validation = StudyValidator.report(spark, outDir, neo = Some(fetch(in.neoId)))

    // --- load.py --upload: store back every produced required output
    // verbatim (files as-is, like syn.store(File(...)) — load.py:57-66),
    // plus the case-list folder's children
    val caseLists = Option(Paths.get(outDir, "case_lists").toFile.listFiles())
      .map(_.toSeq.map(f => s"case_lists/${f.getName}")).getOrElse(Seq.empty)
    // a required output that is absent at upload time must not vanish
    // silently: strict mode fails like the reference's syn.store would,
    // lenient mode records + warns
    val missingOutputs = Schemas.RequiredOutputFiles
      .filterNot(f => Files.exists(Paths.get(outDir, f)))
    if (missingOutputs.nonEmpty) {
      val msg = s"study upload $studyId: required outputs absent: " +
        missingOutputs.mkString(", ")
      if (strictUpload) throw new IllegalStateException(msg)
      System.err.println(s"[graft] WARN $msg")
    }
    val stored = (Schemas.RequiredOutputFiles ++ caseLists)
      .filter(f => Files.exists(Paths.get(outDir, f)))
      .map { f =>
        // case lists land under a child folder, as the reference's
        // Folder("case_lists", parent=output) does (load.py:68-74)
        val parent = if (f.startsWith("case_lists/"))
          s"$outputFolderId/case_lists" else outputFolderId
        f -> SynapseStore.storeFile(storeRoot, Paths.get(outDir, f).toString,
          Paths.get(f).getFileName.toString, parent, versionComment)
      }.toMap
    StudyResult(outDir, clinicalChecks, validation, stored, missingOutputs)
  }
}
