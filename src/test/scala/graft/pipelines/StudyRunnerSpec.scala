package graft.pipelines

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark
import graft.sources.SynapseStore

/** The full study lifecycle end-to-end over the mock entity store:
  * syn.get-shaped input fetch → clinical preprocess/split/export → MAF
  * merge/annotate/write → case lists → cross-file validation →
  * syn.store-shaped upload of every produced output under one version
  * comment. Asserts the study package on disk AND in the store.
  */
class StudyRunnerSpec extends AnyFunSuite {
  import spark.implicits._

  private def seedInputs(root: String): StudyRunner.StudyInputs = {
    def put(df: org.apache.spark.sql.DataFrame, name: String, parent: String): String =
      SynapseStore.store(df, root, name, parent, s"seed $name")

    val clinical = Seq(
      ("s1", "p1", "ps1", "pp1", "DsA", "LUAD", "amA", Some(0), Some(231.0)),
      ("s2", "p2", null, null, "DsA", "LUAD", "amA", Some(1), Some(706.208)),
      ("s3", "p3", "ps3", "pp3", "DsA", "SKCM", "amA", Some(0), None))
      .toDF("sample_name", "patient_name", "study_sample_name", "study_patient_name",
        "Dataset", "TCGA_Study", "AMADEUS_Study", "OS_STATUS", "OS_MONTHS")
    val oncotree = Seq(("LUAD", "amA", "DsA", "LUAD"), ("SKCM", "amA", "DsA", "SKCM"))
      .toDF("TCGA_Study", "AMADEUS_Study", "Dataset", "ONCOTREE_CODE")
    val neo = Seq(("ps1", 12L)).toDF("SAMPLE_ID", "SNV")
    val attrMapping = Seq(
      ("OS_STATUS", "OS_STATUS", "PATIENT", null),
      ("OS_MONTHS", "OS_MONTHS", "PATIENT", null),
      ("SNV", "SNV", "SAMPLE", null))
      .toDF("iATLAS_attribute", "NORMALIZED_HEADER", "ATTRIBUTE_TYPE", "Case")
      .withColumn("Case", org.apache.spark.sql.functions.col("Case").cast("string"))
    val attrMeta = Seq(
      ("OS_STATUS", "Overall Survival Status", "OS status", "STRING", "1"),
      ("OS_MONTHS", "Overall Survival (Months)", "OS months", "NUMBER", "1"),
      ("SNV", "SNV Count", "Neoantigen SNV count", "NUMBER", "1"),
      ("CANCER_TYPE", "Cancer Type", "Cancer type", "STRING", "1"))
      .toDF("NORMALIZED_COLUMN_HEADER", "DISPLAY_NAME", "DESCRIPTION", "DATA_TYPE", "PRIORITY")
    val oncotreeNames = Seq(
      ("LUAD", "Lung Adenocarcinoma", "Lung Adenocarcinoma"),
      ("SKCM", "Melanoma", "Cutaneous Melanoma"))
      .toDF("ONCOTREE_CODE", "CANCER_TYPE", "CANCER_TYPE_DETAILED")
    val mafA = Seq(("ps1", "chr17", 7675000L, 7675001L, "C", "T"))
      .toDF("Tumor_Sample_Barcode", "Chromosome", "Start_Position",
        "End_Position", "Reference_Allele", "Tumor_Seq_Allele2")
    val mafB = Seq(
      ("s2", "chr12", 25245350L, 25245351L, "G", "A"),
      ("s2", "chrM", 100L, 101L, "A", "G")) // chrM: postprocess drops it
      .toDF("Tumor_Sample_Barcode", "Chromosome", "Start_Position",
        "End_Position", "Reference_Allele", "Tumor_Seq_Allele2")
    val annotations = Seq(
      ("chr17", 7675000L, 7675001L, "C", "T", "TP53", "missense_variant"),
      ("chr12", 25245350L, 25245351L, "G", "A", "KRAS", "missense_variant"))
      .toDF("Chromosome", "Start_Position", "End_Position",
        "Reference_Allele", "Tumor_Seq_Allele2", "Hugo_Symbol", "Consequence")

    StudyRunner.StudyInputs(
      clinicalId = put(clinical, "clinical.txt", "synInputs"),
      oncotreeId = put(oncotree, "oncotree_mapping.txt", "synInputs"),
      neoId = put(neo, "neoantigen.txt", "synInputs"),
      attrMappingId = put(attrMapping, "attr_mapping.txt", "synInputs"),
      attrMetaId = put(attrMeta, "attr_meta.txt", "synInputs"),
      oncotreeNamesId = put(oncotreeNames, "oncotree_names.txt", "synInputs"),
      mafFolderId = {
        SynapseStore.store(mafA, root, "a.maf", "synMafInputs")
        SynapseStore.store(mafB, root, "b.maf", "synMafInputs")
        "synMafInputs"
      },
      annotationsId = put(annotations, "annotations.txt", "synInputs"))
  }

  test("CLI mains mirror the reference's four argparse surfaces end-to-end") {
    val root = Files.createTempDirectory("cli-store").toString
    val outDir = Files.createTempDirectory("cli-out").toString
    val in = seedInputs(root)

    graft.cli.ClinicalCli.main(Array(
      "--dataset", "DsA",
      "--input_df_synid", in.clinicalId,
      "--cli_to_cbio_mapping_synid", in.attrMappingId,
      "--cli_to_oncotree_mapping_synid", in.oncotreeId,
      "--neoantigen_data_synid", in.neoId,
      "--oncotree_names_synid", in.oncotreeNamesId,
      "--attr_meta_synid", in.attrMetaId,
      "--store_root", root, "--out_dir", outDir, "--study_id", "iatlas",
      "--clear_workspace"))
    val dsDir = s"$outDir/DsA"
    assert(Files.exists(Paths.get(dsDir, "data_clinical_sample.txt")))
    assert(Files.exists(Paths.get(dsDir, "data_clinical_patient.txt")))

    graft.cli.MafCli.main(Array(
      "--dataset", "DsA",
      "--input_folder_synid", in.mafFolderId,
      "--annotations_synid", in.annotationsId,
      "--max_rows", "40000", "--study_id", "iatlas_dsa",
      "--store_root", root, "--out_dir", dsDir))
    assert(Files.exists(Paths.get(dsDir, "data_mutations.txt")))

    graft.cli.LoadCli.main(Array(
      "--dataset", "DsA", "--create_case_lists",
      "--study_dir", dsDir, "--study_id", "iatlas_dsa"))
    assert(Files.exists(Paths.get(dsDir, "case_lists/cases_all.txt")))
    assert(Files.exists(Paths.get(dsDir, "case_lists/cases_sequenced.txt")))

    // validate: non-strict prints; strict throws only when rules fail —
    // this freshly exported package must NOT trip the portal rules
    graft.cli.ValidateCli.main(Array(
      "--dataset", "DsA", "--study_dir", dsDir,
      "--neoantigen_data_synid", in.neoId, "--store_root", root))

    graft.cli.LoadCli.main(Array(
      "--dataset", "DsA", "--upload",
      "--output_folder_synid", "synCliOut",
      "--version_comment", "cli upload",
      "--study_dir", dsDir, "--study_id", "iatlas_dsa", "--store_root", root))
    val stored = SynapseStore.getChildren(root, "synCliOut").map(_._2)
    assert(stored.contains("data_clinical_sample.txt"), stored.toString)
    assert(stored.contains("data_mutations.txt"))

    // the shared test session must survive all four mains
    assert(!spark.sparkContext.isStopped)
  }

  test("full lifecycle: fetch -> pipelines -> validate -> versioned upload") {
    val root = Files.createTempDirectory("study-run").toString
    val outDir = Files.createTempDirectory("study-out").toString
    val in = seedInputs(root)
    val res = StudyRunner.run(spark, root, in, dataset = "DsA",
      studyId = "iatlas_DsA", outDir = outDir,
      outputFolderId = "synOutputs", versionComment = "round-5 export")

    // clinical export checks all passed (counts observed on the write pass)
    assert(res.clinicalChecks.nonEmpty && res.clinicalChecks.forall(_._3),
      res.clinicalChecks.toString)

    // study package on disk: clinical + mutation data, metas, case lists
    val produced = Seq("data_clinical_patient.txt", "data_clinical_sample.txt",
      "meta_clinical_patient.txt", "meta_clinical_sample.txt",
      "data_mutations.txt", "meta_mutations.txt")
    produced.foreach(f => assert(Files.exists(Paths.get(outDir, f)), f))
    assert(Files.exists(Paths.get(outDir, "case_lists/cases_all.txt")))
    assert(Files.exists(Paths.get(outDir, "case_lists/cases_sequenced.txt")))

    // chrM dropped by postprocess; annotation joined
    val maf = graft.sources.Tsv.read(spark, s"$outDir/data_mutations.txt")
    assert(maf.count() == 2)
    assert(maf.filter(org.apache.spark.sql.functions.col("Chromosome") === "chrM").count() == 0)
    assert(maf.columns.contains("Hugo_Symbol") && maf.columns.contains("Annotation_Status"))

    // V18: the produced package passes every portal-validator rule
    val portalNames = Set("maf_chromosome_valid", "maf_extent_valid",
      "maf_allele_valid", "maf_mutation_status_valid", "maf_barcode_present",
      "maf_ncbi_build_consistent", "maf_barcode_in_samples",
      "case_list_ids_in_samples", "sample_patient_in_patients",
      "no_dup_sample_id")
    val portal = res.validation.filter { case (r, _, _) =>
      r.startsWith("portal_") || portalNames(r) }
    assert(portal.nonEmpty)
    portal.foreach { case (r, v, ok) => assert(ok, s"$r value=$v") }

    // validation: only the data types this study does not carry are missing
    val missing = res.validation.collectFirst { case ("required_files", d, _) => d }.get
    assert(missing.split(",").toSet == Set(
      "data_gene_signatures.txt", "meta_gene_signatures.txt",
      "data_rna_seq_mrna.txt", "meta_rna_seq_mrna.txt"), missing)
    // absent required outputs are surfaced, not silently skipped; strict
    // mode fails the run like the reference's syn.store on a missing path
    assert(res.missingOutputs.toSet == missing.split(",").toSet)
    assertThrows[IllegalStateException] {
      StudyRunner.run(spark, root, in, dataset = "DsA",
        studyId = "iatlas_DsA_strict", outDir = outDir,
        outputFolderId = "synOutStrict", versionComment = "strict",
        strictUpload = true)
    }

    // upload: every produced output stored verbatim at version 1 with the comment
    assert(res.storedOutputs.keySet.filterNot(_.startsWith("case_lists/")) == produced.toSet)
    // 2 per-cancer-type lists (K3) + cases_all + cases_sequenced (load.py)
    assert(res.storedOutputs.keySet.count(_.startsWith("case_lists/")) == 4)
    res.storedOutputs.foreach { case (f, id) =>
      assert(SynapseStore.latestVersion(root, id).contains(1L), f)
      assert(SynapseStore.versionComment(root, id, 1L).contains("round-5 export"), f)
    }
    // the stored sample file round-trips through the synapse read format
    val sampleBack = spark.read.format("synapse").option("store", root)
      .load(res.storedOutputs("data_clinical_sample.txt"))
    assert(sampleBack.count() == 3)
    assert(sampleBack.columns.contains("CANCER_TYPE"))

    // a second run = a new entity version, same ids (Synapse semantics)
    val outDir2 = Files.createTempDirectory("study-out2").toString
    val res2 = StudyRunner.run(spark, root, in, "DsA", "iatlas_DsA", outDir2,
      "synOutputs", "round-5 export v2")
    assert(res2.storedOutputs == res.storedOutputs, "re-store must hit the same entities")
    res2.storedOutputs.foreach { case (f, id) =>
      assert(SynapseStore.latestVersion(root, id).contains(2L), f)
      assert(SynapseStore.versionComment(root, id, 2L).contains("round-5 export v2"), f)
    }
  }
}
