package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** Round-trip tests of the TSV source/sink surface (SURVEY §2.1 S2-S4/K1/K3/K4):
  * %.12g floats, null → empty cell, #-header block, case lists, meta files.
  */
class TsvSpec extends AnyFunSuite {
  import spark.implicits._

  test("K1 single-file sink: %.12g floats, null as empty, header first") {
    val tmp = Files.createTempDirectory("tsv-spec").toString
    val f = s"$tmp/out.tsv"
    val df = Seq(
      (1L, Some(0.1), Some("a")),
      (2L, Some(3.0), None),
      (3L, None: Option[Double], Some("c"))
    ).toDF("id", "x", "s")
    Tsv.writeTsvFile(df, f)
    val lines = Files.readAllLines(Paths.get(f))
    assert(lines.get(0) == "id\tx\ts")
    assert(lines.get(1) == "1\t0.1\ta")
    assert(lines.get(2) == "2\t3\t")   // integral float without .0; null → empty
    assert(lines.get(3) == "3\t\tc")
    assert(lines.size == 4)
  }

  test("S3/S4 re-read skips the #-prefixed header block (cBioPortal 5-line header)") {
    val tmp = Files.createTempDirectory("tsv-spec").toString
    val f = s"$tmp/hdr.tsv"
    val df = Seq((1L, "x"), (2L, "y")).toDF("PATIENT_ID", "VAL")
    Tsv.writeTsvFile(df, f,
      headerBlock = Seq("#Patient ID\tValue", "#desc1\tdesc2", "#STRING\tSTRING", "#1\t1"))
    val back = Tsv.read(spark, f, comment = Some('#'))
    assert(back.columns.toSeq == Seq("PATIENT_ID", "VAL"))
    assert(back.count() == 2)
  }

  test("cells with tabs/quotes/newlines round-trip via minimal quoting") {
    val tmp = java.nio.file.Files.createTempDirectory("tsv-quote").toString
    val f = s"$tmp/q.tsv"
    val df = Seq(
      (1L, "plain"),
      (2L, "has\ttab"),
      (3L, "has \"quotes\""),
      (4L, "multi\nline")).toDF("id", "v")
    Tsv.writeTsvFile(df, f)
    val back = Tsv.read(spark, f, inferSchema = false, multiLine = true)
      .selectExpr("CAST(id AS LONG) AS id", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back(1L) == "plain")
    assert(back(2L) == "has\ttab")
    assert(back(3L) == "has \"quotes\"")
    assert(back(4L) == "multi\nline")
  }

  test("roundtrip preserves values through write+read") {
    val tmp = Files.createTempDirectory("tsv-spec").toString
    val f = s"$tmp/rt.tsv"
    val df = Seq((1L, 1.5, "a"), (2L, 231.0 / 30.44, "b")).toDF("id", "x", "s")
    Tsv.writeTsvFile(df, f)
    val back = Tsv.read(spark, f).orderBy("id").collect()
    assert(back(0).getDouble(1) == 1.5)
    assert(math.abs(back(1).getDouble(1) - 7.58869908016) < 1e-11)
  }

  test("K3 case lists: one file per sanitized type, ids tab-joined, 5 lines") {
    val tmp = Files.createTempDirectory("tsv-spec").toString
    val df = Seq(("Lung Cancer", "s1"), ("Lung Cancer", "s2"), ("NA", "s3"))
      .toDF("CANCER_TYPE", "SAMPLE_ID")
    val written = Tsv.writeCaseLists(df, "CANCER_TYPE", "SAMPLE_ID", "study1", tmp)
    assert(written.map(_.getFileName.toString).toSet ==
      Set("cases_Lung_Cancer.txt", "cases_no_oncotree_code.txt"))
    val lung = Files.readAllLines(Paths.get(tmp, "cases_Lung_Cancer.txt"))
    assert(lung.get(0) == "cancer_study_identifier: study1")
    assert(lung.get(1) == "stable_id: study1_Lung_Cancer")
    assert(lung.get(4) == "case_list_ids: s1\ts2")
  }

  test("K4 meta file: key-value lines") {
    val tmp = Files.createTempDirectory("tsv-spec").toString
    Tsv.writeMetaFile(s"$tmp/meta_study.txt", Seq(
      "cancer_study_identifier" -> "study1",
      "reference_genome" -> "hg38"))
    val lines = Files.readAllLines(Paths.get(tmp, "meta_study.txt"))
    assert(lines.get(0) == "cancer_study_identifier: study1")
    assert(lines.get(1) == "reference_genome: hg38")
  }

  test("K7 clearDir: recreates an empty dir") {
    val tmp = Files.createTempDirectory("tsv-spec").toString
    Files.writeString(Paths.get(tmp, "junk.txt"), "x")
    Tsv.clearDir(tmp)
    assert(Files.list(Paths.get(tmp)).count() == 0)
  }
}
