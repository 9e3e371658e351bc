package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The `cbio` DataSource V2: reads the reference's headered clinical TSV
  * (4 `#`-metadata lines + header + data), typing NUMBER columns as
  * double, surfacing display-name/priority as field metadata, and pruning
  * columns inside the reader.
  */
class CbioTsvSourceSpec extends AnyFunSuite {
  import spark.implicits._

  private def writeFixture(): String = {
    val tmp = Files.createTempDirectory("cbio-src").toString
    val f = s"$tmp/data_clinical_sample.txt"
    val df = Seq(
      ("s1", "p1", Some(12.5), "LUAD"),
      ("s2", "p1", None, "BRCA"),
      ("s3", "p2", Some(3.0), "LUAD"))
      .toDF("SAMPLE_ID", "PATIENT_ID", "TMB", "CANCER_TYPE")
    Tsv.writeTsvFile(df, f, headerBlock = Seq(
      "#Sample ID\tPatient ID\tTMB Score\tCancer Type",
      "#The sample id\tThe patient id\tMutation burden\tOncotree name",
      "#STRING\tSTRING\tNUMBER\tSTRING",
      "#1\t1\t2\t1"))
    f
  }

  test("schema: NUMBER -> double, metadata from the header block") {
    val df = spark.read.format("cbio").load(writeFixture())
    val s = df.schema
    assert(s.fieldNames.toSeq == Seq("SAMPLE_ID", "PATIENT_ID", "TMB", "CANCER_TYPE"))
    assert(s("TMB").dataType == DoubleType)
    assert(s("SAMPLE_ID").dataType == StringType)
    assert(s("TMB").metadata.getString("displayName") == "TMB Score")
    assert(s("TMB").metadata.getString("priority") == "2")
    assert(s("CANCER_TYPE").metadata.getString("description") == "Oncotree name")
  }

  test("values: rows parsed, empty cell -> null, numbers typed") {
    val df = spark.read.format("cbio").load(writeFixture())
    val rows = df.collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(rows.size == 3)
    assert(rows("s1").contains(12.5))
    assert(rows("s2").isEmpty) // empty TSV cell -> null double
    assert(df.filter(col("CANCER_TYPE") === "LUAD").count() == 2)
  }

  test("column pruning reaches the reader (projection in the scan output)") {
    val df = spark.read.format("cbio").load(writeFixture()).select("SAMPLE_ID")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("SAMPLE_ID"),
      s"scan must emit only the pruned column, got ${scan.output}")
    assert(df.as[String].collect().sorted.toSeq == Seq("s1", "s2", "s3"))
  }

  test("file without a header block degrades to all-string untyped columns") {
    val tmp = Files.createTempDirectory("cbio-nohdr").toString
    val f = s"$tmp/plain.txt"
    Files.writeString(java.nio.file.Paths.get(f), "A\tB\n1\tx\n2\ty\n")
    val df = spark.read.format("cbio").load(f)
    assert(df.schema.fields.forall(_.dataType == StringType))
    assert(df.count() == 2)
    assert(df.select("A").as[String].collect().sorted.toSeq == Seq("1", "2"))
  }

  test("quoted cells (from the K1 writer) unquote on read") {
    val tmp = Files.createTempDirectory("cbio-quote").toString
    val f = s"$tmp/q.txt"
    val df = Seq(("s1", "desc with \"quotes\""), ("s2", "plain"))
      .toDF("SAMPLE_ID", "NOTE")
    Tsv.writeTsvFile(df, f)
    val back = spark.read.format("cbio").load(f)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back("s1") == "desc with \"quotes\"")
    assert(back("s2") == "plain")
  }

  test("round-trips the pipeline's own export (written by Tsv, read by cbio)") {
    val df = spark.read.format("cbio").load(writeFixture())
    // sum over the typed NUMBER column: 12.5 + 3.0, null skipped
    assert(df.agg(sum("TMB")).head().getDouble(0) == 15.5)
  }

  test("cells with embedded tabs and newlines round-trip without misalignment") {
    val tmp = Files.createTempDirectory("cbio-sep").toString
    val f = s"$tmp/sep.txt"
    val df = Seq(
      ("s1", "a\tb", "after-tab"),
      ("s2", "line1\nline2", "after-nl"),
      ("s3", "cr\rhere", "after-cr"),
      ("s4", "plain", "ok"))
      .toDF("SAMPLE_ID", "NOTE", "TRAIL")
    Tsv.writeTsvFile(df, f)
    val back = spark.read.format("cbio").load(f)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(back.size == 4) // an unquoted newline would have split s2 into 2 rows
    assert(back("s1") == ("a\tb", "after-tab")) // unquoted tab would shift TRAIL
    assert(back("s2") == ("line1\nline2", "after-nl"))
    assert(back("s3") == ("cr\rhere", "after-cr"))
    assert(back("s4") == ("plain", "ok"))
  }

  test("NUMBER cells: nan/inf/-inf (Format12g renderings) and NA parse leniently") {
    val tmp = Files.createTempDirectory("cbio-num").toString
    val f = s"$tmp/num.txt"
    // write a frame containing NaN/Inf doubles through the sink itself
    val df = Seq(
      ("s1", Double.NaN), ("s2", Double.PositiveInfinity),
      ("s3", Double.NegativeInfinity), ("s4", 1.5))
      .toDF("SAMPLE_ID", "SCORE")
    Tsv.writeTsvFile(df, f, headerBlock = Seq(
      "#Sample\tScore", "#id\tval", "#STRING\tNUMBER", "#1\t1"))
    // append an upstream-style 'NA' row (common in cBioPortal files)
    Files.writeString(java.nio.file.Paths.get(f),
      Files.readString(java.nio.file.Paths.get(f)) + "s5\tNA\n")
    val back = spark.read.format("cbio").load(f)
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(back("s1").exists(v => v.asInstanceOf[Double].isNaN))
    assert(back("s2").contains(Double.PositiveInfinity))
    assert(back("s3").contains(Double.NegativeInfinity))
    assert(back("s4").contains(1.5))
    assert(back("s5").isEmpty) // NA -> null, not a task crash
  }
}
