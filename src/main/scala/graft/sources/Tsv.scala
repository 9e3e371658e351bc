package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Format12g.format12g

/** TSV source/sink layer reproducing the reference's file surface
  * (SURVEY §2.1):
  *  - S2/S3/S4: `pd.read_csv(sep="\t", comment="#")` scans
  *  - K1: `to_csv(sep="\t", index=False, float_format="%.12g")` sink
  *  - K3: case-list text files (key-value header + tab-joined id list)
  *  - K4: meta key-value files
  *
  * The row sink is fully distributed (each column formatted by a codegen'd
  * expression, lines assembled with `concat_ws`); single-file outputs
  * coalesce to one partition and are renamed into place — the reference's
  * outputs are small per-dataset files, while big exports should use
  * `writeTsvDir` (multi-part, no coalesce).
  */
object Tsv {

  /** `multiLine` enables quoted records with embedded newlines (pandas
    * reads them by default; Spark must opt in). Costs splittability — a
    * multiLine file is read by ONE task — so leave it off unless the data
    * actually embeds newlines.
    */
  def read(spark: SparkSession, path: String,
           comment: Option[Char] = None,
           inferSchema: Boolean = true,
           schema: Option[StructType] = None,
           multiLine: Boolean = false): DataFrame = {
    var r = spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "")
      .option("multiLine", multiLine.toString)
      // doubled-quote escaping (RFC 4180 / pandas), not backslash
      .option("escape", "\"")
    comment.foreach(c => r = r.option("comment", c.toString))
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None    => r.option("inferSchema", inferSchema.toString).csv(path)
    }
  }

  /** [[read]] over many files in ONE distributed scan. Only safe when
    * every file carries the SAME header (multi-file CSV binds each file
    * to the first file's header positionally) — callers group by header
    * first (see MafPipeline.mergeByHeader).
    */
  def readMany(spark: SparkSession, paths: Seq[String],
               comment: Option[Char] = None,
               inferSchema: Boolean = true,
               multiLine: Boolean = false): DataFrame = {
    var r = spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "")
      .option("multiLine", multiLine.toString)
      .option("escape", "\"")
      .option("inferSchema", inferSchema.toString)
    comment.foreach(c => r = r.option("comment", c.toString))
    r.csv(paths: _*)
  }

  /** Format one column to its TSV string per the reference's serialization:
    * doubles/floats via `%.12g`, everything else via cast-to-string; null →
    * empty string (pandas `to_csv` NaN rendering). Values containing the
    * separator, a newline/CR, or a quote are minimally quoted with doubled
    * inner quotes (pandas QUOTE_MINIMAL) — Spark's CSV reader unquotes
    * them back, so embedded tabs round-trip instead of corrupting rows.
    */
  def cellToString(df: DataFrame, field: StructField): Column = {
    val c = graft.functions.Fns.qcol(field.name)
    val s = field.dataType match {
      case DoubleType            => format12g(c)
      case FloatType             => format12g(c.cast(DoubleType))
      case TimestampType         => date_format(c, "yyyy-MM-dd HH:mm:ss")
      case DateType              => date_format(c, "yyyy-MM-dd")
      case _                     => c.cast(StringType)
    }
    val quoted = when(s.rlike("[\t\n\r\"]"),
      concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\""))).otherwise(s)
    coalesce(quoted, lit("")) // concat_ws would silently drop nulls
  }

  /** The whole frame as one `line` string column (header not included). */
  def toLines(df: DataFrame): DataFrame = {
    val cells = df.schema.fields.map(f => cellToString(df, f))
    df.select(concat_ws("\t", cells.toIndexedSeq: _*).as("line"))
  }

  def headerLine(df: DataFrame): String = df.columns.mkString("\t")

  /** Distributed multi-part TSV sink for at-scale exports. */
  def writeTsvDir(df: DataFrame, dir: String): Unit =
    toLines(df).write.mode("overwrite").option("header", "false").text(dir)

  /** Single-file TSV with optional `#`-prefixed header block (the
    * cBioPortal 5-line clinical header) — K1 + the header-insertion step
    * the reference delegates to a subprocess
    * (reference `clinical.py:550-620`). Small per-dataset outputs only.
    */
  def writeTsvFile(df: DataFrame, file: String, headerBlock: Seq[String] = Nil): Unit = {
    val target = Paths.get(file)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempDirectory("graft-tsv")
    val tmpOut = tmp.resolve("out").toString
    toLines(df).coalesce(1).write.option("header", "false").text(tmpOut)
    val part = Files.list(Paths.get(tmpOut)).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmpOut"))
    val sb = new StringBuilder
    headerBlock.foreach { h => sb.append(h).append('\n') }
    sb.append(headerLine(df)).append('\n')
    Files.write(target, sb.toString.getBytes(StandardCharsets.UTF_8))
    // stream the part file into place — never the whole file through a
    // driver-side byte array (use partedSink/writeTsvDir for outputs too
    // big for a single coalesced file at all)
    val out = Files.newOutputStream(target, StandardOpenOption.APPEND)
    try Files.copy(part, out) finally out.close()
    deleteRecursively(tmp)
  }

  /** K3 — one case-list file per group key: 5 key-value lines with the ids
    * tab-joined (reference `clinical.py:683-718`, template
    * `clinical.py:56-62`). The group/collect runs distributed; only the
    * tiny (cancer_type → ids) result is collected.
    */
  def writeCaseLists(df: DataFrame, keyCol: String, idCol: String,
                     studyId: String, outDir: String): Seq[Path] = {
    val grouped = df
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col(idCol).cast(StringType))).as("ids"))
      .collect()
    Files.createDirectories(Paths.get(outDir))
    grouped.toIndexedSeq.map { row =>
      val rawType = row.getString(0)
      val cancerType = graft.functions.Fns.sanitizeCancerType(rawType)
      val ids = row.getSeq[String](1)
      val stableId = s"${studyId}_$cancerType"
      val content =
        s"""cancer_study_identifier: $studyId
           |stable_id: $stableId
           |case_list_name: Samples - $cancerType
           |case_list_description: All samples ($cancerType)
           |case_list_ids: ${ids.mkString("\t")}
           |""".stripMargin
      val p = Paths.get(outDir, s"cases_$cancerType.txt")
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      p
    }
  }

  /** K4 — key-value meta file (reference `clinical.py:623-656`). */
  def writeMetaFile(file: String, entries: Seq[(String, String)]): Path = {
    val p = Paths.get(file)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, entries.map { case (k, v) => s"$k: $v" }
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** K7 — workspace clear (reference `utils.py:104-111`). */
  def clearDir(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) deleteRecursively(p)
    Files.createDirectories(p)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
