package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the cBioPortal clinical-file format the
  * reference emits and re-reads (SURVEY §2.1 S4, K1/K3 header writer;
  * reference `clinical.py:550-620` writes it, `clinical.py:798-808`
  * re-reads it with `skiprows=4`): a TSV whose first four `#`-prefixed
  * lines carry per-column display name / description / datatype /
  * priority, then the header row, then data.
  *
  *   spark.read.format("cbio").load("data_clinical_sample.txt")
  *
  * Unlike the generic comment-skip scan (S3), this source UNDERSTANDS the
  * header block: columns declared `NUMBER` come back as DoubleType, and
  * each field carries display-name/description/priority in its
  * `Metadata` — the schema-at-rest the reference keeps in a side table.
  * Column pruning is pushed into the reader (SupportsPushDownRequiredColumns):
  * a 2-column projection parses only 2 cells per line. One InputPartition
  * per file; at scale the format stays driver-light because only schema
  * inference reads on the driver, and only the first KB of one file.
  */
class CbioTsvSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "cbio"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "cbio source requires a path")
    CbioTsvSource.inferFromFile(path)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CbioTsvTable(properties.get("path"), schema)
}

object CbioTsvSource {
  /** Lines of the header block + the column header line of a file (for a
    * directory: of its first file — all parts share the schema).
    */
  private[sources] def headerLines(path: String): (Seq[String], String) = {
    var p = new Path(path)
    val fs = FileSystem.get(p.toUri, new Configuration())
    if (fs.getFileStatus(p).isDirectory)
      p = fs.listStatus(p).filter(_.isFile).map(_.getPath).sortBy(_.getName).head
    val in = fs.open(p)
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      // explicit loop, NOT takeWhile over an Iterator.continually — that
      // would consume (and lose) the first non-# line, the column header
      val block = scala.collection.mutable.ArrayBuffer.empty[String]
      var line = reader.readLine()
      while (line != null && line.startsWith("#")) { block += line; line = reader.readLine() }
      require(line != null, s"no header row in $path")
      (block.toSeq, line)
    } finally in.close()
  }

  private[sources] def inferFromFile(path: String): StructType = {
    val (block, header) = headerLines(path)
    val names = header.split("\t", -1)
    // the writer's block: #display, #description, #datatype, #priority
    def row(i: Int): Array[String] =
      if (block.length > i) block(i).stripPrefix("#").split("\t", -1)
      else Array.empty
    val (display, desc, dtype, prio) = (row(0), row(1), row(2), row(3))
    def at(a: Array[String], i: Int): Option[String] =
      if (i < a.length && a(i).nonEmpty) Some(a(i)) else None
    StructType(names.zipWithIndex.map { case (name, i) =>
      val t = at(dtype, i) match {
        case Some("NUMBER") => DoubleType
        case _              => StringType
      }
      val mb = new MetadataBuilder()
      at(display, i).foreach(mb.putString("displayName", _))
      at(desc, i).foreach(mb.putString("description", _))
      at(prio, i).foreach(mb.putString("priority", _))
      StructField(name, t, nullable = true, mb.build())
    })
  }
}

private[sources] class CbioTsvTable(path: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"cbio:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CbioScanBuilder(path, schema)
}

private[sources] class CbioScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val p = new Path(path)
      val fs = FileSystem.get(p.toUri, new Configuration())
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
        else Array(path)
      files.map(f => CbioInputPartition(f): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new CbioReaderFactory(full.fieldNames, required)
  }
}

private[sources] case class CbioInputPartition(file: String) extends InputPartition

private[sources] class CbioReaderFactory(allNames: Array[String], required: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[CbioInputPartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val fs = FileSystem.get(p.toUri, new Configuration())
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      // skip the # block + re-read this file's header to map name -> cell
      private val headerIdx: Map[String, Int] = {
        var line = reader.readLine()
        while (line != null && line.startsWith("#")) line = reader.readLine()
        require(line != null, s"no header row in $file")
        line.split("\t", -1).zipWithIndex.toMap
      }
      private val cellIdx: Array[Int] = required.fieldNames.map(headerIdx(_))
      private val isNum: Array[Boolean] =
        required.fields.map(_.dataType == DoubleType)
      private var current: Array[String] = _

      override def next(): Boolean = {
        current = readRecord()
        current != null
      }

      /** Quote-aware record scan mirroring the K1 writer's QUOTE_MINIMAL
        * output ([[Tsv.cellToString]]): cells containing tab / newline /
        * CR / quote arrive wrapped in quotes with inner quotes doubled.
        * Char-level (not readLine) so a quoted cell can span physical
        * lines and an embedded CR survives — readLine would treat it as a
        * line terminator. Returns null at EOF.
        */
      private def readRecord(): Array[String] = {
        var ch = reader.read()
        if (ch == -1) return null
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val sb = new StringBuilder
        var inQuote = false
        var atCellStart = true
        var done = false
        while (!done) {
          if (ch == -1) {
            require(!inQuote, s"unterminated quoted cell at EOF in $file")
            done = true
          } else if (inQuote) {
            if (ch == '"') {
              val nxt = reader.read()
              if (nxt == '"') { sb.append('"'); ch = reader.read() }
              else { inQuote = false; ch = nxt }
            } else { sb.append(ch.toChar); ch = reader.read() }
          } else if (ch == '"' && atCellStart) {
            inQuote = true; atCellStart = false; ch = reader.read()
          } else if (ch == '\t') {
            out += sb.toString; sb.clear(); atCellStart = true; ch = reader.read()
          } else if (ch == '\n') {
            done = true
          } else if (ch == '\r') {
            // unquoted CR only occurs as a \r\n terminator (the writer
            // quotes any cell containing CR); a bare \r is kept literal
            ch = reader.read()
            if (ch == '\n' || ch == -1) done = true
            else { sb.append('\r'); atCellStart = false }
          } else { sb.append(ch.toChar); atCellStart = false; ch = reader.read() }
        }
        out += sb.toString
        out.toArray
      }

      /** NUMBER-cell parse matching what the paired sink can emit and what
        * cBioPortal files contain: Format12g writes `nan`/`inf`/`-inf`
        * (which Double.valueOf rejects), and upstream files carry `NA` —
        * pandas reads all of these without error, so unparseable cells
        * become null rather than a task crash.
        */
      private def parseNumber(cell: String): Any = cell match {
        case "nan" | "NaN"  => java.lang.Double.valueOf(Double.NaN)
        case "inf" | "+inf" => java.lang.Double.valueOf(Double.PositiveInfinity)
        case "-inf"         => java.lang.Double.valueOf(Double.NegativeInfinity)
        case _ =>
          try java.lang.Double.valueOf(cell)
          catch { case _: NumberFormatException => null }
      }

      override def get(): InternalRow = {
        val vals = new Array[Any](cellIdx.length)
        var i = 0
        while (i < cellIdx.length) {
          val cell = if (cellIdx(i) < current.length) current(cellIdx(i)) else ""
          vals(i) =
            if (cell.isEmpty) null
            else if (isNum(i)) parseNumber(cell)
            else UTF8String.fromString(cell)
          i += 1
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }

      override def close(): Unit = reader.close()
    }
  }
}
