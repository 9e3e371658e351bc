package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder,
  WriterCommitMessage}
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
  *
  * The WRITE side (the reference's `save_to_synapse`, `load.py:38-82`)
  * is the same format produced distributed: each task streams its
  * partition to a staged part file (own `#` header block + header row,
  * QUOTE_MINIMAL cells, `%.12g` doubles — byte-compatible with the K1
  * sink), and the driver-side commit renames staged files into place and
  * bumps a `_version.json` sidecar carrying the Synapse-style version
  * number and `version_comment`. Uncommitted attempts never become
  * visible (readers skip `_`-prefixed files), so a failed or speculative
  * task leaves no partial data — the rename-on-commit protocol that keeps
  * a 1000-task write exactly-once without any coordination beyond the
  * driver's commit message collection.
  *
  *   df.write.format("cbio").option("versionComment", "v2 refresh")
  *     .mode("overwrite").save(dir)     // or mode("append")
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
  /** The version sidecar the write path maintains (Synapse entity
    * versioning, reference `load.py:58-66`): bumped on every committed
    * write, carrying the caller's `version_comment`.
    */
  val VersionSidecar = "_version.json"

  /** Data files only: sidecars, staging files and FS markers (`_`/`.`
    * prefixes) are invisible to readers — exactly how Spark's own file
    * index treats `_SUCCESS`.
    */
  private[sources] def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  private[sources] def listDataFiles(fs: FileSystem, dir: Path): Array[Path] =
    fs.listStatus(dir).filter(_.isFile).map(_.getPath)
      .filter(p => isDataFile(p.getName)).sortBy(_.getName)

  /** (version, comment) from the sidecar, if the dataset has been written
    * through the cbio sink; None for hand-assembled directories.
    */
  def currentVersion(path: String): Option[(Long, String)] = {
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, Bridge.activeHadoopConf())
    val sidecar = new Path(dir, VersionSidecar)
    if (!fs.exists(sidecar)) None
    else {
      val in = fs.open(sidecar)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val version = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong)
      val comment = """"comment"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(text)
        .map(m => CbioWriteSupport.unescapeJson(m.group(1)))
      version.map(v => (v, comment.getOrElse("")))
    }
  }

  /** Lines of the header block + the column header line of a file (for a
    * directory: of its first data file — all parts share the schema).
    */
  private[sources] def headerLines(path: String): (Seq[String], String) = {
    var p = new Path(path)
    val fs = FileSystem.get(p.toUri, Bridge.activeHadoopConf())
    if (fs.getFileStatus(p).isDirectory) {
      val files = listDataFiles(fs, p)
      require(files.nonEmpty, s"no data files in $path")
      p = files.head
    }
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
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"cbio:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CbioScanBuilder(path, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CbioWriteBuilder(path, info)
}

private[sources] class CbioScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Best-effort pushdown with re-check: supported predicates are
    * evaluated inside the reader — a non-matching line is dropped before
    * any UTF8String/InternalRow materialization — and EVERY filter is
    * also returned as residual, so Spark re-applies it above the scan.
    * The reader may therefore only drop rows the real predicate drops;
    * it can never wrongly keep (Spark re-checks) and never wrongly drop
    * (eval mirrors SQL null/NaN semantics, see [[CbioFilterEval]]).
    */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(CbioFilterEval.supported(full, _))
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def description(): String =
      s"cbio $path, PushedFilters: [${pushed.mkString(", ")}], " +
        s"ReadSchema: ${required.simpleString}"

    override def planInputPartitions(): Array[InputPartition] = {
      val p = new Path(path)
      val fs = FileSystem.get(p.toUri, Bridge.activeHadoopConf())
      val files =
        if (fs.getFileStatus(p).isDirectory)
          CbioTsvSource.listDataFiles(fs, p).map(_.toString)
        else Array(path)
      files.map(f => CbioInputPartition(f): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new CbioReaderFactory(full.fieldNames, required, full, pushed,
        Bridge.serializableConf())
  }
}

/** Row-level evaluation of pushed V2 filters over raw TSV cells,
  * mirroring Spark's SQL semantics exactly: comparisons with a NULL cell
  * are null → row dropped (except IsNull); doubles order with NaN
  * greatest and NaN = NaN true (Spark's double ordering). Only
  * single-column leaf predicates are pushed — compound/unknown filters
  * stay residual-only.
  */
private[sources] object CbioFilterEval {
  import org.apache.spark.sql.sources._

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _)            => leaf(schema, a)
    // inequalities only on numeric columns: Java String.compareTo is
    // UTF-16 code-unit order, Spark's UTF8String is byte (code point)
    // order — they disagree on surrogate-vs-+ ranges, and a pushed
    // eval must never drop a row Spark's residual would keep
    case GreaterThan(a, _)        => num(schema, a)
    case GreaterThanOrEqual(a, _) => num(schema, a)
    case LessThan(a, _)           => num(schema, a)
    case LessThanOrEqual(a, _)    => num(schema, a)
    case In(a, _)                 => leaf(schema, a)
    case IsNull(a)                => leaf(schema, a)
    case IsNotNull(a)             => leaf(schema, a)
    case StringStartsWith(a, _)   => str(schema, a)
    case StringEndsWith(a, _)     => str(schema, a)
    case StringContains(a, _)     => str(schema, a)
    case _                        => false
  }

  private def leaf(schema: StructType, a: String): Boolean =
    schema.fieldNames.contains(a)
  private def str(schema: StructType, a: String): Boolean =
    schema.fieldNames.contains(a) && schema(a).dataType == StringType
  private def num(schema: StructType, a: String): Boolean =
    schema.fieldNames.contains(a) && schema(a).dataType == DoubleType

  /** Spark double ordering: NaN is greatest and equal to itself; -0.0
    * normalizes equal to 0.0.
    */
  private def cmp(a: Double, b: Double): Int =
    java.lang.Double.compare(if (a == 0.0) 0.0 else a, if (b == 0.0) 0.0 else b)

  private def cmpAny(cell: Any, v: Any): Option[Int] = (cell, v) match {
    case (null, _) | (_, null) => None
    case (c: Double, x: Number) => Some(cmp(c, x.doubleValue()))
    case (c: String, x: String) => Some(c.compareTo(x))
    case _ => None
  }

  /** cellOf returns the TYPED cell value (String / java.lang.Double) or
    * null; rows where `eval` is false are dropped pre-materialization.
    */
  def eval(f: Filter, cellOf: String => Any): Boolean = f match {
    case IsNull(a)    => cellOf(a) == null
    case IsNotNull(a) => cellOf(a) != null
    case EqualTo(a, v)            => cmpAny(cellOf(a), v).contains(0)
    case GreaterThan(a, v)        => cmpAny(cellOf(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpAny(cellOf(a), v).exists(_ >= 0)
    case LessThan(a, v)           => cmpAny(cellOf(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmpAny(cellOf(a), v).exists(_ <= 0)
    case In(a, vs)                => vs.exists(v => cmpAny(cellOf(a), v).contains(0))
    case StringStartsWith(a, p) =>
      cellOf(a) match { case s: String => s.startsWith(p); case _ => false }
    case StringEndsWith(a, p) =>
      cellOf(a) match { case s: String => s.endsWith(p); case _ => false }
    case StringContains(a, p) =>
      cellOf(a) match { case s: String => s.contains(p); case _ => false }
    case _ => true // unknown: keep, Spark's residual decides
  }
}

private[sources] case class CbioInputPartition(file: String) extends InputPartition

private[sources] class CbioReaderFactory(allNames: Array[String], required: StructType,
                                         full: StructType,
                                         filters: Array[org.apache.spark.sql.sources.Filter],
                                         conf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[CbioInputPartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val fs = FileSystem.get(p.toUri, conf.value)
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
      // pushed-filter access path: column name -> (file cell idx, numeric?)
      private val filterCols: Map[String, (Int, Boolean)] =
        filters.flatMap(_.references).distinct.collect {
          case name if headerIdx.contains(name) =>
            name -> (headerIdx(name), full(name).dataType == DoubleType)
        }.toMap
      private var current: Array[String] = _

      private def typedCell(name: String): Any = filterCols.get(name) match {
        case Some((idx, numeric)) =>
          val cell = if (idx < current.length) current(idx) else ""
          if (cell.isEmpty) null
          else if (numeric) parseNumber(cell)
          else cell
        case None => null
      }

      override def next(): Boolean = {
        current = readRecord()
        while (current != null && !filters.forall(CbioFilterEval.eval(_, typedCell)))
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

private[sources] class CbioWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false

  // mode("overwrite") plans OverwriteByExpression(true) -> truncate()
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = {
    CbioWriteSupport.validateSchema(info.schema())
    new CbioWrite(path, info.schema(), info.queryId(),
      Option(info.options.get("versionComment")), truncateFirst)
  }
}

private[sources] class CbioWrite(path: String, schema: StructType, queryId: String,
                                 comment: Option[String], truncateFirst: Boolean)
    extends Write {
  override def toBatch: BatchWrite =
    new CbioBatchWrite(path, schema, queryId, comment, truncateFirst)
}

/** Task commit message: the staged file this attempt produced (None for an
  * empty partition — no header-only part files clutter the dataset).
  */
private[sources] case class CbioCommit(partitionId: Int, staged: Option[String])
    extends WriterCommitMessage

private[sources] class CbioBatchWrite(path: String, schema: StructType, queryId: String,
                                      comment: Option[String], truncateFirst: Boolean)
    extends BatchWrite {

  private def fs(): (FileSystem, Path) = {
    val dir = new Path(path)
    (FileSystem.get(dir.toUri, Bridge.activeHadoopConf()), dir)
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val (hfs, dir) = fs()
    hfs.mkdirs(dir) // driver-side, before any task runs
    CbioWriterFactory(path, schema, queryId, Bridge.serializableConf())
  }

  /** Driver-side commit: the only place staged data becomes visible.
    * Renames are per-file metadata operations — no data moves — so the
    * commit is O(parts) regardless of data size. Order matters for
    * overwrite: the new parts are renamed into place FIRST, the previous
    * version's files (distinguishable by queryId in the name) deleted
    * after — a crash mid-commit can expose old+new parts together for
    * one overwrite window, but never loses the previous version while
    * showing a partial new one. The version sidecar is written last: a
    * crash before it leaves a readable dataset and a stale version,
    * never a torn file.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (hfs, dir) = fs()
    val priorVersion = CbioTsvSource.currentVersion(path).map(_._1).getOrElse(0L)
    messages.collect { case CbioCommit(pid, Some(staged)) =>
      val target = new Path(dir, f"part-$pid%05d-$queryId.cbio.txt")
      if (!hfs.rename(new Path(staged), target))
        throw new java.io.IOException(s"cbio commit: rename $staged -> $target failed")
    }
    if (truncateFirst) {
      // delete only files NOT named by this commit's exact part pattern
      // (substring matching could both spare and destroy the wrong files
      // if one queryId were a prefix of another). Concurrent overwrites
      // of one dataset path remain unsupported: two committers would
      // each delete the other's freshly renamed parts — use the
      // SynapseStore claim-file path for contended writes.
      // \d{5,}: f"part-$pid%05d" widens past 5 digits at partitionId
      // >= 100000 — an exact {5} would fail to match the committer's
      // OWN freshly renamed parts there and delete them
      val ownPart = raw"part-\d{5,}-${java.util.regex.Pattern.quote(queryId)}\.cbio\.txt".r
      CbioTsvSource.listDataFiles(hfs, dir)
        .filterNot(f => ownPart.matches(f.getName))
        .foreach(hfs.delete(_, false))
    }
    dropStaging(hfs, dir) // failed/speculative attempts' leftovers
    val files = CbioTsvSource.listDataFiles(hfs, dir).map(_.getName)
    val json =
      s"""{"version": ${priorVersion + 1L},
         | "comment": "${CbioWriteSupport.escapeJson(comment.getOrElse(""))}",
         | "queryId": "${CbioWriteSupport.escapeJson(queryId)}",
         | "files": [${files.map(f => "\"" + CbioWriteSupport.escapeJson(f) + "\"").mkString(", ")}]}
         |""".stripMargin
    val out = hfs.create(new Path(dir, CbioTsvSource.VersionSidecar), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (hfs, dir) = fs()
    if (hfs.exists(dir)) dropStaging(hfs, dir)
  }

  private def dropStaging(hfs: FileSystem, dir: Path): Unit =
    hfs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(s"_staging-$queryId-"))
      .foreach(hfs.delete(_, false))
}

private[sources] case class CbioWriterFactory(path: String, schema: StructType,
                                              queryId: String,
                                              conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CbioDataWriter(path, schema, queryId, partitionId, taskId, conf)
}

private[sources] class CbioDataWriter(path: String, schema: StructType, queryId: String,
                                      partitionId: Int, taskId: Long,
                                      conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {

  private val staged = s"$path/_staging-$queryId-p$partitionId-t$taskId.cbio.txt"
  private var out: java.io.Writer = _
  private val cells = schema.fields.map(f => CbioWriteSupport.cellWriter(f.dataType))

  // opened on first row: empty partitions produce no file at all
  private def writer(): java.io.Writer = {
    if (out == null) {
      val p = new Path(staged)
      val hfs = FileSystem.get(p.toUri, conf.value)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        hfs.create(p, true), java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
      CbioWriteSupport.headerBlock(schema).foreach { l => out.write(l); out.write('\n') }
      out.write(schema.fieldNames.mkString("\t")); out.write('\n')
    }
    out
  }

  override def write(row: InternalRow): Unit = {
    val w = writer()
    var i = 0
    while (i < cells.length) {
      if (i > 0) w.write('\t')
      if (!row.isNullAt(i)) w.write(CbioWriteSupport.quoteMinimal(cells(i)(row, i)))
      i += 1
    }
    w.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    CbioCommit(partitionId, if (out != null) Some(staged) else None)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    val p = new Path(staged)
    val hfs = FileSystem.get(p.toUri, conf.value)
    if (hfs.exists(p)) hfs.delete(p, false)
  }

  override def close(): Unit = ()
}

/** Serialization rules shared by every cbio part writer — the same bytes
  * the K1 sink emits ([[Tsv.cellToString]]): `%.12g` doubles, ISO dates,
  * empty cell for null, QUOTE_MINIMAL quoting.
  */
private[sources] object CbioWriteSupport {

  def validateSchema(schema: StructType): Unit = {
    val bad = schema.fields.filterNot(f => f.dataType match {
      case StringType | DoubleType | FloatType | LongType | IntegerType |
           ShortType | ByteType | BooleanType | DateType | TimestampType => true
      case _: DecimalType => true
      case _ => false
    })
    require(bad.isEmpty,
      s"cbio sink supports flat string/numeric/boolean/date columns; " +
        s"unsupported: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
  }

  /** The 4-line `#` metadata block (display/description/datatype/priority),
    * round-tripping field metadata the reader surfaced — a cbio read →
    * transform → cbio write keeps the clinical header intact.
    */
  def headerBlock(schema: StructType): Seq[String] = {
    def meta(f: StructField, key: String, default: String): String = {
      val v = if (f.metadata.contains(key)) f.metadata.getString(key) else default
      v.replaceAll("[\t\n\r]", " ")
    }
    val display = schema.fields.map(f => meta(f, "displayName", f.name))
    val desc = schema.fields.map(f => meta(f, "description", f.name))
    // an explicit "dataType" metadata wins over the Spark-type derivation:
    // a STRING-declared attribute whose values happen to be numeric (and
    // was inferred numeric on read) must still publish STRING, and a
    // NUMBER-declared string column keeps its declaration without a
    // value-nulling cast — header parity with the attrMeta contract
    val dtype = schema.fields.map(f => meta(f, "dataType", f.dataType match {
      case _: NumericType => "NUMBER"
      case _              => "STRING"
    }))
    val prio = schema.fields.map(f => meta(f, "priority", "1"))
    Seq(display, desc, dtype, prio).map(_.mkString("#", "\t", ""))
  }

  /** Per-type cell renderer, resolved once per column — no per-row
    * dataType dispatch in the write loop.
    */
  def cellWriter(dt: DataType): (InternalRow, Int) => String = dt match {
    case StringType  => (r, i) => r.getUTF8String(i).toString
    case DoubleType  => (r, i) => graft.functions.Format12gUtil.formatString(r.getDouble(i))
    case FloatType   => (r, i) => graft.functions.Format12gUtil.formatString(r.getFloat(i).toDouble)
    case LongType    => (r, i) => r.getLong(i).toString
    case IntegerType => (r, i) => r.getInt(i).toString
    case ShortType   => (r, i) => r.getShort(i).toString
    case ByteType    => (r, i) => r.getByte(i).toString
    case BooleanType => (r, i) => r.getBoolean(i).toString
    case d: DecimalType =>
      (r, i) => r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString
    case DateType =>
      (r, i) => java.time.LocalDate.ofEpochDay(r.getInt(i).toLong).toString
    case TimestampType => // micros since epoch, rendered in UTC like the parquet fixtures
      (r, i) => {
        val us = r.getLong(i)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      }
    case other => throw new IllegalArgumentException(s"unsupported cbio cell type $other")
  }

  /** pandas QUOTE_MINIMAL: quote only cells containing a separator, line
    * break or quote; double inner quotes. Mirrors [[Tsv.cellToString]] and
    * the reader's [[CbioReaderFactory]] record scan.
    */
  def quoteMinimal(s: String): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      needs = c == '\t' || c == '\n' || c == '\r' || c == '"'
      i += 1
    }
    if (needs) "\"" + s.replace("\"", "\"\"") + "\"" else s
  }

  def escapeJson(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append("\\u%04x".format(c.toInt))
      case c => sb.append(c)
    }
    sb.toString
  }

  def unescapeJson(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
