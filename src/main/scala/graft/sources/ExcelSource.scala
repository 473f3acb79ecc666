package graft.sources

import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Excel-style `dataAddress` (`'Sheet Name'!A2:C10`, `Tabelle2!A1`, `B3`;
  * reference docs/file/01.Excel Ingestion.md:36-49,72-90): sheet selector
  * plus an inclusive 1-based cell range. Columns are spreadsheet letters
  * (A=1 … Z=26, AA=27 …); an open range (`A2`) means "from here to the
  * end" on both axes. */
final case class DataAddress(sheet: Option[String],
                             startRow: Int, startCol: Int,
                             endRow: Option[Int], endCol: Option[Int])

object DataAddress {
  private val Cell = "([A-Za-z]+)([0-9]+)".r

  /** `['Sheet'!]A1[:C4]`. */
  def parse(addr: String): DataAddress = {
    val (sheet, range) = addr.indexOf('!') match {
      case -1 => (None, addr.trim)
      case i  => (Some(addr.substring(0, i).trim.stripPrefix("'").stripSuffix("'")),
                  addr.substring(i + 1).trim)
    }
    range.split(":", 2) match {
      case Array(Cell(c1, r1)) =>
        DataAddress(sheet, r1.toInt, XlsxParser.colOf(c1 + "1"), None, None)
      case Array(Cell(c1, r1), Cell(c2, r2)) =>
        DataAddress(sheet, r1.toInt, XlsxParser.colOf(c1 + "1"),
          Some(r2.toInt), Some(XlsxParser.colOf(c2 + "1")))
      case _ => throw new IllegalArgumentException(s"bad dataAddress: $addr")
    }
  }
}

/** S6/S7 — a REAL native `.xlsx` DataSource V2 (`format("excel")`, the
  * reference's `HoodieExcelImporter.scala:94-98` read surface), built on
  * [[XlsxParser]] (JDK-only SpreadsheetML parsing — the format is the
  * public ECMA-376 standard).
  *
  * Options (reference parity, `hudi-on-excel.properties:2-8`):
  *   - `dataAddress`   `'Sheet'!A2:C10` — sheet + inclusive range; default
  *                     first sheet, whole used range
  *   - `header`        first in-range row is the header (default true)
  *   - `inferSchema`   long/double/boolean/string per column (default
  *                     false = all strings, like Spark csv)
  *   - `excerptSize`   rows sampled for inference (default 10 — the
  *                     reference's inference-window option)
  *
  * `load(path)` accepts globs and directories (partitioned-workbook reads,
  * docs/file/01.Excel Ingestion.md:122-131). Scale shape: one input
  * partition PER FILE — workbooks are small and indivisible (a ZIP has no
  * split points), so a glob of N workbooks reads N-wide in parallel; the
  * sheet XML itself streams through StAX. Date-styled numeric cells
  * (numFmt → `xl/styles.xml`) type as Date/Timestamp under `inferSchema`;
  * `dateFormat`/`timestampFormat` add user patterns for string cells.
  * `workbookPassword` opens ECMA-376 agile-encrypted workbooks
  * ([[OfficeCrypto]], JDK crypto only). Legacy binary `.xls` (BIFF8)
  * reads through [[XlsParser]] — the container magic, not the extension,
  * picks the parser. */
class ExcelSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "excel"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = ExcelOptions(options.asCaseSensitiveMap().asScala.toMap)
    ExcelRead.inferSchema(ExcelRead.resolveFiles(opts), opts)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ExcelTable(schema, ExcelOptions(properties.asScala.toMap))
}

/** Parsed option bag (serializable — ships to executors). Option names are
  * the reference's spark-excel surface (hudi-on-excel.properties:2-8). */
final case class ExcelOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  val address: Option[DataAddress] = ci("dataAddress").map(DataAddress.parse)
  val header: Boolean = ci("header").forall(_.trim.toBoolean)
  val inferTypes: Boolean = ci("inferSchema").exists(_.trim.toBoolean)
  val excerptSize: Int = ci("excerptSize").map(_.trim.toInt).getOrElse(10)
  /** rows to drop between the header and the data (spark-excel knob). */
  val ignoreAfterHeader: Int = ci("ignoreAfterHeader").map(_.trim.toInt).getOrElse(0)
  /** empty-string cells become nulls (default true, like spark-excel). */
  val emptyAsNull: Boolean = ci("treatEmptyValuesAsNulls").forall(_.trim.toBoolean)
  /** error cells (`t="e"`, #DIV/0! etc): type-default fallback when true,
    * null when false (default). */
  val errorsToFallback: Boolean = ci("setErrorCellsToFallbackValues").exists(_.trim.toBoolean)
  /** extra java-time patterns tried FIRST when converting string cells into
    * Date/Timestamp columns (the reference's `dateFormat`/`timestampFormat`
    * knobs); styled date cells already arrive in the canonical forms. */
  val dateFormat: Option[String] = ci("dateFormat").map(_.trim)
  val timestampFormat: Option[String] = ci("timestampFormat").map(_.trim)
  /** password for ECMA-376 agile-encrypted workbooks ([[OfficeCrypto]]). */
  val workbookPassword: Option[String] = ci("workbookPassword")
  def paths: Seq[String] =
    ci("paths").map(DocPushdown.parseJson(_).elements().asScala.map(_.asText).toSeq)
      .getOrElse(ci("path").toSeq)
}

class ExcelTable(tableSchema: StructType, opts: ExcelOptions)
    extends Table with SupportsRead {
  override def name(): String = s"excel(${opts.paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      // column pruning: a projection never parses or converts dropped cells
      // (sheet XML still streams past them — a ZIP member has one stream)
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        ExcelRead.resolveFiles(opts).map(ExcelFilePartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new ExcelReaderFactory(tableSchema, required, opts)
    }
}

final case class ExcelFilePartition(path: String) extends InputPartition

class ExcelReaderFactory(fullSchema: StructType, required: StructType,
                         opts: ExcelOptions) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = ExcelRead.dataRows(p.asInstanceOf[ExcelFilePartition].path, opts)
    // pruned field -> its cell position in the full row
    val cellIdx = required.fields.map(f => fullSchema.fieldIndex(f.name))
    // compile the user's date/timestamp patterns once per partition
    val dateFmt = opts.dateFormat.map(java.time.format.DateTimeFormatter.ofPattern)
    val tsFmt = opts.timestampFormat.map(java.time.format.DateTimeFormatter.ofPattern)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          current = ExcelRead.toInternalRow(rows.next(), required, cellIdx,
            opts.errorsToFallback, dateFmt, tsFmt)
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** The shared read pipeline: file resolution, range slicing, header split,
  * schema inference, and the string→typed conversion. */
object ExcelRead {

  /** Expand globs/directories to concrete .xlsx files, sorted so the
    * schema file (first) is deterministic. */
  def resolveFiles(opts: ExcelOptions): Seq[String] = {
    require(opts.paths.nonEmpty, "excel source requires a path")
    val conf = SparkSession.active.sessionState.newHadoopConf()
    opts.paths.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
      require(matched.nonEmpty, s"no files match: $p")
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(f => f.isFile && {
              val n = f.getPath.getName.toLowerCase
              n.endsWith(".xlsx") || n.endsWith(".xls")
            })
            .map(_.getPath.toUri.getPath)
        else Seq(st.getPath.toUri.getPath)
      }
    }.distinct.sorted
  }

  /** In-range rows of the addressed sheet of one workbook, columns sliced
    * to the address, header row (and `ignoreAfterHeader` rows after it)
    * EXCLUDED. */
  def dataRows(path: String, opts: ExcelOptions): Iterator[IndexedSeq[String]] =
    rangedRows(path, opts).drop(headerRowCount(opts))

  /** rows consumed by the header block: header itself + ignoreAfterHeader. */
  def headerRowCount(opts: ExcelOptions): Int =
    if (opts.header) 1 + opts.ignoreAfterHeader else 0

  /** Raw `(rowIdx, cells)` rows of the addressed sheet. The container
    * MAGIC, not the extension, routes the parse: ZIP → [[XlsxParser]];
    * CFB with a `Workbook`/`Book` stream → legacy `.xls` ([[XlsParser]]);
    * CFB with `EncryptionInfo` → decrypt ([[OfficeCrypto]]) and recurse
    * into the inner ZIP. Decryption lands in an executor-local temp file
    * (java.util.zip needs a seekable file); workbooks are file-sized by
    * definition, and the handle is removed once rows are drained. */
  private def loadRows(path: String, opts: ExcelOptions): Iterator[(Long, IndexedSeq[String])] = {
    // readNBytes: a bare read() may legally return short on network/FUSE
    // filesystems, which would misclassify an encrypted workbook as a ZIP
    val in = new java.io.FileInputStream(path)
    val head = try in.readNBytes(8) finally in.close()
    def noSheet(name: String, have: Seq[String]): Nothing =
      throw new IllegalArgumentException(
        s"no sheet '$name' in $path (has: ${have.mkString(", ")})")
    def fromZip(zip: ZipFile): Iterator[(Long, IndexedSeq[String])] = {
      val sheets = XlsxParser.sheetParts(zip)
      val part = opts.address.flatMap(_.sheet) match {
        case None => sheets.headOption.map(_._2)
          .getOrElse(throw new IllegalArgumentException(s"$path has no sheets"))
        case Some(name) => sheets.collectFirst { case (n, p) if n == name => p }
          .getOrElse(noSheet(name, sheets.map(_._1)))
      }
      XlsxParser.sheetRows(zip, part, XlsxParser.sharedStrings(zip),
        XlsxParser.dateStyles(zip), XlsxParser.date1904(zip))
        .toIndexedSeq.iterator // drain before the zip handle closes
    }
    if (head.length == 8 && OleCfb.isCfb(head)) {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      val streams = OleCfb.readStreams(bytes)
      XlsParser.workbookStream(streams) match {
        case Some(ws) => // legacy BIFF8 .xls
          val wb = XlsParser.workbook(ws)
          val off = opts.address.flatMap(_.sheet) match {
            case None => wb.sheets.headOption.map(_._2)
              .getOrElse(throw new IllegalArgumentException(s"$path has no sheets"))
            case Some(name) => wb.sheets.collectFirst { case (n, o) if n == name => o }
              .getOrElse(noSheet(name, wb.sheets.map(_._1)))
          }
          XlsParser.sheetRows(wb, off)
        case None =>
          val pw = opts.workbookPassword.getOrElse(throw new IllegalArgumentException(
            s"$path is an encrypted workbook — set the workbookPassword option"))
          val plain = OfficeCrypto.decrypt(bytes, pw)
          val tmp = java.nio.file.Files.createTempFile("graft-xlsx-dec", ".zip")
          try {
            java.nio.file.Files.write(tmp, plain)
            val zip = new ZipFile(tmp.toFile)
            try fromZip(zip) finally zip.close()
          } finally java.nio.file.Files.deleteIfExists(tmp)
      }
    } else {
      val zip = new ZipFile(path)
      try fromZip(zip) finally zip.close()
    }
  }

  /** In-range rows (header still included). */
  private def rangedRows(path: String, opts: ExcelOptions): Iterator[IndexedSeq[String]] = {
    val lo = opts.address.map(_.startRow.toLong).getOrElse(1L)
    val hi = opts.address.flatMap(_.endRow).map(_.toLong)
    val c0 = opts.address.map(_.startCol - 1).getOrElse(0)
    val cN = opts.address.flatMap(_.endCol) // inclusive, 1-based
    loadRows(path, opts)
      .filter { case (r, _) => r >= lo && hi.forall(r <= _) }
      .map { case (_, cells) =>
        val upper = cN.getOrElse(cells.length)
        val sliced =
          if (c0 == 0 && upper >= cells.length) cells
          else (c0 until upper).map(i => if (i < cells.length) cells(i) else null)
        if (opts.emptyAsNull) sliced.map(v => if (v != null && v.isEmpty) null else v)
        else sliced
      }
  }

  /** Header names + excerpt-based column typing from the FIRST resolved
    * file (multi-file reads share one schema, like Spark's csv). */
  def inferSchema(files: Seq[String], opts: ExcelOptions): StructType = {
    val rows = rangedRows(files.head, opts).take(opts.excerptSize + 1).toIndexedSeq
    require(rows.nonEmpty, s"${files.head}: no rows in range")
    val width = rows.map(_.length).max
    val names: IndexedSeq[String] =
      if (opts.header) (0 until width).map(i =>
        rows.head.lift(i).flatMap(Option(_))
          .filter(v => v.nonEmpty && v != XlsxParser.ErrorSentinel)
          .getOrElse(s"_c$i"))
      else (0 until width).map(i => s"_c$i")
    val sample = rows.drop(headerRowCount(opts))
    val types = (0 until width).map { i =>
      if (!opts.inferTypes) StringType
      else {
        val vs = sample.flatMap(r => Option(r.lift(i).orNull))
          .filter(v => v.nonEmpty && v != XlsxParser.ErrorSentinel)
        if (vs.isEmpty) StringType
        else if (vs.forall(v => v.toLongOption.isDefined)) LongType
        else if (vs.forall(v => v.toDoubleOption.isDefined)) DoubleType
        else if (vs.forall(v => v.toBooleanOption.isDefined)) BooleanType
        // canonical forms emitted by XlsxParser for date-styled cells;
        // a date/timestamp mix types as the wider Timestamp
        else if (vs.forall(isCanonicalDate)) DateType
        else if (vs.forall(v => isCanonicalDate(v) || isCanonicalTs(v))) TimestampType
        else StringType
      }
    }
    StructType(names.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
  }

  private val CanonicalDate = """\d{4}-\d{2}-\d{2}""".r
  private val CanonicalTs = """\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d{1,9})?""".r
  def isCanonicalDate(v: String): Boolean = CanonicalDate.matches(v)
  def isCanonicalTs(v: String): Boolean = CanonicalTs.matches(v)

  private def attempt[A](f: => A): Option[A] =
    try Some(f) catch { case _: Exception => None }

  /** String cell → epoch days: the user's `dateFormat` pattern first, then
    * the canonical `yyyy-MM-dd` (a timestamp's date prefix also parses). */
  def parseDateDays(raw: String, fmt: Option[java.time.format.DateTimeFormatter]): Option[Int] =
    fmt.flatMap(f => attempt(java.time.LocalDate.parse(raw, f)))
      .orElse(attempt(java.time.LocalDate.parse(raw.take(10))))
      .map(_.toEpochDay.toInt)

  /** String cell → epoch micros (wall-clock read as UTC, matching the
    * serial's timezone-less nature): `timestampFormat` first, then the
    * canonical `yyyy-MM-dd[ T]HH:mm:ss[.f]`, then a bare date at midnight. */
  def parseTsMicros(raw: String, fmt: Option[java.time.format.DateTimeFormatter]): Option[Long] = {
    import java.time.{LocalDate, LocalDateTime, ZoneOffset}
    fmt.flatMap(f => attempt(LocalDateTime.parse(raw, f)))
      .orElse(attempt(LocalDateTime.parse(raw.replace(' ', 'T'))))
      .orElse(attempt(LocalDate.parse(raw)).map(_.atStartOfDay))
      .map(d => d.toEpochSecond(ZoneOffset.UTC) * 1000000L + d.getNano / 1000L)
  }

  /** Permissive conversion (like csv PERMISSIVE): unparseable cells null.
    * Error cells (`#DIV/0!` …) become the type's fallback value when
    * `setErrorCellsToFallbackValues` is set, null otherwise. */
  def toInternalRow(cells: IndexedSeq[String], schema: StructType,
                    cellIdx: Array[Int], errorsToFallback: Boolean,
                    dateFmt: Option[java.time.format.DateTimeFormatter] = None,
                    tsFmt: Option[java.time.format.DateTimeFormatter] = None): InternalRow = {
    val out = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val ci = cellIdx(i)
      val raw0 = if (ci < cells.length) cells(ci) else null
      val raw =
        if (raw0 == XlsxParser.ErrorSentinel)
          if (errorsToFallback) schema.fields(i).dataType match {
            case LongType => "0"
            case DoubleType => "0.0"
            case BooleanType => "false"
            case DateType => "1970-01-01"
            case TimestampType => "1970-01-01 00:00:00"
            case _ => ""
          } else null
        else raw0
      out(i) =
        if (raw == null) null
        else schema.fields(i).dataType match {
          case StringType => UTF8String.fromString(raw)
          case LongType => raw.toLongOption
            .orElse(raw.toDoubleOption.map(_.toLong)).map(Long.box).orNull
          case DoubleType => raw.toDoubleOption.map(Double.box).orNull
          case BooleanType => raw.toBooleanOption.map(Boolean.box).orNull
          case DateType => parseDateDays(raw, dateFmt).map(Int.box).orNull
          case TimestampType => parseTsMicros(raw, tsFmt).map(Long.box).orNull
          case other => throw new IllegalStateException(s"unexpected type $other")
        }
      i += 1
    }
    new GenericInternalRow(out)
  }
}
