package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

/** Minimal native .xlsx reader — JDK only (java.util.zip + StAX), no POI.
  *
  * An .xlsx workbook is a ZIP of XML parts (ECMA-376 / ISO 29500
  * SpreadsheetML, the public standard):
  *   - `xl/workbook.xml`          sheet names → relationship ids
  *   - `xl/_rels/workbook.xml.rels`  relationship ids → sheet part paths
  *   - `xl/sharedStrings.xml`     the shared-string table (`t="s"` cells)
  *   - `xl/worksheets/sheetN.xml` rows: `<row r="1"><c r="A1" t="s"><v>0</v>`
  *
  * Covers the cell forms the reference's Excel docs exercise
  * (docs/file/01.Excel Ingestion.md): shared / inline strings, numbers,
  * booleans, formula caches (the `<v>` under a formula cell), sparse
  * rows (gap cells become nulls via the `r` cell reference), and date
  * STYLING: numeric cells whose style (`s=` → `xl/styles.xml` cellXfs →
  * numFmt) is a date/time format are rendered as canonical
  * `yyyy-MM-dd[ HH:mm:ss[.SSS]]` strings, which the reader types as
  * Date/Timestamp (the reference's `timestampFormat` surface). Encrypted
  * workbooks (`workbookPassword`) are handled upstream by
  * [[OfficeCrypto]]/[[OleCfb]] — this parser always sees plain
  * SpreadsheetML. Out of scope, documented: .xls (the legacy binary
  * format).
  *
  * Memory: StAX streams the sheet XML (the spark-excel `maxRowsInMemory`
  * behavior by default); only the shared-string table is materialized, as
  * every reader of the format must. */
object XlsxParser {

  /** Marker emitted for error cells (`t="e"`); cannot collide with real
    * cell text (NUL is not legal in XML character data). */
  val ErrorSentinel = "\u0000e"

  private val factory = {
    val f = XMLInputFactory.newInstance()
    // untrusted input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** sheet name → zip part path (e.g. "xl/worksheets/sheet1.xml"),
    * in workbook order. */
  def sheetParts(zip: ZipFile): Seq[(String, String)] = {
    val rels: Map[String, String] = Option(zip.getEntry("xl/_rels/workbook.xml.rels")) match {
      case None => Map.empty
      case Some(e) => withReader(zip.getInputStream(e)) { r =>
        val out = Map.newBuilder[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val target = r.getAttributeValue(null, "Target")
            if (id != null && target != null)
              out += id -> ("xl/" + target.stripPrefix("/xl/").stripPrefix("xl/"))
          }
        }
        out.result()
      }
    }
    val wb = zip.getEntry("xl/workbook.xml")
    require(wb != null, "not an xlsx workbook: missing xl/workbook.xml")
    val sheets = withReader(zip.getInputStream(wb)) { r =>
      val out = ArrayBuffer.empty[(String, String)]
      var i = 0
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          i += 1
          // r:id attribute is namespaced; scan attributes by local name
          val rid = (0 until r.getAttributeCount)
            .find(a => r.getAttributeLocalName(a) == "id").map(r.getAttributeValue)
          val part = rid.flatMap(rels.get).getOrElse(s"xl/worksheets/sheet$i.xml")
          out += ((if (name != null) name else s"Sheet$i") -> part)
        }
      }
      out.toSeq
    }
    sheets
  }

  /** The shared-string table; `<si>` items may be plain `<t>` or rich-text
    * runs — all `<t>` text under one `<si>` concatenates. */
  def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    Option(zip.getEntry("xl/sharedStrings.xml")) match {
      case None => IndexedSeq.empty
      case Some(e) => withReader(zip.getInputStream(e)) { r =>
        val out = ArrayBuffer.empty[String]
        val sb = new StringBuilder
        var inT = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              if (r.getLocalName == "si") sb.clear()
              else if (r.getLocalName == "t") inT = true
            case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              if (r.getLocalName == "t") inT = false
              else if (r.getLocalName == "si") out += sb.toString
            case _ => ()
          }
        }
        out.toIndexedSeq
      }
    }

  /** numFmtIds that are date/time formats per ECMA-376 §18.8.30's built-in
    * table (14-22 date/time, 27-36 era dates, 45-47 elapsed, 50-58 era). */
  private[sources] val builtinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code is a date/time format when, after stripping
    * quoted literals, escapes, colors and currency sections, any y/m/d/h/s
    * token remains (the POI heuristic; 'm' is month or minute — temporal
    * either way). */
  def isDateFormatCode(code: String): Boolean = {
    val sb = new StringBuilder
    var i = 0
    while (i < code.length) {
      code.charAt(i) match {
        case '"' => // quoted literal: skip to the closing quote
          i += 1; while (i < code.length && code.charAt(i) != '"') i += 1
        case '\\' => i += 1 // escaped literal char
        case '[' =>
          // [h]/[mm]/[ss] elapsed-time sections ARE temporal; [Red]/[$-409]
          // color/locale sections are not
          val close = code.indexOf(']', i)
          val body = if (close < 0) "" else code.substring(i + 1, close)
          if (body.nonEmpty && body.forall(c => "hms".contains(c.toLower))) sb.append(body)
          i = if (close < 0) code.length else close
        case c => sb.append(c)
      }
      i += 1
    }
    val bare = sb.toString.toLowerCase
    !bare.contains("general") && bare.exists("ymdhs".contains(_))
  }

  /** cellXfs style indices (the `s=` attribute's target) whose number
    * format is a date/time format: built-in ids + custom formatCodes. */
  def dateStyles(zip: ZipFile): Set[Int] =
    Option(zip.getEntry("xl/styles.xml")) match {
      case None => Set.empty
      case Some(e) => withReader(zip.getInputStream(e)) { r =>
        val customDate = scala.collection.mutable.Set.empty[Int]
        val xfFmts = ArrayBuffer.empty[Int]
        var inCellXfs = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "numFmt" =>
                val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
                val code = r.getAttributeValue(null, "formatCode")
                if (id.isDefined && code != null && isDateFormatCode(code))
                  customDate += id.get
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                xfFmts += Option(r.getAttributeValue(null, "numFmtId"))
                  .map(_.toInt).getOrElse(0)
              case _ => ()
            }
            case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
              inCellXfs = false
            case _ => ()
          }
        }
        xfFmts.zipWithIndex.collect {
          case (fmt, style) if builtinDateFmts(fmt) || customDate(fmt) => style
        }.toSet
      }
    }

  /** Workbook uses the 1904 date system (`<workbookPr date1904="1"/>`). */
  def date1904(zip: ZipFile): Boolean =
    Option(zip.getEntry("xl/workbook.xml")).exists { e =>
      withReader(zip.getInputStream(e)) { r =>
        var found = false
        while (r.hasNext && !found) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "workbookPr") {
            val v = r.getAttributeValue(null, "date1904")
            found = v == "1" || v == "true"
          }
        }
        found
      }
    }

  /** Excel date serial → canonical `yyyy-MM-dd[ HH:mm:ss[.SSS]]` string.
    * 1900 system: serial 1 = 1900-01-01, with the fictitious 1900-02-29 at
    * serial 60 (the Lotus leap-year bug the format standardizes), so
    * serials ≥ 61 are offset from 1899-12-30 and earlier ones from
    * 1899-12-31. 1904 system: serial 0 = 1904-01-01. Time-of-day is the
    * fraction × 86400 s, rounded to the millisecond. */
  def serialToString(serial: Double, date1904: Boolean): String = {
    import java.time.LocalDate
    val totalMs = math.round(serial * 86400000.0)
    val days = math.floorDiv(totalMs, 86400000L)
    val msInDay = math.floorMod(totalMs, 86400000L)
    val epoch =
      if (date1904) LocalDate.of(1904, 1, 1)
      else if (days >= 61) LocalDate.of(1899, 12, 30)
      else LocalDate.of(1899, 12, 31) // serial 60 (fake Feb 29) falls to Mar 1 too
    val date = epoch.plusDays(days)
    if (msInDay == 0) date.toString
    else {
      val s = msInDay / 1000; val ms = msInDay % 1000
      val hms = f"${s / 3600}%02d:${s % 3600 / 60}%02d:${s % 60}%02d"
      if (ms == 0) s"$date $hms" else f"$date $hms.$ms%03d"
    }
  }

  /** Parse one sheet part into dense rows (null = empty/missing cell),
    * 1-based `rowIndex` from the sheet's own `r` attributes (sparse rows
    * preserved as gaps in the index, not silently compacted). Numeric
    * cells styled with a date numFmt are rendered via [[serialToString]]
    * when `dateStyleIds` is supplied. */
  def sheetRows(zip: ZipFile, part: String,
                shared: IndexedSeq[String],
                dateStyleIds: Set[Int] = Set.empty,
                use1904: Boolean = false): Iterator[(Long, IndexedSeq[String])] = {
    val e = zip.getEntry(part)
    require(e != null, s"no such sheet part: $part")
    // materialize per sheet call: the DSv2 reader iterates once per file;
    // sheets stream through StAX, rows accumulate only for the caller
    withReader(zip.getInputStream(e)) { r =>
      val rows = ArrayBuffer.empty[(Long, IndexedSeq[String])]
      var rowIdx = 0L
      var cells: ArrayBuffer[String] = null
      var cellCol = -1
      var cellType = ""
      var cellStyle = -1
      var inV = false
      var inIs = false
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" =>
              rowIdx = Option(r.getAttributeValue(null, "r")).map(_.toLong)
                .getOrElse(rowIdx + 1)
              cells = ArrayBuffer.empty[String]
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              cellCol =
                if (ref != null) colOf(ref) - 1
                else cellCol + 1 // no ref attr: next column
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .flatMap(_.toIntOption).getOrElse(-1)
              sb.clear()
            case "v" => inV = true; sb.clear()
            case "is" => inIs = true
            case "t" if inIs => inV = true; sb.clear()
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS if inV => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" | "t" if inV =>
              inV = false
              if (cells != null && cellCol >= 0) {
                val raw = sb.toString
                val value = cellType match {
                  case "s" => shared.lift(raw.trim.toInt).orNull
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case "e" => ErrorSentinel // #DIV/0! etc — reader decides
                  case "n" if dateStyleIds(cellStyle) =>
                    raw.trim.toDoubleOption
                      .map(serialToString(_, use1904)).getOrElse(raw)
                  case _ => raw // n, str, inlineStr runs, formula caches
                }
                pad(cells, cellCol)
                cells(cellCol) = value
              }
            case "is" => inIs = false
            case "row" =>
              if (cells != null) rows += ((rowIdx, cells.toIndexedSeq))
              cells = null; cellCol = -1
            case _ => ()
          }
          case _ => ()
        }
      }
      rows.iterator
    }
  }

  /** "BC12" → 1-based column index (A=1, Z=26, AA=27 …). */
  def colOf(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).toUpperCase
      .foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1))

  private def pad(buf: ArrayBuffer[String], idx: Int): Unit =
    while (buf.length <= idx) buf += null

  private def withReader[A](in: InputStream)(f: XMLStreamReader => A): A = {
    val reader = factory.createXMLStreamReader(in)
    try f(reader)
    finally { reader.close(); in.close() }
  }
}
