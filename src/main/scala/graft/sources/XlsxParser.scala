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
  * booleans, formula caches (the `<v>` under a formula cell), and sparse
  * rows (gap cells become nulls via the `r` cell reference). Out of scope,
  * documented: encrypted workbooks (`workbookPassword` — the OLE container
  * is not SpreadsheetML), date STYLING (dates arrive as their raw serial
  * numbers; convert downstream with the documented `timestampFormat`
  * recipe), and .xls (the legacy binary format).
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

  /** Parse one sheet part into dense rows (null = empty/missing cell),
    * 1-based `rowIndex` from the sheet's own `r` attributes (sparse rows
    * preserved as gaps in the index, not silently compacted). */
  def sheetRows(zip: ZipFile, part: String,
                shared: IndexedSeq[String]): Iterator[(Long, IndexedSeq[String])] = {
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
