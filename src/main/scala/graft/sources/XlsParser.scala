package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

/** Legacy binary `.xls` (BIFF8, the public [MS-XLS] spec) reader — the last
  * workbook format of the Excel-ingestion surface (reference:
  * `docs/file/01.Excel Ingestion.md` reads `.xls` via POI). JDK-only, like
  * [[XlsxParser]] and [[OleCfb]], which supplies the CFB container this
  * format lives in (stream `Workbook`, BIFF5's `Book` accepted too).
  *
  * Scope: the cell-value surface the source needs — BOUNDSHEET / SST
  * (CONTINUE-aware for character data) / LABELSST / LABEL / NUMBER / RK /
  * MULRK / FORMULA cached results (+ trailing STRING) / BOOLERR / FORMAT /
  * XF date styling / DATEMODE. Emits the same `(rowIdx, cells)` string-row
  * contract as [[XlsxParser.sheetRows]]: date-styled numerics render via
  * [[XlsxParser.serialToString]], booleans as `true`/`false`, errors as the
  * shared [[XlsxParser.ErrorSentinel]].
  */
object XlsParser {

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecBoundSheet = 0x0085
  private val RecSst = 0x00FC
  private val RecContinue = 0x003C
  private val RecLabelSst = 0x00FD
  private val RecLabel = 0x0204
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecFormula = 0x0006
  private val RecString = 0x0207
  private val RecBoolErr = 0x0205
  private val RecFormat = 0x041E
  private val RecXf = 0x00E0
  private val RecDateMode = 0x0022

  /** The CFB stream holding the BIFF workbook, if this container is an
    * `.xls` (as opposed to an encrypted `.xlsx`, which carries
    * `EncryptionInfo` instead). */
  def workbookStream(streams: Map[String, Array[Byte]]): Option[Array[Byte]] =
    streams.get("Workbook").orElse(streams.get("Book"))

  /** Parsed workbook globals: sheet (name, substream offset) pairs in tab
    * order, the shared-string table, per-XF "is a date format" flags and
    * the date system. */
  final case class Workbook(bytes: Array[Byte], sheets: Seq[(String, Int)],
                            sst: IndexedSeq[String],
                            xfIsDate: IndexedSeq[Boolean], date1904: Boolean)

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def u16(b: ByteBuffer, p: Int): Int = b.getShort(p) & 0xFFFF
  private def u32(b: ByteBuffer, p: Int): Long = b.getInt(p) & 0xFFFFFFFFL

  /** Iterate (recordId, payloadStart, payloadLen) from `from` until the
    * EOF record that closes the substream opened at `from` (BOF/EOF pairs
    * nest for embedded chart substreams). */
  private def records(b: ByteBuffer, limit: Int, from: Int): Iterator[(Int, Int, Int)] =
    new Iterator[(Int, Int, Int)] {
      private var pos = from
      private var depth = 0
      private var done = false
      def hasNext: Boolean = !done && pos + 4 <= limit
      def next(): (Int, Int, Int) = {
        val id = u16(b, pos); val len = u16(b, pos + 2)
        val out = (id, pos + 4, len)
        pos += 4 + len
        if (id == RecBof) depth += 1
        if (id == RecEof) { depth -= 1; if (depth <= 0) done = true }
        if (id == 0) done = true // zero padding after the last EOF
        out
      }
    }

  /** One XLUnicodeString at `p`: (value, bytesConsumed). `cchBytes` is 2 for
    * cell/SST strings, 1 for sheet names. */
  private def readStr(b: ByteBuffer, p: Int, cchBytes: Int): (String, Int) = {
    val cch = if (cchBytes == 2) u16(b, p) else b.get(p) & 0xFF
    val flags = b.get(p + cchBytes) & 0xFF
    var q = p + cchBytes + 1
    val rich = (flags & 0x08) != 0
    val ext = (flags & 0x04) != 0
    val high = (flags & 0x01) != 0
    val cRun = if (rich) u16(b, q) else 0
    if (rich) q += 2
    val cbExt = if (ext) u32(b, q).toInt else 0
    if (ext) q += 4
    val s =
      if (high) new String(b.array(), q, cch * 2, StandardCharsets.UTF_16LE)
      else new String(b.array(), q, cch, StandardCharsets.ISO_8859_1)
    q += (if (high) cch * 2 else cch)
    q += cRun * 4 + cbExt
    (s, q - p)
  }

  /** SST with CONTINUE fragments. Character data may straddle a fragment
    * boundary (each continuation restarts with its own compression byte);
    * a string HEADER straddling a boundary is rejected with a clear error
    * (writers don't emit it in practice). */
  private def readSst(b: ByteBuffer, frags: Seq[(Int, Int)]): IndexedSeq[String] = {
    require(frags.nonEmpty, "empty SST")
    val out = ArrayBuffer.empty[String]
    val (p0, l0) = frags.head
    val cstUnique = u32(b, p0 + 4).toInt
    var fi = 0
    var pos = p0 + 8
    var end = p0 + l0
    def nextFrag(): Unit = {
      fi += 1
      require(fi < frags.length, "SST truncated: ran out of CONTINUE fragments")
      pos = frags(fi)._1; end = frags(fi)._1 + frags(fi)._2
    }
    var i = 0
    while (i < cstUnique) {
      if (pos >= end) nextFrag()
      require(pos + 3 <= end,
        "unsupported SST layout: string header straddles a CONTINUE boundary")
      val cch = u16(b, pos)
      val flags = b.get(pos + 2) & 0xFF
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      pos += 3
      val cRun = if (rich) { val v = u16(b, pos); pos += 2; v } else 0
      val cbExt = if (ext) { val v = u32(b, pos).toInt; pos += 4; v } else 0
      // char data, possibly spanning fragments; compression can flip at
      // each boundary (fresh grbit byte leads every continued fragment)
      val sb = new StringBuilder
      var remaining = cch
      var high = (flags & 0x01) != 0
      while (remaining > 0) {
        if (pos >= end) { nextFrag(); high = (b.get(pos) & 0x01) != 0; pos += 1 }
        val avail = if (high) (end - pos) / 2 else end - pos
        val take = math.min(remaining, avail)
        require(take > 0, "SST fragment too short for any character")
        if (high) sb.append(new String(b.array(), pos, take * 2, StandardCharsets.UTF_16LE))
        else sb.append(new String(b.array(), pos, take, StandardCharsets.ISO_8859_1))
        pos += (if (high) take * 2 else take)
        remaining -= take
      }
      // rich runs / ext data may span fragments too; skip byte-wise
      var skip = cRun * 4 + cbExt
      while (skip > 0) {
        if (pos >= end) nextFrag()
        val take = math.min(skip, end - pos)
        pos += take; skip -= take
      }
      out += sb.toString
      i += 1
    }
    out.toIndexedSeq
  }

  /** Parse the workbook-globals substream. */
  def workbook(wb: Array[Byte]): Workbook = {
    val b = le(wb)
    require(wb.length >= 4 && u16(b, 0) == RecBof, "not a BIFF workbook stream (no BOF)")
    val sheets = ArrayBuffer.empty[(String, Int)]
    val xfFmts = ArrayBuffer.empty[Int]
    val customFmt = scala.collection.mutable.Map.empty[Int, String]
    var date1904 = false
    var sst: IndexedSeq[String] = IndexedSeq.empty
    val it = records(b, wb.length, 0).buffered
    while (it.hasNext) {
      val (id, p, len) = it.next()
      id match {
        // FILEPASS ([MS-XLS] 2.4.117): the stream beyond this record is
        // RC4/XOR-encrypted — parsing on would yield garbage rows. Legacy
        // .xls encryption is a different scheme from the ECMA-376 agile
        // path behind workbookPassword, so fail with the real reason.
        case 0x002F => throw new IllegalArgumentException(
          "encrypted legacy .xls (FILEPASS) is not supported — re-save as " +
            ".xlsx (workbookPassword handles ECMA-376 agile encryption) or " +
            "decrypt the file first")
        case RecBoundSheet =>
          val off = u32(b, p).toInt
          val (name, _) = readStr(b, p + 6, cchBytes = 1)
          sheets += ((name, off))
        case RecDateMode => date1904 = u16(b, p) == 1
        case RecFormat =>
          val ifmt = u16(b, p)
          customFmt(ifmt) = readStr(b, p + 2, cchBytes = 2)._1
        case RecXf => xfFmts += u16(b, p + 2)
        case RecSst =>
          val frags = ArrayBuffer((p, len))
          while (it.hasNext && it.head._1 == RecContinue) {
            val (_, cp, cl) = it.next(); frags += ((cp, cl))
          }
          sst = readSst(b, frags.toSeq)
        case _ => ()
      }
    }
    val isDate = xfFmts.map(ifmt =>
      XlsxParser.builtinDateFmts(ifmt) ||
        customFmt.get(ifmt).exists(XlsxParser.isDateFormatCode)).toIndexedSeq
    Workbook(wb, sheets.toSeq, sst, isDate, date1904)
  }

  /** RKNumber → double ([MS-XLS] 2.5.217): bit0 = ×1/100, bit1 = 30-bit
    * int vs high-30-bits-of-a-double. */
  def rkToDouble(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  /** Integral doubles print without the trailing `.0` — BIFF stores every
    * number as a double, but the xlsx side's raw `<v>` text (and hence
    * schema inference) distinguishes `3` from `3.5`. */
  private def fmtNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Rows of the sheet substream at `offset`, same contract as
    * [[XlsxParser.sheetRows]] (1-based row index, dense null-padded cells,
    * sparse rows preserved as index gaps). */
  def sheetRows(wb: Workbook, offset: Int): Iterator[(Long, IndexedSeq[String])] = {
    val b = le(wb.bytes)
    val rows = scala.collection.mutable.TreeMap.empty[Int, ArrayBuffer[String]]
    def put(row: Int, col: Int, v: String): Unit = {
      val cells = rows.getOrElseUpdate(row, ArrayBuffer.empty[String])
      while (cells.length <= col) cells += null
      cells(col) = v
    }
    def num(row: Int, col: Int, ixfe: Int, d: Double): Unit =
      put(row, col, if (wb.xfIsDate.lift(ixfe).getOrElse(false))
        XlsxParser.serialToString(d, wb.date1904) else fmtNum(d))
    val it = records(b, wb.bytes.length, offset).buffered
    require(it.hasNext && it.head._1 == RecBof, s"no sheet BOF at offset $offset")
    var pendingFormulaCell: Option[(Int, Int)] = None // cached-string formula
    while (it.hasNext) {
      val (id, p, len) = it.next()
      id match {
        case RecLabelSst =>
          put(u16(b, p), u16(b, p + 2), wb.sst.lift(u32(b, p + 6).toInt).orNull)
        case RecLabel =>
          put(u16(b, p), u16(b, p + 2), readStr(b, p + 6, cchBytes = 2)._1)
        case RecNumber =>
          num(u16(b, p), u16(b, p + 2), u16(b, p + 4), b.getDouble(p + 6))
        case RecRk =>
          num(u16(b, p), u16(b, p + 2), u16(b, p + 4), rkToDouble(b.getInt(p + 6)))
        case RecMulRk =>
          val row = u16(b, p); val colFirst = u16(b, p + 2)
          val n = (len - 6) / 6
          for (i <- 0 until n)
            num(row, colFirst + i, u16(b, p + 4 + i * 6),
              rkToDouble(b.getInt(p + 6 + i * 6)))
        case RecBoolErr =>
          val row = u16(b, p); val col = u16(b, p + 2)
          if ((b.get(p + 7) & 0xFF) == 0) // fError = 0: boolean
            put(row, col, if (b.get(p + 6) != 0) "true" else "false")
          else put(row, col, XlsxParser.ErrorSentinel)
        case RecFormula =>
          val row = u16(b, p); val col = u16(b, p + 2); val ixfe = u16(b, p + 4)
          if (u16(b, p + 12) == 0xFFFF) (b.get(p + 6) & 0xFF) match {
            case 0 => pendingFormulaCell = Some((row, col)) // STRING follows
            case 1 => put(row, col, if (b.get(p + 8) != 0) "true" else "false")
            case 2 => put(row, col, XlsxParser.ErrorSentinel)
            case _ => put(row, col, "") // cached empty string
          } else num(row, col, ixfe, b.getDouble(p + 6))
        case RecString =>
          pendingFormulaCell.foreach { case (row, col) =>
            put(row, col, readStr(b, p, cchBytes = 2)._1)
          }
          pendingFormulaCell = None
        case _ => ()
      }
    }
    rows.iterator.map { case (r, cells) => ((r + 1).toLong, cells.toIndexedSeq) }
  }
}
