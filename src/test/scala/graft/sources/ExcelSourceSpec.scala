package graft.sources

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Native .xlsx source: fixtures are REAL workbooks (SpreadsheetML ZIPs
  * built with ZipOutputStream — what any xlsx writer emits), read back via
  * `spark.read.format("excel")`. */
class ExcelSourceSpec extends SparkSuite {

  import spark.implicits._

  /** Write a minimal-but-valid workbook. Sheets: name -> rows of cells;
    * a cell is (value, isString). Strings go through the shared-string
    * table (the common writer behavior), numbers/booleans inline. */
  private def writeXlsx(path: String, sheets: Seq[(String, Seq[Seq[(String, Boolean)]])],
                        richText: Boolean = false): Unit = {
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sidOf(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    def colRef(i: Int): String = { // 0-based -> A, B, ..., AA
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def sheetXml(rows: Seq[Seq[(String, Boolean)]]): String = {
      val body = rows.zipWithIndex.map { case (cells, r) =>
        val cs = cells.zipWithIndex.collect {
          case ((v, isStr), c) if v != null =>
            val ref = s"${colRef(c)}${r + 1}"
            if (isStr) s"""<c r="$ref" t="s"><v>${sidOf(v)}</v></c>"""
            else if (v.startsWith("#")) s"""<c r="$ref" t="e"><v>$v</v></c>"""
            else if (v.startsWith("DATE:")) // styled: cellXfs 1 = numFmtId 14
              s"""<c r="$ref" s="1"><v>${v.stripPrefix("DATE:")}</v></c>"""
            else if (v.startsWith("TS:")) // styled: cellXfs 2 = custom 164
              s"""<c r="$ref" s="2"><v>${v.stripPrefix("TS:")}</v></c>"""
            else if (v == "true" || v == "false")
              s"""<c r="$ref" t="b"><v>${if (v == "true") 1 else 0}</v></c>"""
            else s"""<c r="$ref"><v>$v</v></c>"""
        }.mkString
        s"""<row r="${r + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }
    val sheetXmls = sheets.map { case (_, rows) => sheetXml(rows) } // assigns sids
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>${
        sheets.zipWithIndex.map { case ((n, _), i) =>
          s"""<sheet name="$n" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString
      }</sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">${
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString
      }</Relationships>""")
    val ss = strings.keys.map { s =>
      if (richText) s"<si><r><t>$s</t></r></si>" else s"<si><t>$s</t></si>"
    }.mkString
    entry("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">$ss</sst>""")
    // style 0 = General, 1 = built-in date (numFmtId 14), 2 = custom
    // datetime format (what real writers emit for formatted timestamps)
    entry("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm:ss"/></numFmts>""" +
        """<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/></cellXfs></styleSheet>""")
    sheetXmls.zipWithIndex.foreach { case (xml, i) =>
      entry(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    zos.close()
  }

  private def s(v: String): (String, Boolean) = (v, true)
  private def n(v: String): (String, Boolean) = (v, false)

  // ---------------------------------------------------------------- .xls
  /** Minimal-but-valid BIFF8 workbook in a CFB container (what any legacy
    * xls writer emits): globals (BOF/DATEMODE/FORMAT/XFs/BOUNDSHEET/SST/
    * EOF) + one sheet substream. Cell model mirrors [[writeXlsx]]:
    * strings via SST (LABELSST), numbers inline (NUMBER), booleans
    * (BOOLERR), `DATE:`/`TS:` prefixes style serials with XF 17/18
    * (builtin ifmt 14 / custom 164). `extraCells` appends raw cell
    * records (RK/MULRK/FORMULA tests). */
  private def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putShort(id.toShort).putShort(payload.length.toShort).put(payload).array()
  }
  private def le(n: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    f(b); b.array()
  }

  private def writeXls(path: String, sheetName: String,
                       rows: Seq[Seq[(String, Boolean)]],
                       extraCells: Seq[Array[Byte]] = Nil): Unit = {
    def bof(dt: Int) = rec(0x0809, le(16) { b =>
      b.putShort(0x0600.toShort).putShort(dt.toShort)
        .putShort(0x0DBB.toShort).putShort(0x07CC.toShort).putInt(0).putInt(0)
    })
    val eof = rec(0x000A, Array.empty)
    // shared strings in first-use order
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    rows.foreach(_.foreach { case (v, isStr) =>
      if (isStr && v != null) strings.getOrElseUpdate(v, strings.size)
    })
    def compressed(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val sstPayload = {
      val items = strings.keys.toSeq.map { s =>
        le(3 + s.length) { b =>
          b.putShort(s.length.toShort).put(0.toByte).put(compressed(s))
        }
      }
      val total = items.map(_.length).sum
      le(8 + total) { b =>
        b.putInt(strings.size).putInt(strings.size); items.foreach(b.put)
      }
    }
    val fmtCode = "yyyy\\-mm\\-dd hh:mm:ss"
    val format164 = rec(0x041E, le(5 + fmtCode.length) { b =>
      b.putShort(164.toShort).putShort(fmtCode.length.toShort)
        .put(0.toByte).put(compressed(fmtCode))
    })
    def xf(ifmt: Int) = rec(0x00E0, le(20)(b => b.putShort(0).putShort(ifmt.toShort)))
    val cellXfs = (0 until 16).map(_ => xf(0)) ++ Seq(xf(0), xf(14), xf(164))
    def cell(r: Int, c: Int, ixfe: Int, v: String, isStr: Boolean): Option[Array[Byte]] =
      if (v == null) None
      else if (isStr) Some(rec(0x00FD, le(10) { b =>
        b.putShort(r.toShort).putShort(c.toShort).putShort(ixfe.toShort)
          .putInt(strings(v))
      }))
      else if (v.startsWith("#")) Some(rec(0x0205, le(8) { b => // error cell
        b.putShort(r.toShort).putShort(c.toShort).putShort(ixfe.toShort)
          .put(0x07.toByte).put(1.toByte)
      }))
      else if (v == "true" || v == "false") Some(rec(0x0205, le(8) { b =>
        b.putShort(r.toShort).putShort(c.toShort).putShort(ixfe.toShort)
          .put((if (v == "true") 1 else 0).toByte).put(0.toByte)
      }))
      else {
        val (ix, num) =
          if (v.startsWith("DATE:")) (17, v.stripPrefix("DATE:").toDouble)
          else if (v.startsWith("TS:")) (18, v.stripPrefix("TS:").toDouble)
          else (ixfe, v.toDouble)
        Some(rec(0x0203, le(14) { b =>
          b.putShort(r.toShort).putShort(c.toShort).putShort(ix.toShort)
            .putDouble(num)
        }))
      }
    val cells = rows.zipWithIndex.flatMap { case (cs, r) =>
      cs.zipWithIndex.flatMap { case ((v, isStr), c) => cell(r, c, 16, v, isStr) }
    } ++ extraCells
    val sheet = Array.concat(bof(0x0010) +: cells :+ eof: _*)
    def globals(sheetOffset: Int): Array[Byte] = Array.concat(
      bof(0x0005),
      rec(0x0022, le(2)(_.putShort(0))), // DATEMODE 1900
      format164,
      Array.concat(cellXfs: _*),
      rec(0x0085, le(8 + sheetName.length) { b =>
        b.putInt(sheetOffset).putShort(0)
          .put(sheetName.length.toByte).put(0.toByte).put(compressed(sheetName))
      }),
      rec(0x00FC, sstPayload),
      eof)
    val glen = globals(0).length // BOUNDSHEET is fixed-size: no layout shift
    val stream = Array.concat(globals(glen), sheet)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      OleCfb.writeStreams(Seq("Workbook" -> stream)))
  }

  private def tmpDir(): String = Files.createTempDirectory("graft-xlsx").toString

  test("reads a real workbook: header, shared strings, schema inference") {
    val dir = tmpDir()
    writeXlsx(s"$dir/book.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("name"), s("qty"), s("price"), s("ok")),
      Seq(s("apple"), n("3"), n("1.5"), n("true")),
      Seq(s("pear"), n("7"), n("2"), n("false")))))
    val df = spark.read.format("excel").option("inferSchema", "true")
      .load(s"$dir/book.xlsx")
    assert(df.schema === StructType(Seq(
      StructField("name", StringType), StructField("qty", LongType),
      StructField("price", DoubleType), StructField("ok", BooleanType))))
    assert(df.as[(String, Long, Double, Boolean)].collect().toSet
      === Set(("apple", 3L, 1.5, true), ("pear", 7L, 2.0, false)))
  }

  test("dataAddress selects sheet and range; header taken from the range") {
    val dir = tmpDir()
    writeXlsx(s"$dir/multi.xlsx", Seq(
      "Sheet1" -> Seq(Seq(s("junk"))),
      "Tabelle2" -> Seq(
        Seq(s("noise"), s("noise2"), s("noise3")),
        Seq(null.asInstanceOf[String] -> false, s("h1"), s("h2")),
        Seq(s("skip"), s("v1"), n("1")),
        Seq(s("skip"), s("v2"), n("2")),
        Seq(s("skip"), s("ignored"), n("9")))))
    val df = spark.read.format("excel")
      .option("dataAddress", "'Tabelle2'!B2:C4")
      .option("inferSchema", "true")
      .load(s"$dir/multi.xlsx")
    assert(df.columns.toSeq === Seq("h1", "h2"))
    assert(df.as[(String, Long)].collect().toSet === Set(("v1", 1L), ("v2", 2L)))
    // unknown sheet fails with the sheet inventory in the message
    val e = intercept[Exception](
      spark.read.format("excel").option("dataAddress", "'Nope'!A1")
        .load(s"$dir/multi.xlsx").collect())
    assert(e.getMessage.contains("Tabelle2"))
  }

  test("glob of many workbooks reads one partition per file") {
    val dir = tmpDir()
    for (q <- 1 to 3)
      writeXlsx(s"$dir/q$q.xlsx", Seq("Sheet1" -> Seq(
        Seq(s("quarter"), s("amount")),
        Seq(n(q.toString), n((q * 100).toString)))))
    val df = spark.read.format("excel").option("inferSchema", "true")
      .load(s"$dir/*.xlsx")
    assert(df.rdd.getNumPartitions === 3)
    assert(df.as[(Long, Long)].collect().toSet
      === Set((1L, 100L), (2L, 200L), (3L, 300L)))
    // a directory path behaves like the glob
    val fromDir = spark.read.format("excel").load(dir)
    assert(fromDir.count() === 3L)
  }

  test("sparse rows, rich-text shared strings, gap cells, header=false") {
    val dir = tmpDir()
    writeXlsx(s"$dir/sparse.xlsx", Seq("S" -> Seq(
      Seq(s("a"), null.asInstanceOf[String] -> false, n("5")),
      Seq(s("b c"), s("x"), null.asInstanceOf[String] -> false))),
      richText = true)
    val df = spark.read.format("excel").option("header", "false")
      .load(s"$dir/sparse.xlsx")
    assert(df.columns.toSeq === Seq("_c0", "_c1", "_c2"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSet === Set(("a", null, "5"), ("b c", "x", null)))
  }

  test("ignoreAfterHeader, treatEmptyValuesAsNulls, error-cell fallback options") {
    val dir = tmpDir()
    writeXlsx(s"$dir/opts.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("name"), s("qty")),
      Seq(s("units:"), s("count")), // annotation row below the header
      Seq(s("a"), n("3")),
      Seq(s(""), n("#DIV/0!")),
      Seq(s("c"), n("7")))))
    def read(extra: (String, String)*) = {
      val r = spark.read.format("excel").option("inferSchema", "true")
        .option("ignoreAfterHeader", "1")
      extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
        .load(s"$dir/opts.xlsx")
    }
    // defaults: annotation row skipped, "" -> null, error cell -> null;
    // qty still infers LONG because the error cell is excluded from typing
    val df = read()
    assert(df.schema.fields.map(_.dataType).toSeq === Seq(StringType, LongType))
    assert(df.as[(Option[String], Option[Long])].collect().toSet
      === Set((Some("a"), Some(3L)), (None, None), (Some("c"), Some(7L))))
    // fallback mode: error cells become the type default instead of null
    val fb = read("setErrorCellsToFallbackValues" -> "true")
    assert(fb.as[(Option[String], Option[Long])].collect().toSet
      === Set((Some("a"), Some(3L)), (None, Some(0L)), (Some("c"), Some(7L))))
    // treatEmptyValuesAsNulls=false keeps the empty string
    val keep = read("treatEmptyValuesAsNulls" -> "false")
    assert(keep.select("name").as[Option[String]].collect().toSet
      === Set(Some("a"), Some(""), Some("c")))
  }

  test("column pruning reaches the excel scan (SupportsPushDownRequiredColumns)") {
    val dir = tmpDir()
    writeXlsx(s"$dir/prune.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("name"), s("qty"), s("price")),
      Seq(s("apple"), n("3"), n("1.5")))))
    val df = spark.read.format("excel").option("inferSchema", "true")
      .load(s"$dir/prune.xlsx").select("qty")
    val scanSchemas = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema()
    }
    assert(scanSchemas.nonEmpty)
    assert(scanSchemas.head.fieldNames.toSeq === Seq("qty"),
      s"scan not pruned: ${scanSchemas.head}")
    assert(df.as[Long].collect().toSeq === Seq(3L))
  }

  test("date-styled cells type as Date/Timestamp (numFmt styling)") {
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit
    val dir = tmpDir()
    // serials in the 1900 system: whole days for the date column, +0.5 day
    // (= 12:00:00) for the timestamp column with a CUSTOM numFmt (164)
    def serial(d: LocalDate): Long =
      ChronoUnit.DAYS.between(LocalDate.of(1899, 12, 30), d)
    val d1 = LocalDate.of(2024, 1, 15); val d2 = LocalDate.of(2025, 12, 31)
    writeXlsx(s"$dir/dates.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("evt"), s("day"), s("at")),
      Seq(s("a"), n(s"DATE:${serial(d1)}"), n(s"TS:${serial(d1)}.5")),
      Seq(s("b"), n(s"DATE:${serial(d2)}"), n(s"TS:${serial(d2)}.25")))))
    val df = spark.read.format("excel").option("inferSchema", "true")
      .load(s"$dir/dates.xlsx")
    assert(df.schema.fields.map(_.dataType).toSeq
      === Seq(StringType, DateType, TimestampType))
    val got = df.select(col("evt"), col("day").cast("string"),
      date_format(col("at"), "yyyy-MM-dd HH:mm:ss"))
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("a", "2024-01-15", "2024-01-15 12:00:00"),
      ("b", "2025-12-31", "2025-12-31 06:00:00")))
    // a user schema + timestampFormat parses STRING cells into timestamps
    writeXlsx(s"$dir/strts.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("when")), Seq(s("15/01/2024 10:30:00")))))
    val parsed = spark.read.format("excel")
      .option("timestampFormat", "dd/MM/yyyy HH:mm:ss")
      .schema(StructType(Seq(StructField("when", TimestampType))))
      .load(s"$dir/strts.xlsx")
    assert(parsed.select(date_format(col("when"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect().toSeq === Seq("2024-01-15 10:30:00"))
  }

  test("serialToString: 1900 leap bug, 1904 system, date format codes") {
    // the Lotus phantom 1900-02-29 (serial 60) collapses to Mar 1
    assert(XlsxParser.serialToString(59, date1904 = false) === "1900-02-28")
    assert(XlsxParser.serialToString(60, date1904 = false) === "1900-03-01")
    assert(XlsxParser.serialToString(61, date1904 = false) === "1900-03-01")
    assert(XlsxParser.serialToString(1, date1904 = false) === "1900-01-01")
    assert(XlsxParser.serialToString(0, date1904 = true) === "1904-01-01")
    assert(XlsxParser.serialToString(45306.5, date1904 = false)
      === "2024-01-15 12:00:00")
    // format-code heuristic: quoted/color/currency sections don't count
    assert(XlsxParser.isDateFormatCode("yyyy-mm-dd"))
    assert(XlsxParser.isDateFormatCode("[h]:mm:ss")) // elapsed time
    assert(XlsxParser.isDateFormatCode("""yyyy\-mm\-dd hh:mm:ss"""))
    assert(!XlsxParser.isDateFormatCode("#,##0.00"))
    assert(!XlsxParser.isDateFormatCode("General"))
    assert(!XlsxParser.isDateFormatCode("""[Red]#,##0;"hours owed" 0"""))
    assert(!XlsxParser.isDateFormatCode("""[$USD] #,##0"""))
  }

  test("encrypted workbook (agile ECMA-376): workbookPassword decrypts, wrong password fails") {
    val dir = tmpDir()
    writeXlsx(s"$dir/plain.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("name"), s("qty")),
      Seq(s("apple"), n("3")), Seq(s("pear"), n("7")))))
    val zip = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/plain.xlsx"))
    // low spinCount keeps the test fast; real files use 100k and only
    // cost more CPU in the same code path
    val enc = OfficeCrypto.encrypt(zip, "s3cret", spinCount = 1000)
    assert(OleCfb.isCfb(enc) && !java.util.Arrays.equals(enc, zip))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/enc.xlsx"), enc)

    val df = spark.read.format("excel")
      .option("inferSchema", "true").option("workbookPassword", "s3cret")
      .load(s"$dir/enc.xlsx")
    assert(df.as[(String, Long)].collect().toSet === Set(("apple", 3L), ("pear", 7L)))

    val noPw = intercept[Exception](
      spark.read.format("excel").load(s"$dir/enc.xlsx").collect())
    assert(noPw.getMessage.contains("workbookPassword") ||
      Option(noPw.getCause).exists(_.getMessage.contains("workbookPassword")))
    val badPw = intercept[Exception](
      spark.read.format("excel").option("workbookPassword", "nope")
        .load(s"$dir/enc.xlsx").collect())
    assert(badPw.getMessage.contains("wrong password") ||
      Option(badPw.getCause).exists(_.getMessage.contains("wrong password")))
  }

  test("legacy .xls (BIFF8): typed round-trip through the native source") {
    val dir = tmpDir()
    val epoch = java.time.LocalDate.of(1899, 12, 30).toEpochDay
    val d0 = java.time.LocalDate.of(2024, 1, 15).toEpochDay - epoch
    writeXls(s"$dir/wb.xls", "Data", Seq(
      Seq(s("name"), s("qty"), s("price"), s("ok"), s("born"), s("seen")),
      Seq(s("apple"), n("3"), n("1.5"), n("true"), n(s"DATE:$d0"), n(s"TS:${d0 + 0.5}")),
      Seq(s("pear"), n("7"), n("2.25"), n("false"), n(s"DATE:${d0 + 1}"), n(s"TS:${d0 + 1.75}"))))
    val df = spark.read.format("excel").option("inferSchema", "true")
      .load(s"$dir/wb.xls")
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      "name" -> StringType, "qty" -> LongType, "price" -> DoubleType,
      "ok" -> BooleanType, "born" -> DateType, "seen" -> TimestampType))
    val rows = df.orderBy("qty")
      .select(col("name"), col("qty"), col("price"), col("ok"),
        col("born").cast("string"), col("seen").cast("string"))
      .as[(String, Long, Double, Boolean, String, String)].collect().toSeq
    assert(rows === Seq(
      ("apple", 3L, 1.5, true, "2024-01-15", "2024-01-15 12:00:00"),
      ("pear", 7L, 2.25, false, "2024-01-16", "2024-01-16 18:00:00")))
  }

  test(".xls RK, MULRK and cached-formula cells decode; sheet select by name") {
    val dir = tmpDir()
    // row 1 (0-based) extra cells: RK int, RK int/100, RK double-bits,
    // MULRK pair, FORMULA cached number, FORMULA cached string + STRING
    val rkInt = (1234 << 2) | 2
    val rkX100 = (1234 << 2) | 3
    val rkDbl = ((java.lang.Double.doubleToLongBits(2.5) >>> 32) & 0xFFFFFFFCL).toInt
    val extras = Seq(
      rec(0x027E, le(10)(b => b.putShort(1).putShort(0).putShort(16).putInt(rkInt))),
      rec(0x027E, le(10)(b => b.putShort(1).putShort(1).putShort(16).putInt(rkX100))),
      rec(0x027E, le(10)(b => b.putShort(1).putShort(2).putShort(16).putInt(rkDbl))),
      rec(0x00BD, le(18) { b => // MULRK cols 3-4: 100, 200
        b.putShort(1).putShort(3)
        b.putShort(16).putInt((100 << 2) | 2); b.putShort(16).putInt((200 << 2) | 2)
        b.putShort(4)
      }),
      rec(0x0006, le(22) { b => // cached numeric formula result, col 5
        b.putShort(1).putShort(5).putShort(16).putDouble(42.5)
          .putShort(0).putInt(0).putShort(0)
      }),
      rec(0x0006, le(22) { b => // cached STRING formula result, col 6
        b.putShort(1).putShort(6).putShort(16)
          .put(0.toByte).put(Array.fill[Byte](5)(0)).putShort(0xFFFF.toShort)
          .putShort(0).putInt(0).putShort(0)
      }),
      rec(0x0207, le(3 + 5) { b =>
        b.putShort(5).put(0.toByte)
          .put("hello".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      }))
    writeXls(s"$dir/wb.xls", "S1",
      Seq(Seq(s("a"), s("b"), s("c"), s("d"), s("e"), s("f"), s("g"))),
      extraCells = extras)
    val df = spark.read.format("excel")
      .option("dataAddress", "'S1'!A1:G2").load(s"$dir/wb.xls")
    val r = df.collect().head.toSeq
    assert(r === Seq("1234", "12.34", "2.5", "100", "200", "42.5", "hello"))
    // wrong sheet name errors with the available names
    val e = intercept[Exception](spark.read.format("excel")
      .option("dataAddress", "'Nope'!A1:B2").load(s"$dir/wb.xls").collect())
    assert(e.getMessage.contains("S1") ||
      Option(e.getCause).exists(_.getMessage.contains("S1")))
  }

  test("encrypted legacy .xls (FILEPASS) fails with a clear unsupported error") {
    def le(n: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN); f(b); b.array()
    }
    def rec(id: Int, payload: Array[Byte]): Array[Byte] =
      le(4)(b => { b.putShort(id.toShort); b.putShort(payload.length.toShort) }) ++ payload
    val stream = Array.concat(
      rec(0x0809, le(16)(b => { b.putShort(0x0600.toShort); b.putShort(0x0005.toShort) })),
      rec(0x002F, le(6)(b => b.putShort(1.toShort))), // FILEPASS, RC4 scheme
      rec(0x000A, Array.empty[Byte]))
    val cfb = OleCfb.writeStreams(Seq("Workbook" -> stream))
    val e = intercept[IllegalArgumentException](
      XlsParser.workbook(XlsParser.workbookStream(OleCfb.readStreams(cfb)).get))
    assert(e.getMessage.contains("FILEPASS"))
  }

  test("OleCfb writer emits DIFAT chain sectors for >7MB payloads") {
    // 109 header DIFAT slots cover ~7 MB; 20 MB forces ~2 chained DIFAT
    // sectors — the round-4 writer threw here
    val big = Array.tabulate(20 * 1024 * 1024)(i => ((i * 31) % 251).toByte)
    val small = Array.tabulate(100)(_.toByte)
    val cfb = OleCfb.writeStreams(Seq("Big" -> big, "Small" -> small))
    val back = OleCfb.readStreams(cfb)
    assert(back("Big").take(big.length).toSeq === big.toSeq)
    assert(back("Small").take(small.length).toSeq === small.toSeq)
  }

  test("OfficeCrypto ciphertext is salted: same (zip, password) encrypts differently") {
    val zip = Array.tabulate(256)(_.toByte)
    val a = OfficeCrypto.encrypt(zip, "pw", spinCount = 10)
    val b = OfficeCrypto.encrypt(zip, "pw", spinCount = 10)
    assert(!java.util.Arrays.equals(a, b)) // SecureRandom salts/package key
    assert(OfficeCrypto.decrypt(a, "pw").toSeq === zip.toSeq)
    assert(OfficeCrypto.decrypt(b, "pw").toSeq === zip.toSeq)
  }

  test("OfficeCrypto round-trips multi-segment payloads through the CFB container") {
    // > 4096 bytes forces multiple AES segments with per-segment IVs
    val payload = Array.tabulate(10000)(i => ((i * 131) % 251).toByte)
    val enc = OfficeCrypto.encrypt(payload, "pw", spinCount = 100)
    assert(OfficeCrypto.decrypt(enc, "pw").toSeq === payload.toSeq)
    // CFB layer: streams round-trip by name with exact (padded) sizes
    val streams = OleCfb.readStreams(enc)
    assert(streams.keySet === Set("EncryptionInfo", "EncryptedPackage"))
    intercept[IllegalArgumentException](OfficeCrypto.decrypt(enc, "other"))
  }

  test("FileImport routes .xlsx resources through the native source") {
    val dir = tmpDir()
    writeXlsx(s"$dir/wb.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("id"), s("v")), Seq(n("1"), s("alpha")))))
    val conf = graft.core.ConfigLayer(Map(
      "hoodie.deltastreamer.excel.extra.options.inferSchema" -> "true"))
    val df = graft.apps.FileImport.readSource(spark, conf, Map("resource" -> s"$dir/wb.xlsx"))
    assert(df.columns.toSeq === Seq("id", "v"))
    assert(df.as[(Long, String)].collect().toSeq === Seq((1L, "alpha")))
  }
}
