package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** In-process loopback "mysqld" for the binlog specs: speaks HandshakeV10 +
  * `mysql_native_password` auth, the classic COM_QUERY text protocol
  * (`SELECT @@global.binlog_checksum`, `SET @master_binlog_checksum`) and
  * serves `COM_BINLOG_DUMP` from a fixed two-file binlog fixture — file
  * 000001: INSERT orders(id=1, item='widget'), INSERT users(id=7,
  * name='ada') @ pos 100/200; ROTATE; file 000002: UPDATE orders id 1
  * item widget→gadget @ 120, DELETE users id 7 @ 180. Dump requests from
  * any (file, pos) replay only later events (TABLE_MAPs re-sent so
  * resumes can decode), which is exactly a real server's retained-binlog
  * behavior. With `checksum` (the MySQL >= 5.6.6 default), every event
  * carries a CRC32 trailer and the dump is REFUSED unless the client
  * declared `@master_binlog_checksum` first — the real server's guard. */
final class MysqldLoopback(password: String, checksum: Boolean = true,
                           extended: Boolean = false,
                           partialImage: Boolean = false,
                           authSwitch: Option[String] = None,
                           bulkRows: Int = 0,
                           serverUuid: String = "3e11fa47-71ca-11e1-9e33-c80aa9429562",
                           fileBase: Long = 1L) {
  private val server = new ServerSocket(0, 8, java.net.InetAddress.getLoopbackAddress)
  @volatile private var running = true
  /** Retention-churn simulation: dumps strictly below this (fileIdx, pos)
    * are refused with the real server's fatal 1236 error. */
  @volatile private var purgeFloor: Option[(Long, Long)] = None
  def purgeBelow(fileIdx: Long, pos: Long): Unit = purgeFloor = Some((fileIdx, pos))
  private val sha1 = MessageDigest.getInstance("SHA-1")
  private def dig(parts: Array[Byte]*): Array[Byte] = {
    sha1.reset(); parts.foreach(sha1.update); sha1.digest()
  }
  private val nonce = Array.tabulate[Byte](20)(i => (i * 7 + 3).toByte)

  private def le(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); f(b); b.array()
  }
  /** v4 event: 19-byte header + payload. */
  private def event(tpe: Int, ts: Long, logPos: Long, payload: Array[Byte]): Array[Byte] =
    le(19 + payload.length) { b =>
      b.putInt(ts.toInt).put(tpe.toByte).putInt(1)
        .putInt(19 + payload.length).putInt(logPos.toInt).putShort(0).put(payload)
    }
  private def cstr(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
  private def tableMap(tableId: Long, db: String, tbl: String,
                       types: Seq[Int], varcharMax: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(le(8)(_.putLong(tableId)).take(6)) // table id (6 bytes)
    out.write(Array[Byte](0, 0)) // flags
    out.write(db.length); out.write(cstr(db))
    out.write(tbl.length); out.write(cstr(tbl))
    out.write(types.length) // lenenc (< 251)
    types.foreach(out.write)
    val meta = new java.io.ByteArrayOutputStream()
    types.zipWithIndex.foreach {
      case (15, i) => meta.write(le(2)(_.putShort(varcharMax(i).toShort)))
      case _ => ()
    }
    out.write(meta.size())
    meta.writeTo(out)
    out.write(Array.fill[Byte]((types.length + 7) / 8)(0)) // null-allowed bitmap
    out.toByteArray
  }
  /** images: one VALUES seq per row image (update rows pass before+after). */
  private def rowsEvent(tableId: Long, types: Seq[Int], varcharMax: Seq[Int],
                        images: Seq[Seq[Any]], update: Boolean): Array[Byte] = {
    val n = types.length
    val bm = (n + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    out.write(le(8)(_.putLong(tableId)).take(6))
    out.write(Array[Byte](0, 0))
    out.write(le(2)(_.putShort(2))) // extra-data length (just itself)
    out.write(n) // lenenc column count
    out.write(Array.fill[Byte](bm)(0xFF.toByte)) // included columns
    if (update) out.write(Array.fill[Byte](bm)(0xFF.toByte))
    images.foreach { img =>
      val nullBm = new Array[Byte](bm)
      img.zipWithIndex.foreach { case (v, i) =>
        if (v == null) nullBm(i / 8) = (nullBm(i / 8) | (1 << (i % 8))).toByte
      }
      out.write(nullBm)
      img.zipWithIndex.foreach { case (v, i) =>
        if (v != null) types(i) match {
          case 3 => out.write(le(4)(_.putInt(v.asInstanceOf[Int])))
          case 8 => out.write(le(8)(_.putLong(v.asInstanceOf[Long])))
          case 15 =>
            val bytes = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
            if (varcharMax(i) > 255) out.write(le(2)(_.putShort(bytes.length.toShort)))
            else out.write(bytes.length)
            out.write(bytes)
        }
      }
    }
    out.toByteArray
  }

  // ---------------- extended all-types fixture (`extended = true`) --------
  // Cells are BYTE-LITERAL on purpose: the fixture encodes the public wire
  // formats by hand, so the spec tests the client against the format, not
  // against a shared encoder.
  private def beB(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
  private def leB(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)
  /** decimal2bin: digit groups BE, sign bit into byte 0, negatives fully
    * inverted. `groups` = (value, byteWidth) per group. */
  private def decB(neg: Boolean, groups: Seq[(Long, Int)]): Array[Byte] = {
    val arr = groups.flatMap { case (v, n) => beB(v, n) }.toArray
    arr(0) = (arr(0) ^ 0x80).toByte
    if (neg) arr.map(b => (~b).toByte) else arr
  }
  private def dt2(year: Int, month: Int, day: Int, h: Int, m: Int, s: Int,
                  fracRaw: Long, fracBytes: Int): Array[Byte] = {
    val packed = ((((year * 13 + month).toLong << 5) | day) << 17) |
      (h << 12) | (m << 6) | s
    beB(packed + 0x8000000000L, 5) ++ (if (fracBytes > 0) beB(fracRaw, fracBytes) else Array.empty[Byte])
  }
  private def time2(negate: Boolean, h: Int, m: Int, s: Int,
                    fracRaw: Long, fracBytes: Int): Array[Byte] = {
    val v = (h << 12) | (m << 6) | s
    beB(0x800000L + (if (negate) -v else v), 3) ++
      (if (fracBytes > 0) beB(fracRaw, fracBytes) else Array.empty[Byte])
  }
  /** (type id, meta bytes) per alltypes column, TABLE_MAP order. */
  private val allCols: Seq[(Int, Array[Byte])] = Seq(
    1 -> Array.empty[Byte],                   // c_tiny    TINY
    2 -> Array.empty[Byte],                   // c_short   SHORT
    9 -> Array.empty[Byte],                   // c_int24   INT24
    4 -> Array[Byte](4),                      // c_float   FLOAT
    5 -> Array[Byte](8),                      // c_double  DOUBLE
    246 -> Array[Byte](14, 4),                // c_dec     DECIMAL(14,4)
    10 -> Array.empty[Byte],                  // c_date    DATE
    18 -> Array[Byte](3),                     // c_dt      DATETIME2(3)
    17 -> Array[Byte](0),                     // c_ts      TIMESTAMP2(0)
    19 -> Array[Byte](0),                     // c_time    TIME2(0)
    19 -> Array[Byte](2),                     // c_timef   TIME2(2)
    13 -> Array.empty[Byte],                  // c_year    YEAR
    252 -> Array[Byte](2),                    // c_text    TEXT/BLOB, 2-byte len
    254 -> Array[Byte](254.toByte, 32),       // c_char    CHAR, pack len 32
    254 -> Array[Byte](247.toByte, 1),        // c_enum    ENUM, 1 byte
    254 -> Array[Byte](248.toByte, 1),        // c_set     SET, 1 byte
    16 -> Array[Byte](4, 1))                  // c_bit     BIT(12)
  private def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)
  /** Two row images: full values, then one with NULLs scattered mid-row so
    * offset tracking across the null bitmap is exercised. */
  private val allRow1: Seq[Array[Byte]] = Seq(
    leB(-5L & 0xFF, 1), leB(-1234L & 0xFFFF, 2), leB(-70000L & 0xFFFFFF, 3),
    leB(java.lang.Float.floatToIntBits(1.25f).toLong & 0xFFFFFFFFL, 4),
    leB(java.lang.Double.doubleToLongBits(-2.5), 8),
    decB(neg = true, Seq((0L, 1), (123456789L, 4), (123L, 2))), // -123456789.0123
    leB((2024L << 9) | (2 << 5) | 29, 3),                        // 2024-02-29
    dt2(2024, 2, 29, 13, 14, 15, 2500, 2),       // 2024-02-29 13:14:15.250
    beB(1700000000L, 4),                         // 2023-11-14 22:13:20 UTC
    time2(negate = true, 12, 34, 56, 0, 0),      // -12:34:56
    time2(negate = false, 12, 34, 56, 78, 1),    // 12:34:56.78
    Array[Byte](124),                            // 2024
    leB(utf8("héllo \"q\"\n").length.toLong, 2) ++ utf8("héllo \"q\"\n"),
    Array[Byte](3) ++ utf8("abc"),
    Array[Byte](2), Array[Byte](5),
    beB(0xABCL, 2))
  private val allRow2Nulls = Set(5, 6, 12) // c_dec, c_date, c_text
  private val allRow2: Seq[Array[Byte]] = Seq(
    leB(7, 1), leB(300, 2), leB(99999, 3),
    leB(java.lang.Float.floatToIntBits(-0.5f).toLong & 0xFFFFFFFFL, 4),
    leB(java.lang.Double.doubleToLongBits(1000000.0), 8),
    null,                                        // c_dec NULL
    null,                                        // c_date NULL
    dt2(2024, 3, 1, 0, 0, 0, 0, 2),              // 2024-03-01 00:00:00.000
    beB(1700000001L, 4),                         // +1 s
    time2(negate = false, 0, 0, 5, 0, 0),        // 00:00:05
    time2(negate = false, 1, 2, 3, 4, 1),        // 01:02:03.04
    Array[Byte](0),                              // year 0
    null,                                        // c_text NULL
    Array[Byte](0),                              // c_char ""
    Array[Byte](1), Array[Byte](0),
    beB(1L, 2))
  private def allTableMap(tableId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(le(8)(_.putLong(tableId)).take(6)); out.write(Array[Byte](0, 0))
    out.write("shop".length); out.write(cstr("shop"))
    out.write("alltypes".length); out.write(cstr("alltypes"))
    out.write(allCols.length)
    allCols.foreach { case (t, _) => out.write(t) }
    val meta = allCols.flatMap(_._2).toArray
    out.write(meta.length); out.write(meta)
    out.write(Array.fill[Byte]((allCols.length + 7) / 8)(0))
    out.toByteArray
  }
  /** Rows event over the alltypes table. `incBefore`/`incAfter` carry the
    * ABSOLUTE column indices present in before/after images (partial ⇒
    * `binlog_row_image=MINIMAL`/`NOBLOB`): per the real server's
    * Rows_log_event layout the per-image null bitmap is sized and indexed
    * over the INCLUDED columns only, and values pack back-to-back over
    * included non-null cells. For `update`, images alternate
    * (before, after). */
  private def allRowsEvent(tableId: Long, images: Seq[Seq[Array[Byte]]],
                           nulls: Seq[Set[Int]], update: Boolean = false,
                           incBefore: Option[Set[Int]] = None,
                           incAfter: Option[Set[Int]] = None): Array[Byte] = {
    val n = allCols.length
    val bm = (n + 7) / 8
    val incB = incBefore.getOrElse((0 until n).toSet)
    val incA = incAfter.getOrElse(incB)
    val out = new java.io.ByteArrayOutputStream()
    out.write(le(8)(_.putLong(tableId)).take(6)); out.write(Array[Byte](0, 0))
    out.write(le(2)(_.putShort(2)))
    out.write(n)
    def bitmap(inc: Set[Int]): Array[Byte] = {
      val a = new Array[Byte](bm)
      inc.foreach(i => a(i / 8) = (a(i / 8) | (1 << (i % 8))).toByte)
      a
    }
    out.write(bitmap(incB))
    if (update) out.write(bitmap(incA))
    images.zip(nulls).zipWithIndex.foreach { case ((img, nl), k) =>
      val incList = (0 until n).filter(if (update && k % 2 == 1) incA else incB)
      val nullBm = new Array[Byte]((incList.length + 7) / 8)
      incList.zipWithIndex.foreach { case (i, j) =>
        if (nl(i)) nullBm(j / 8) = (nullBm(j / 8) | (1 << (j % 8))).toByte }
      out.write(nullBm)
      incList.foreach(i => if (!nl(i)) out.write(img(i)))
    }
    out.toByteArray
  }
  private def extendedFixture: Seq[(Long, Long, Array[Byte])] =
    if (!partialImage) Seq(
      (2L, 300L, event(19, 1004, 300, allTableMap(13))),
      (2L, 380L, event(30, 1004, 380,
        allRowsEvent(13, Seq(allRow1, allRow2), Seq(Set.empty, allRow2Nulls)))))
    else {
      // binlog_row_image partial fixtures:
      //  - NOBLOB write: every column except the TEXT one (idx 12)
      //  - MINIMAL update: before image = PK only (c_tiny); after image =
      //    PK + changed columns, incl. a NULLed TEXT so the included-only
      //    null bitmap indexing is exercised
      val noblob = (0 until allCols.length).toSet - 12
      Seq(
        (2L, 300L, event(19, 1004, 300, allTableMap(13))),
        (2L, 380L, event(30, 1004, 380,
          allRowsEvent(13, Seq(allRow1, allRow2), Seq(Set.empty, allRow2Nulls),
            incBefore = Some(noblob)))),
        (2L, 460L, event(31, 1005, 460,
          allRowsEvent(13, Seq(allRow1, allRow2), Seq(Set.empty, Set(12)),
            update = true, incBefore = Some(Set(0)),
            incAfter = Some(Set(0, 1, 12))))))
    }

  private val ordersTypes = Seq(3, 15); private val ordersMax = Seq(0, 64)
  private val usersTypes = Seq(8, 15); private val usersMax = Seq(0, 300)
  /** (fileIdx, logPos, eventBytes) in stream order; TABLE_MAPs precede. */
  private def baseFixture: Seq[(Long, Long, Array[Byte])] = Seq(
    (1L, 60L, event(19, 1000, 60, tableMap(11, "shop", "orders", ordersTypes, ordersMax))),
    (1L, 100L, event(30, 1000, 100,
      rowsEvent(11, ordersTypes, ordersMax, Seq(Seq(1, "widget")), update = false))),
    (1L, 160L, event(19, 1001, 160, tableMap(12, "shop", "users", usersTypes, usersMax))),
    (1L, 200L, event(30, 1001, 200,
      rowsEvent(12, usersTypes, usersMax, Seq(Seq(7L, "ada")), update = false))),
    (2L, 60L, event(19, 1002, 60, tableMap(11, "shop", "orders", ordersTypes, ordersMax))),
    (2L, 120L, event(31, 1002, 120,
      rowsEvent(11, ordersTypes, ordersMax,
        Seq(Seq(1, "widget"), Seq(1, "gadget")), update = true))),
    (2L, 150L, event(19, 1003, 150, tableMap(12, "shop", "users", usersTypes, usersMax))),
    (2L, 180L, event(32, 1003, 180,
      rowsEvent(12, usersTypes, usersMax, Seq(Seq(7L, null)), update = false))))
  /** Throughput fixture (`bulkRows > 0`): `bulkRows` insert row images in
    * 100-row events appended to file 000002 — sized for drain-rate probes
    * (events/s of the socket+decode path), not correctness. */
  private def bulkFixture: Seq[(Long, Long, Array[Byte])] =
    if (bulkRows == 0) Seq.empty
    else {
      val perEvent = 100
      (0 until (bulkRows + perEvent - 1) / perEvent).map { i =>
        val n = math.min(perEvent, bulkRows - i * perEvent)
        val images = (0 until n).map(j =>
          Seq[Any](i * perEvent + j, s"bulk-item-${i * perEvent + j}"))
        val pos = 1000L + i
        (2L, pos, event(30, 2000 + i, pos,
          rowsEvent(11, ordersTypes, ordersMax, images, update = false)))
      }
    }
  private def fixture: Seq[(Long, Long, Array[Byte])] =
    (if (extended) baseFixture ++ extendedFixture else baseFixture) ++ bulkFixture

  private val acceptor = new Thread(() => {
    while (running) {
      try { val s = server.accept(); new Thread(() => serve(s)).start() }
      catch { case _: Exception => () }
    }
  })
  acceptor.setDaemon(true); acceptor.start()

  private def serve(sock: java.net.Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      // HandshakeV10
      val g = new java.io.ByteArrayOutputStream()
      g.write(10); g.write(cstr("8.0.99-loopback")); g.write(le(4)(_.putInt(99)))
      g.write(nonce, 0, 8); g.write(0)
      g.write(le(2)(_.putShort(0xFFFF.toShort))); g.write(33)
      g.write(le(2)(_.putShort(2))); g.write(le(2)(_.putShort(0xC7.toShort)))
      g.write(21); g.write(new Array[Byte](10))
      g.write(nonce, 8, 12); g.write(0)
      g.write(cstr("mysql_native_password"))
      BinlogWire.writePacket(out, 0, g.toByteArray)
      // HandshakeResponse41: user cstring after 32 fixed bytes, then scramble
      val (resp, _) = BinlogWire.readPacket(in)
      if (authSwitch.isDefined) { // AuthSwitchRequest (e.g. MySQL 8 CSP)
        BinlogWire.writePacket(out, 2,
          Array[Byte](0xFE.toByte) ++ cstr(authSwitch.get) ++ nonce ++ Array[Byte](0))
        return
      }
      var p = 32
      while (resp(p) != 0) p += 1
      p += 1
      val sl = resp(p) & 0xFF; p += 1
      val scr = java.util.Arrays.copyOfRange(resp, p, p + sl)
      val pw2 = dig(dig(password.getBytes(StandardCharsets.UTF_8)))
      val expectPw1 = dig(nonce, pw2).zip(scr).map { case (a, c) => (a ^ c).toByte }
      if (sl == 0 || !java.util.Arrays.equals(dig(expectPw1), pw2)) {
        BinlogWire.writePacket(out, 2,
          Array[Byte](0xFF.toByte, 0x15, 0x04, '#', '2', '8', '0', '0', '0') ++
            "Access denied".getBytes(StandardCharsets.UTF_8))
        return
      }
      BinlogWire.writePacket(out, 2, Array[Byte](0, 0, 0, 2, 0, 0, 0)) // OK
      // command loop: COM_QUERY until COM_BINLOG_DUMP arrives
      var declared = false
      var dump: Array[Byte] = null
      while (dump == null) {
        val (cmd, _) = BinlogWire.readPacket(in)
        (cmd(0) & 0xFF) match {
          case 0x03 => // COM_QUERY, classic text protocol
            val sql = new String(cmd, 1, cmd.length - 1, StandardCharsets.UTF_8)
            if (sql.toLowerCase.startsWith("select")) {
              BinlogWire.writePacket(out, 1, Array[Byte](1)) // 1 column
              BinlogWire.writePacket(out, 2, "def".getBytes) // column def
              BinlogWire.writePacket(out, 3, Array[Byte](0xFE.toByte, 0, 0, 2, 0))
              val v = if (checksum) "CRC32" else "NONE"
              BinlogWire.writePacket(out, 4,
                v.length.toByte +: v.getBytes(StandardCharsets.UTF_8))
              BinlogWire.writePacket(out, 5, Array[Byte](0xFE.toByte, 0, 0, 2, 0))
            } else { // SET @master_binlog_checksum
              declared = true
              BinlogWire.writePacket(out, 1, Array[Byte](0, 0, 0, 2, 0, 0, 0))
            }
          case 0x12 | 0x1E => dump = cmd
          case other => throw new IllegalStateException(f"unexpected command 0x$other%02x")
        }
      }
      if (checksum && !declared) { // the real server's guard
        BinlogWire.writePacket(out, 1,
          Array[Byte](0xFF.toByte, 0x36, 0x13, '#', 'H', 'Y', '0', '0', '0') ++
            ("Slave can not handle replication events with the checksum " +
              "that master is configured to log").getBytes(StandardCharsets.UTF_8))
        return
      }
      var seq = 1
      def send(ev: Array[Byte]): Unit = {
        val body = if (checksum) {
          val crc = new java.util.zip.CRC32(); crc.update(ev)
          ev ++ le(4)(_.putInt(crc.getValue.toInt))
        } else ev
        BinlogWire.writePacket(out, seq, 0.toByte +: body); seq += 1
      }
      if ((dump(0) & 0xFF) == 0x1E) {
        // COM_BINLOG_DUMP_GTID: flags(2)@1 server-id(4)@3 name-len(4)@7
        // name pos(8) data-len(4) encoded executed set. File name/pos are
        // ignored in GTID mode — the set alone decides what to stream
        // (which is the whole point: file names don't survive failover).
        val db = ByteBuffer.wrap(dump).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = db.getInt(7)
        var q = 11 + nameLen + 8
        val dataLen = db.getInt(q); q += 4
        val executed = GtidSet.decode(java.util.Arrays.copyOfRange(dump, q, q + dataLen))
        send(event(15, 999, 4, new Array[Byte](84))) // FORMAT_DESCRIPTION
        // fake ROTATE naming the CURRENT file (a restarted primary may
        // have any fileBase — resume must not care)
        send(event(4, 999, 0,
          le(8)(_.putLong(4L)) ++ s"binlog.${"%06d".format(fileBase)}".getBytes))
        // one transaction per base-fixture rows event, gno 1..4:
        // GTID → TABLE_MAP → ROWS → XID
        val rowsEvents = baseFixture.filter { case (_, _, ev) => (ev(4) & 0xFF) != 19 }
        val maps = baseFixture.filter { case (_, _, ev) => (ev(4) & 0xFF) == 19 }
        rowsEvents.zipWithIndex.foreach { case ((idx, pos, ev), i) =>
          val gno = i + 1L
          if (!executed.contains(serverUuid, gno)) {
            send(event(33, 1000 + i, pos - 20, // GTID: flags(1) sid(16) gno(8)
              Array[Byte](1) ++ GtidSet.sidBytes(serverUuid) ++ le(8)(_.putLong(gno))))
            send(maps(i)._3) // the TABLE_MAP paired with this rows event
            send(ev)
            send(event(16, 1000 + i, pos + 10, le(8)(_.putLong(7000 + gno)))) // XID
          }
        }
        BinlogWire.writePacket(out, seq, Array[Byte](0xFE.toByte, 0, 0, 2, 0))
        return
      }
      val db = ByteBuffer.wrap(dump).order(ByteOrder.LITTLE_ENDIAN)
      val startPos = db.getInt(1).toLong & 0xFFFFFFFFL
      val startFile = new String(dump, 11, dump.length - 11, StandardCharsets.UTF_8)
      val startIdx = BinlogWire.fileIndex(startFile)
      if (purgeFloor.exists { case (fi, fp) =>
          startIdx < fi || (startIdx == fi && startPos < fp) }) {
        BinlogWire.writePacket(out, 1, // ER_MASTER_FATAL_ERROR_READING_BINLOG
          Array[Byte](0xFF.toByte, 0xD4.toByte, 0x04, '#', 'H', 'Y', '0', '0', '0') ++
            ("Could not find first log file name in binary log index file")
              .getBytes(StandardCharsets.UTF_8))
        return
      }
      send(event(15, 999, 4, new Array[Byte](84))) // FORMAT_DESCRIPTION
      var lastIdx = startIdx
      fixture.foreach { case (idx, pos, ev) =>
        val due = idx > startIdx || (idx == startIdx && pos > startPos)
        val isMap = (ev(4) & 0xFF) == 19
        if (idx != lastIdx && due) {
          send(event(4, 999, 0, // ROTATE to the next file
            le(8)(_.putLong(4L)) ++ s"binlog.${"%06d".format(idx)}".getBytes))
          lastIdx = idx
        }
        if (due || isMap) send(ev) // maps re-sent so resumes can decode
      }
      BinlogWire.writePacket(out, seq, Array[Byte](0xFE.toByte, 0, 0, 2, 0)) // EOF
    } catch { case _: Exception => () }
    finally sock.close()
  }

  def port: Int = server.getLocalPort
  def stop(): Unit = { running = false; server.close() }
}
