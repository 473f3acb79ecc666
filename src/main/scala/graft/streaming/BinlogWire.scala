package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** S12 live-read path: a JDK-only MySQL replication client — the real wire
  * protocol a binlog tailer speaks (reference:
  * `boxer-binlog/.../HoodieBinlogDeltaStreamer.scala:77-89`): packet
  * framing, HandshakeV10 + `mysql_native_password` scramble,
  * `COM_BINLOG_DUMP`, and the v4 binlog event stream
  * (FORMAT_DESCRIPTION / ROTATE / TABLE_MAP / WRITE·UPDATE·DELETE_ROWS v2)
  * decoded into the exact [[CdcSchema.EventSchema]] rows the file-backed
  * source emits — so demux sinks, offset resume and table registries
  * compose unchanged. The zero-egress sandbox has no mysqld; the spec
  * drives this against an in-process loopback server speaking the
  * identical protocol, auth included.
  *
  * Scope: the full row-image column surface a real table hits —
  * TINY/SHORT/INT24/LONG/LONGLONG, FLOAT/DOUBLE, NEWDECIMAL, DATE,
  * DATETIME2/TIMESTAMP2/TIME2 (fractional seconds included), YEAR, BIT,
  * CHAR/VARCHAR, ENUM/SET, BLOB+TEXT, NULL — binary formats per the
  * public MySQL source (`my_time.c` temporal packing, `decimal.c`
  * `decimal2bin` digit groups, `log_event.cc` TABLE_MAP metadata). The
  * registry maps positions to column names — binlogs carry no names
  * unless `binlog_row_metadata=FULL`. Rows events with a partial
  * included-columns bitmap (`binlog_row_image=MINIMAL`/`NOBLOB`) decode
  * correctly: the per-image null bitmap and value positions cover the
  * INCLUDED columns only, and omitted columns are reported in the
  * payload's `"_omitted"` list (absent ≠ NULL — a partial-update merge
  * keeps the stored value for omitted columns). TEXT and BLOB
  * both arrive as type 252 and are emitted as UTF-8 strings (binlogs
  * don't distinguish them without `binlog_row_metadata=FULL`); negative
  * fractional TIME decodes on the positive-value convention.
  * `BINLOG_DUMP_NON_BLOCK` is set, so
  * a call drains to the current end of the stream and returns (a batch
  * pull; the streaming wrapper re-pulls from the last offset). Offsets
  * encode as [[BinlogOffset]] (file-suffix index, event log_pos). */
object BinlogWire {

  private val ComBinlogDump = 0x12
  private val ComBinlogDumpGtid = 0x1E
  private val EvRotate = 4
  private val EvXid = 16
  private val EvTableMap = 19
  private val EvWriteRowsV2 = 30
  private val EvUpdateRowsV2 = 31
  private val EvDeleteRowsV2 = 32
  private val EvGtid = 33

  // MySQL column type ids this client decodes (protocol ids; BLOB covers
  // TINY/MEDIUM/LONG BLOB and TEXT — binlogs send all four as 252)
  private val TypeTiny = 1
  private val TypeShort = 2
  private val TypeLong = 3
  private val TypeFloat = 4
  private val TypeDouble = 5
  private val TypeLongLong = 8
  private val TypeInt24 = 9
  private val TypeDate = 10
  private val TypeYear = 13
  private val TypeVarchar = 15
  private val TypeBit = 16
  private val TypeTimestamp2 = 17
  private val TypeDatetime2 = 18
  private val TypeTime2 = 19
  private val TypeNewDecimal = 246
  private val TypeEnum = 247 // appears only inside STRING metadata
  private val TypeSet = 248  // appears only inside STRING metadata
  private val TypeBlob = 252
  private val TypeVarString = 253
  private val TypeString = 254

  /** Read binlog events from `host:port` starting at (file, pos) until the
    * server reports end-of-stream; returns [[CdcSchema.EventSchema]] rows.
    * `columns`: (db, table) → ordered column names for the row images. */
  def scan(spark: SparkSession, host: String, port: Int,
           user: String, password: String,
           file: String, pos: Long, serverId: Long = 65535L,
           columns: Map[(String, String), Seq[String]] = Map.empty): DataFrame = {
    val events = spark.sparkContext.parallelize(Seq(0), 1).mapPartitions { _ =>
      pull(host, port, user, password, file, pos, serverId, columns).iterator
    }
    spark.createDataFrame(events.map(e =>
      Row(e.db, e.table, e.op, e.tsMs, e.offset, e.payload)), CdcSchema.EventSchema)
  }

  final case class CdcEvent(db: String, table: String, op: String,
                            tsMs: Long, offset: Long, payload: String,
                            before: String = null)

  /** Numeric suffix of a binlog file name (`binlog.000007` → 7). */
  def fileIndex(name: String): Long = {
    val dot = name.lastIndexOf('.')
    require(dot >= 0 && dot < name.length - 1, s"no numeric suffix: $name")
    name.substring(dot + 1).toLong
  }

  // ---------------------------------------------------------- protocol
  def pull(host: String, port: Int, user: String, password: String,
           file: String, pos: Long, serverId: Long,
           columns: Map[(String, String), Seq[String]],
           maxEvents: Int = Int.MaxValue): Seq[CdcEvent] = {
    val sock = new java.net.Socket(host, port)
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      handshake(in, out, user, password)
      // Checksum negotiation, the replica ritual (MySQL >= 5.6 defaults to
      // binlog_checksum=CRC32 and refuses a dump from a slave that has not
      // declared @master_binlog_checksum): ask the server, declare back.
      val crc32 = queryScalar(in, out, "SELECT @@global.binlog_checksum")
        .exists(_.equalsIgnoreCase("CRC32"))
      if (crc32)
        queryScalar(in, out,
          "SET @master_binlog_checksum = @@global.binlog_checksum")
      // COM_BINLOG_DUMP: pos(4) flags(2: 0x01 = NON_BLOCK) server-id(4) file
      val fb = file.getBytes(StandardCharsets.UTF_8)
      val cmd = ByteBuffer.allocate(11 + fb.length).order(ByteOrder.LITTLE_ENDIAN)
      cmd.put(ComBinlogDump.toByte).putInt(pos.toInt).putShort(1)
        .putInt(serverId.toInt).put(fb)
      writePacket(out, 0, cmd.array())
      readEvents(in, file, columns, crc32, maxEvents)
    } finally sock.close()
  }

  /** GTID-mode pull — the production-standard resume path: instead of a
    * (file, position) pair, the client presents the executed-GTID set and
    * the server streams every transaction NOT in it
    * (`COM_BINLOG_DUMP_GTID`). Survives primary failover and binlog
    * renames: file names never enter the resume token.
    *
    * Returns (events, new executed set in MySQL text form). Only
    * transactions whose XID commit was seen are folded into the returned
    * set — a drain cut mid-transaction re-delivers that transaction on
    * the next pull (at-least-once per partial transaction; the demux
    * sink's idempotent keyed upsert absorbs the replay). `maxEvents` is
    * therefore honored at TRANSACTION boundaries in this mode. */
  def pullGtid(host: String, port: Int, user: String, password: String,
               gtidSet: String, serverId: Long = 65535L,
               columns: Map[(String, String), Seq[String]] = Map.empty,
               maxEvents: Int = Int.MaxValue): (Seq[CdcEvent], String) = {
    val sock = new java.net.Socket(host, port)
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      handshake(in, out, user, password)
      val crc32 = queryScalar(in, out, "SELECT @@global.binlog_checksum")
        .exists(_.equalsIgnoreCase("CRC32"))
      if (crc32)
        queryScalar(in, out,
          "SET @master_binlog_checksum = @@global.binlog_checksum")
      val set = GtidSet.parse(gtidSet)
      val enc = set.encoded
      // COM_BINLOG_DUMP_GTID: flags(2: NON_BLOCK | THROUGH_GTID)
      // server-id(4) name-len(4) name pos(8) data-len(4) gtid-set
      val cmd = ByteBuffer.allocate(1 + 2 + 4 + 4 + 8 + 4 + enc.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      cmd.put(ComBinlogDumpGtid.toByte).putShort((0x01 | 0x04).toShort)
        .putInt(serverId.toInt).putInt(0).putLong(4L)
        .putInt(enc.length).put(enc)
      writePacket(out, 0, cmd.array())
      val tracker = new GtidTracker(set)
      // the server opens with a fake ROTATE naming its current file, so
      // the placeholder start index is corrected before any rows decode
      val events = readEvents(in, "binlog.000000", columns, crc32, maxEvents,
        tracker)
      (events, tracker.executed.format)
    } finally sock.close()
  }

  /** Mutable executed-set accumulator for [[pullGtid]]: a GTID event opens
    * a pending transaction; only its XID commit folds it into `executed`. */
  private final class GtidTracker(initial: GtidSet) {
    var executed: GtidSet = initial
    var pending: Option[(String, Long)] = None
    def open(sid: Array[Byte], gno: Long): Unit =
      pending = Some((GtidSet.sidString(sid), gno))
    def commit(): Unit = {
      pending.foreach { case (sid, gno) => executed = executed.add(sid, gno) }
      pending = None
    }
  }

  /** COM_QUERY with a 0-or-1 scalar result (classic text protocol, EOF
    * packets — CLIENT_DEPRECATE_EOF is not negotiated). Returns None for
    * OK-only statements (SET) and NULL scalars. */
  private def queryScalar(in: DataInputStream, out: DataOutputStream,
                          sql: String): Option[String] = {
    writePacket(out, 0, 0x03.toByte +: sql.getBytes(StandardCharsets.UTF_8))
    val (first, _) = readPacket(in)
    (first(0) & 0xFF) match {
      case 0x00 => None // OK — no resultset
      case 0xFF => throw new java.io.IOException(
        "query failed: " + new String(first, 9, first.length - 9, StandardCharsets.UTF_8))
      case nCols =>
        for (_ <- 0 until nCols) readPacket(in) // column definitions
        readPacket(in) // EOF after column defs
        var result: Option[String] = None
        var done = false
        while (!done) {
          val (row, _) = readPacket(in)
          if ((row(0) & 0xFF) == 0xFE && row.length < 9) done = true // EOF
          else if (result.isEmpty && (row(0) & 0xFF) != 0xFB) { // 0xFB = NULL
            val (len, p) = lenenc(row, 0)
            result = Some(new String(row, p, len.toInt, StandardCharsets.UTF_8))
          }
        }
        result
    }
  }

  /** HandshakeV10 → HandshakeResponse41 with the mysql_native_password
    * scramble: SHA1(pw) XOR SHA1(nonce ‖ SHA1(SHA1(pw))). */
  private def handshake(in: DataInputStream, out: DataOutputStream,
                        user: String, password: String): Unit = {
    val (greeting, _) = readPacket(in)
    require((greeting(0) & 0xFF) == 10, s"unsupported protocol ${greeting(0)}")
    var p = 1
    while (greeting(p) != 0) p += 1 // server version cstring
    p += 1 + 4 // thread id
    val nonce1 = java.util.Arrays.copyOfRange(greeting, p, p + 8)
    p += 8 + 1 // filler
    p += 2 + 1 + 2 + 2 + 1 + 10 // caps low, charset, status, caps high, auth len, reserved
    val nonce2 = java.util.Arrays.copyOfRange(greeting, p, p + 12) // 13th is NUL
    val nonce = nonce1 ++ nonce2
    val sha1 = MessageDigest.getInstance("SHA-1")
    def dig(parts: Array[Byte]*): Array[Byte] = {
      sha1.reset(); parts.foreach(sha1.update); sha1.digest()
    }
    val scramble =
      if (password.isEmpty) Array.empty[Byte]
      else {
        val pw1 = dig(password.getBytes(StandardCharsets.UTF_8))
        dig(nonce, dig(pw1)).zip(pw1).map { case (a, b) => (a ^ b).toByte }
      }
    val userB = user.getBytes(StandardCharsets.UTF_8)
    val plugin = "mysql_native_password".getBytes(StandardCharsets.UTF_8)
    val resp = ByteBuffer.allocate(4 + 4 + 1 + 23 + userB.length + 1 +
        1 + scramble.length + plugin.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    // CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
    resp.putInt(0x00000200 | 0x00008000 | 0x00080000)
    resp.putInt(1 << 24) // max packet
    resp.put(33.toByte)  // utf8 charset
    resp.position(resp.position() + 23)
    resp.put(userB).put(0.toByte)
    resp.put(scramble.length.toByte).put(scramble)
    resp.put(plugin).put(0.toByte)
    writePacket(out, 1, resp.array())
    val (reply, _) = readPacket(in)
    if ((reply(0) & 0xFF) == 0xFF) throw new java.io.IOException(
      "mysql auth failed: " + new String(reply, 9, reply.length - 9, StandardCharsets.UTF_8))
    if ((reply(0) & 0xFF) == 0xFE) {
      // AuthSwitchRequest: server wants another plugin (MySQL 8 defaults to
      // caching_sha2_password) — fail actionably instead of "unexpected"
      var e = 1
      while (e < reply.length && reply(e) != 0) e += 1
      val plugin = new String(reply, 1, e - 1, StandardCharsets.UTF_8)
      throw new java.io.IOException(
        s"server requires $plugin authentication; create the replication " +
          "user with mysql_native_password")
    }
    require((reply(0) & 0xFF) == 0x00, f"unexpected auth reply 0x${reply(0)}%02x")
  }

  /** Decode the event stream until EOF (or `maxEvents` rows — always at an
    * event boundary, so multi-row events never split and the last emitted
    * offset is a valid resume position). Maintains the current binlog file
    * (ROTATE) and the TABLE_MAP registry (table-id → db/table/types/meta).
    * With `crc32`, each event carries a 4-byte CRC32 trailer — verified,
    * then excluded from parsing. */
  private def readEvents(in: DataInputStream, startFile: String,
                         columns: Map[(String, String), Seq[String]],
                         crc32: Boolean, maxEvents: Int,
                         gtid: GtidTracker = null): Seq[CdcEvent] = {
    var currentIdx = fileIndex(startFile)
    final case class TableDef(db: String, table: String, types: Array[Int], meta: Array[Int])
    val tables = scala.collection.mutable.Map.empty[Long, TableDef]
    val outRows = scala.collection.mutable.ArrayBuffer.empty[CdcEvent]
    var done = false
    while (!done) {
      val (pkt, _) = readPacket(in)
      (pkt(0) & 0xFF) match {
        case 0xFE if pkt.length < 9 => done = true // EOF: caught up
        case 0xFF => throw new java.io.IOException(
          "binlog dump error: " + new String(pkt, 9, pkt.length - 9, StandardCharsets.UTF_8))
        case 0x00 =>
          val end = if (crc32) pkt.length - 4 else pkt.length
          if (crc32) {
            val crc = new java.util.zip.CRC32()
            crc.update(pkt, 1, end - 1) // event header + body, not the OK byte
            val expect = ByteBuffer.wrap(pkt, end, 4)
              .order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
            if (crc.getValue != expect) throw new java.io.IOException(
              f"binlog event CRC32 mismatch: got ${crc.getValue}%08x want $expect%08x")
          }
          val b = ByteBuffer.wrap(pkt).order(ByteOrder.LITTLE_ENDIAN)
          val ts = b.getInt(1).toLong & 0xFFFFFFFFL
          val evType = pkt(5) & 0xFF
          val logPos = b.getInt(14).toLong & 0xFFFFFFFFL
          var p = 20 // 1 OK byte + 19-byte header
          evType match {
            case EvRotate =>
              val name = new String(pkt, p + 8, end - p - 8, StandardCharsets.UTF_8)
              currentIdx = fileIndex(name)
            case EvTableMap =>
              val tableId = (b.getInt(p).toLong & 0xFFFFFFFFL) |
                ((b.getShort(p + 4).toLong & 0xFFFFL) << 32)
              p += 6 + 2
              val dbLen = pkt(p) & 0xFF; p += 1
              val db = new String(pkt, p, dbLen, StandardCharsets.UTF_8); p += dbLen + 1
              val tblLen = pkt(p) & 0xFF; p += 1
              val tbl = new String(pkt, p, tblLen, StandardCharsets.UTF_8); p += tblLen + 1
              val (nCols, p1) = lenenc(pkt, p); p = p1
              val types = Array.tabulate(nCols.toInt)(i => pkt(p + i) & 0xFF)
              p += nCols.toInt
              val (metaLen, p2) = lenenc(pkt, p); p = p2
              val metaEnd = p + metaLen.toInt
              // per-type metadata widths/encodings: log_event.cc
              // Table_map_log_event::save_field_metadata
              val meta = types.map {
                case TypeVarchar | TypeVarString => // max length, 2 bytes LE
                  val m = (pkt(p) & 0xFF) | ((pkt(p + 1) & 0xFF) << 8); p += 2; m
                case TypeNewDecimal => // (precision, scale) — packed
                  val m = ((pkt(p) & 0xFF) << 8) | (pkt(p + 1) & 0xFF); p += 2; m
                case TypeString => // (real type | borrowed len bits, len) — raw
                  val m = ((pkt(p) & 0xFF) << 8) | (pkt(p + 1) & 0xFF); p += 2; m
                case TypeBit => // (bits % 8, bits / 8) — store total bits
                  val m = (pkt(p) & 0xFF) + 8 * (pkt(p + 1) & 0xFF); p += 2; m
                case TypeFloat | TypeDouble | TypeBlob => // pack/length-bytes
                  val m = pkt(p) & 0xFF; p += 1; m
                case TypeTimestamp2 | TypeDatetime2 | TypeTime2 => // fsp
                  val m = pkt(p) & 0xFF; p += 1; m
                case TypeTiny | TypeShort | TypeInt24 | TypeLong | TypeLongLong |
                     TypeDate | TypeYear => 0
                case other => throw new IllegalArgumentException(
                  s"unsupported binlog column type $other in $db.$tbl")
              }
              require(p == metaEnd, s"metadata block length mismatch in $db.$tbl")
              tables(tableId) = TableDef(db, tbl, types, meta)
            case EvWriteRowsV2 | EvUpdateRowsV2 | EvDeleteRowsV2 =>
              val tableId = (b.getInt(p).toLong & 0xFFFFFFFFL) |
                ((b.getShort(p + 4).toLong & 0xFFFFL) << 32)
              p += 6 + 2
              val extraLen = (pkt(p) & 0xFF) | ((pkt(p + 1) & 0xFF) << 8)
              p += extraLen // extraLen includes its own 2 bytes
              val td = tables.getOrElse(tableId,
                throw new IllegalStateException(s"rows event before TABLE_MAP for $tableId"))
              val (nCols, p1) = lenenc(pkt, p); p = p1
              val n = nCols.toInt
              val bmBytes = (n + 7) / 8
              // included-columns bitmap(s): bit i set = column i carried in
              // this event's images. FULL (the default) sets every bit;
              // binlog_row_image=MINIMAL ships only the PK in before images
              // and changed columns in after images, NOBLOB omits
              // blob/text columns not in the PK. The null bitmap and value
              // positions inside each image then cover INCLUDED columns
              // only — decoded below; omitted columns surface in the
              // payload's "_omitted" list (absent ≠ NULL).
              def readIncluded(): Array[Boolean] = {
                val inc = Array.tabulate(n)(i => ((pkt(p + i / 8) >> (i % 8)) & 1) == 1)
                p += bmBytes
                inc
              }
              val incBefore = readIncluded()
              val incAfter = if (evType == EvUpdateRowsV2) readIncluded() else incBefore
              val names = columns.getOrElse((td.db, td.table),
                (0 until n).map(i => s"c$i"))
              val op = evType match {
                case EvWriteRowsV2 => CdcSchema.OpInsert
                case EvUpdateRowsV2 => CdcSchema.OpUpdate
                case EvDeleteRowsV2 => CdcSchema.OpDelete
              }
              def readImage(inc: Array[Boolean]): String = {
                // the null bitmap covers INCLUDED columns only, indexed by
                // position among them (log_event.cc Rows_log_event
                // unpack_current_row) — a partial image's values pack
                // back-to-back over the included columns
                val nInc = inc.count(identity)
                val nullBmBytes = (nInc + 7) / 8
                val nullBm = java.util.Arrays.copyOfRange(pkt, p, p + nullBmBytes)
                p += nullBmBytes
                val sb = new StringBuilder("{")
                var emitted = 0
                val omitted = new scala.collection.mutable.ArrayBuffer[String](0)
                def str(s: String): Unit =
                  sb.append('"').append(jsonEscape(s)).append('"')
                def lenPrefixed(maxLen: Int): String = {
                  val len = if (maxLen > 255) {
                    val l = (pkt(p) & 0xFF) | ((pkt(p + 1) & 0xFF) << 8); p += 2; l
                  } else { val l = pkt(p) & 0xFF; p += 1; l }
                  val s = new String(pkt, p, len, StandardCharsets.UTF_8); p += len
                  s
                }
                var i = 0
                var j = 0 // index among included columns (null-bitmap index)
                while (i < n) {
                  if (!inc(i)) omitted += names(i)
                  else {
                  if (emitted > 0) sb.append(',')
                  emitted += 1
                  sb.append('"').append(names(i)).append("\":")
                  if (((nullBm(j / 8) >> (j % 8)) & 1) == 1) sb.append("null")
                  else td.types(i) match {
                    case TypeTiny => sb.append(pkt(p).toInt); p += 1
                    case TypeShort => sb.append(b.getShort(p).toInt); p += 2
                    case TypeInt24 => // 3 bytes LE, sign in the top byte
                      sb.append((pkt(p) & 0xFF) | ((pkt(p + 1) & 0xFF) << 8) |
                        (pkt(p + 2).toInt << 16))
                      p += 3
                    case TypeLong => sb.append(b.getInt(p)); p += 4
                    case TypeLongLong => sb.append(b.getLong(p)); p += 8
                    case TypeFloat => sb.append(b.getFloat(p)); p += 4
                    case TypeDouble => sb.append(b.getDouble(p)); p += 8
                    case TypeYear =>
                      val v = pkt(p) & 0xFF; p += 1
                      sb.append(if (v == 0) 0 else 1900 + v)
                    case TypeDate => // 3 bytes LE: day(5) month(4) year(15)
                      val v = (pkt(p) & 0xFF) | ((pkt(p + 1) & 0xFF) << 8) |
                        ((pkt(p + 2) & 0xFF) << 16)
                      p += 3
                      str(f"${v >> 9}%04d-${(v >> 5) & 0xF}%02d-${v & 0x1F}%02d")
                    case TypeDatetime2 => // 5-byte BE packed (my_time.c) + frac
                      val fsp = td.meta(i)
                      val packed = be(pkt, p, 5) - 0x8000000000L; p += 5
                      val frac = fracStr(pkt, p, fsp); p += (fsp + 1) / 2
                      val ymd = packed >> 17
                      val ym = ymd >> 5
                      val hms = packed & 0x1FFFF
                      str(f"${ym / 13}%04d-${ym % 13}%02d-${ymd & 0x1F}%02d " +
                        f"${hms >> 12}%02d:${(hms >> 6) & 0x3F}%02d:${hms & 0x3F}%02d$frac")
                    case TypeTimestamp2 => // 4-byte BE UTC epoch seconds + frac
                      val fsp = td.meta(i)
                      val sec = be(pkt, p, 4); p += 4
                      val frac = fracStr(pkt, p, fsp); p += (fsp + 1) / 2
                      val t = java.time.LocalDateTime.ofEpochSecond(
                        sec, 0, java.time.ZoneOffset.UTC)
                      str(f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
                        f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d$frac")
                    case TypeTime2 => // 3-byte BE, +0x800000 offset, + frac
                      val fsp = td.meta(i)
                      val signed = be(pkt, p, 3) - 0x800000L; p += 3
                      val frac = fracStr(pkt, p, fsp); p += (fsp + 1) / 2
                      val v = math.abs(signed)
                      str((if (signed < 0) "-" else "") +
                        f"${(v >> 12) & 0x3FF}%02d:${(v >> 6) & 0x3F}%02d:${v & 0x3F}%02d$frac")
                    case TypeNewDecimal =>
                      val (s, used) = decodeDecimal(pkt, p,
                        td.meta(i) >> 8, td.meta(i) & 0xFF)
                      p += used
                      sb.append(s)
                    case TypeBit => // meta = total bits, stored BE
                      val nb = (td.meta(i) + 7) / 8
                      sb.append(be(pkt, p, nb)); p += nb
                    case TypeVarchar | TypeVarString => str(lenPrefixed(td.meta(i)))
                    case TypeBlob => // meta = length-prefix width; TEXT too
                      val lb = td.meta(i)
                      val len = leN(pkt, p, lb).toInt; p += lb
                      val s = new String(pkt, p, len, StandardCharsets.UTF_8); p += len
                      str(s)
                    case TypeString => // CHAR / ENUM / SET share the type id;
                      // meta byte 0 carries the real type (length bits may be
                      // borrowed into its 0x30 nibble for CHAR > 255 bytes)
                      val m0 = td.meta(i) >> 8
                      val m1 = td.meta(i) & 0xFF
                      val (realType, maxLen) =
                        if (m0 != 0 && (m0 & 0x30) != 0x30)
                          (m0 | 0x30, m1 | (((m0 & 0x30) ^ 0x30) << 4))
                        else (m0, m1)
                      realType match {
                        case TypeEnum => // 1-or-2-byte LE ordinal
                          sb.append(leN(pkt, p, maxLen)); p += maxLen
                        case TypeSet => // member bitmask, maxLen bytes LE
                          sb.append(leN(pkt, p, maxLen)); p += maxLen
                        case _ => str(lenPrefixed(maxLen)) // CHAR
                      }
                  }
                  j += 1
                  }
                  i += 1
                }
                // absent ≠ NULL: a MINIMAL/NOBLOB image omits columns the
                // server did not ship; consumers distinguish "not carried"
                // (partial-update merge keeps the stored value) from an
                // explicit NULL via this marker
                if (omitted.nonEmpty) {
                  if (emitted > 0) sb.append(',')
                  sb.append("\"_omitted\":[")
                    .append(omitted.map(o => "\"" + jsonEscape(o) + "\"").mkString(","))
                    .append(']')
                }
                sb.append('}').toString
              }
              while (p < end) {
                val img = readImage(incBefore)
                // update rows carry (before, after) pairs: the AFTER image
                // is the payload (the upsert-relevant one — the reference's
                // last-writer-wins sink consumes exactly that); the BEFORE
                // image rides alongside for additive consumers (IVM needs
                // it to subtract the old contribution)
                val isUpdate = evType == EvUpdateRowsV2
                val payload = if (isUpdate) readImage(incAfter) else img
                outRows += CdcEvent(td.db, td.table, op, ts * 1000L,
                  BinlogOffset(currentIdx, logPos).encoded, payload,
                  before = if (isUpdate) img else null)
              }
              // cap check at the event boundary only: rows of one event
              // share a log_pos and must land in one pull for resume. In
              // GTID mode, additionally hold until the transaction's XID
              // commits (the EvXid case below) so the executed set never
              // records a half-delivered transaction.
              if (outRows.length >= maxEvents && (gtid == null || gtid.pending.isEmpty))
                done = true
            case EvGtid if gtid != null =>
              // body: flags(1) sid(16) gno(8 LE) [5.7+ logical timestamps
              // follow — not needed for the executed set]
              gtid.open(java.util.Arrays.copyOfRange(pkt, p + 1, p + 17),
                b.getLong(p + 17))
            case EvXid if gtid != null =>
              gtid.commit()
              if (outRows.length >= maxEvents) done = true
            case _ => () // FORMAT_DESCRIPTION, XID, QUERY, heartbeats: skip
          }
        case other => throw new java.io.IOException(f"unexpected packet lead 0x$other%02x")
      }
    }
    outRows.toSeq
  }

  // ------------------------------------------------- value decode helpers

  /** Big-endian unsigned integer of `len` bytes. */
  private def be(bytes: Array[Byte], p: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (bytes(p + i) & 0xFFL); i += 1 }
    v
  }

  /** Little-endian unsigned integer of `len` bytes (BLOB length prefixes). */
  private def leN(bytes: Array[Byte], p: Int, len: Int): Long = {
    var v = 0L; var i = len - 1
    while (i >= 0) { v = (v << 8) | (bytes(p + i) & 0xFFL); i -= 1 }
    v
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  // fractional trailer is (fsp+1)/2 bytes; its unit per byte count
  // (my_time.c my_packed_time_get_frac_part): 1 byte = centiseconds,
  // 2 bytes = 10^-4 s, 3 bytes = microseconds
  private val FracToMicros = Array(0L, 10000L, 100L, 1L)

  /** `".ddd"` with exactly `fsp` digits; empty for fsp 0. */
  private def fracStr(bytes: Array[Byte], p: Int, fsp: Int): String = {
    if (fsp == 0) return ""
    val nb = (fsp + 1) / 2
    val micros = be(bytes, p, nb) * FracToMicros(nb)
    "." + f"$micros%06d".substring(0, fsp)
  }

  // bytes needed for a partial base-10^9 digit group of 0..8 digits
  private val Dig2Bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4)

  /** Inverse of decimal.c `decimal2bin`: big-endian 9-digit (base 10^9)
    * groups with leading/trailing partial groups, the sign carried in the
    * first byte's MSB (whole image bit-inverted when negative). Returns
    * (plain decimal string, bytes consumed). */
  private def decodeDecimal(bytes: Array[Byte], p0: Int,
                            precision: Int, scale: Int): (String, Int) = {
    val intg = precision - scale
    val intgFull = intg / 9; val intgPart = intg % 9
    val fracFull = scale / 9; val fracPart = scale % 9
    val len = Dig2Bytes(intgPart) + 4 * intgFull + 4 * fracFull + Dig2Bytes(fracPart)
    val buf = java.util.Arrays.copyOfRange(bytes, p0, p0 + len)
    val neg = (buf(0) & 0x80) == 0
    if (neg) { var i = 0; while (i < len) { buf(i) = (~buf(i)).toByte; i += 1 } }
    buf(0) = (buf(0) ^ 0x80).toByte
    var q = 0
    val ip = new StringBuilder
    if (intgPart > 0) {
      ip.append(("%0" + intgPart + "d").format(be(buf, q, Dig2Bytes(intgPart))))
      q += Dig2Bytes(intgPart)
    }
    for (_ <- 0 until intgFull) { ip.append(f"${be(buf, q, 4)}%09d"); q += 4 }
    var intStr = ip.toString.dropWhile(_ == '0')
    if (intStr.isEmpty) intStr = "0"
    val fp = new StringBuilder
    for (_ <- 0 until fracFull) { fp.append(f"${be(buf, q, 4)}%09d"); q += 4 }
    if (fracPart > 0) {
      fp.append(("%0" + fracPart + "d").format(be(buf, q, Dig2Bytes(fracPart))))
      q += Dig2Bytes(fracPart)
    }
    val s = (if (neg) "-" else "") + intStr +
      (if (scale > 0) "." + fp.toString else "")
    (s, len)
  }

  // length-encoded integer
  private def lenenc(bytes: Array[Byte], p: Int): (Long, Int) = (bytes(p) & 0xFF) match {
    case v if v < 0xFB => (v.toLong, p + 1)
    case 0xFC => (((bytes(p + 1) & 0xFFL)) | ((bytes(p + 2) & 0xFFL) << 8), p + 3)
    case 0xFD => ((bytes(p + 1) & 0xFFL) | ((bytes(p + 2) & 0xFFL) << 8) |
      ((bytes(p + 3) & 0xFFL) << 16), p + 4)
    case 0xFE => (ByteBuffer.wrap(bytes, p + 1, 8).order(ByteOrder.LITTLE_ENDIAN).getLong, p + 9)
    case other => throw new IllegalArgumentException(f"bad lenenc lead 0x$other%02x")
  }

  // ---------------------------------------------------- packet framing
  def writePacket(out: DataOutputStream, seq: Int, payload: Array[Byte]): Unit = {
    out.write(payload.length & 0xFF)
    out.write((payload.length >> 8) & 0xFF)
    out.write((payload.length >> 16) & 0xFF)
    out.write(seq & 0xFF)
    out.write(payload)
    out.flush()
  }

  /** One logical packet: payloads of exactly 0xFFFFFF bytes continue in
    * the next wire packet and must be concatenated (MySQL's 16 MB framing
    * rule — a maximal packet is always followed by a continuation, empty
    * if the payload length was an exact multiple). */
  def readPacket(in: DataInputStream): (Array[Byte], Int) = {
    val h = new Array[Byte](4)
    in.readFully(h)
    var len = (h(0) & 0xFF) | ((h(1) & 0xFF) << 8) | ((h(2) & 0xFF) << 16)
    var seq = h(3) & 0xFF
    var payload = new Array[Byte](len)
    in.readFully(payload)
    while (len == 0xFFFFFF) {
      in.readFully(h)
      len = (h(0) & 0xFF) | ((h(1) & 0xFF) << 8) | ((h(2) & 0xFF) << 16)
      seq = h(3) & 0xFF
      val more = new Array[Byte](len)
      in.readFully(more)
      payload = payload ++ more
    }
    (payload, seq)
  }
}
