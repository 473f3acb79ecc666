package graft.streaming

import graft.SparkSuite

/** Live binlog read path against an in-process loopback server
  * ([[MysqldLoopback]]) speaking the real MySQL replication protocol —
  * handshake + native-password auth, COM_BINLOG_DUMP, v4 event framing
  * (TABLE_MAP / ROWS v2 / ROTATE). The production delta is a real
  * endpoint. */
class BinlogWireSpec extends SparkSuite {

  import spark.implicits._

  private val Password = "repl-pw"

  private val registry = Map(
    ("shop", "orders") -> Seq("id", "item"),
    ("shop", "users") -> Seq("uid", "name"))

  test("binlog dump decodes inserts/updates/deletes with two-part offsets") {
    val m = new MysqldLoopback(Password)
    try {
      val df = BinlogWire.scan(spark, "127.0.0.1", m.port, "repl", Password,
        "binlog.000001", 4L, columns = registry)
      val rows = df.select("db", "table", "op", "offset", "payload")
        .as[(String, String, String, Long, String)].collect().toSeq
      assert(rows.map(r => (r._1, r._2, r._3)) === Seq(
        ("shop", "orders", "insert"), ("shop", "users", "insert"),
        ("shop", "orders", "update"), ("shop", "users", "delete")))
      assert(rows.map(r => BinlogOffset.decode(r._4))
        === Seq(BinlogOffset(1, 100), BinlogOffset(1, 200),
          BinlogOffset(2, 120), BinlogOffset(2, 180)))
      assert(rows(0)._5 === """{"id":1,"item":"widget"}""")
      assert(rows(2)._5 === """{"id":1,"item":"gadget"}""") // AFTER image
      assert(rows(3)._5 === """{"uid":7,"name":null}""")
    } finally m.stop()
  }

  test("resume from a mid-stream (file, pos) replays only later events") {
    val m = new MysqldLoopback(Password)
    try {
      val df = BinlogWire.scan(spark, "127.0.0.1", m.port, "repl", Password,
        "binlog.000002", 150L, columns = registry)
      val rows = df.select("table", "op", "offset")
        .as[(String, String, Long)].collect().toSeq
      assert(rows === Seq(("users", "delete", BinlogOffset(2, 180).encoded)))
    } finally m.stop()
  }

  test("a binlog_checksum=NONE server (no CRC trailers, no SET) decodes too") {
    val m = new MysqldLoopback(Password, checksum = false)
    try {
      val df = BinlogWire.scan(spark, "127.0.0.1", m.port, "repl", Password,
        "binlog.000001", 4L, columns = registry)
      assert(df.select("op").as[String].collect().toSeq
        === Seq("insert", "insert", "update", "delete"))
    } finally m.stop()
  }

  test("readPacket reassembles payloads split at the 16MB framing boundary") {
    val max = 0xFFFFFF
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    // first wire packet: maximal payload of 0x55 bytes, seq 3
    out.write(Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 3))
    out.write(Array.fill[Byte](max)(0x55))
    // continuation: 5 trailing bytes, seq 4
    out.write(Array[Byte](5, 0, 0, 4))
    out.write(Array[Byte](1, 2, 3, 4, 5))
    val (payload, seq) = BinlogWire.readPacket(
      new java.io.DataInputStream(new java.io.ByteArrayInputStream(bos.toByteArray)))
    assert(payload.length === max + 5)
    assert(seq === 4)
    assert(payload(0) === 0x55.toByte && payload(max) === 1 && payload(max + 4) === 5)
  }

  private val allTypesCols = Seq("c_tiny", "c_short", "c_int24", "c_float",
    "c_double", "c_dec", "c_date", "c_dt", "c_ts", "c_time", "c_timef",
    "c_year", "c_text", "c_char", "c_enum", "c_set", "c_bit")

  test("full column-type surface decodes: ints, float/double, DECIMAL, DATE," +
      " DATETIME2(3), TIMESTAMP2, TIME2 (negative + fractional), YEAR," +
      " TEXT, CHAR, ENUM, SET, BIT — incl. NULL-bitmap interplay mid-row") {
    val m = new MysqldLoopback(Password, extended = true)
    try {
      val df = BinlogWire.scan(spark, "127.0.0.1", m.port, "repl", Password,
        "binlog.000002", 200L,
        columns = Map(("shop", "alltypes") -> allTypesCols))
      val rows = df.select("db", "table", "payload").as[(String, String, String)]
        .collect().toSeq.filter(_._2 == "alltypes")
      assert(rows.length === 2)
      assert(rows(0)._3 === """{"c_tiny":-5,"c_short":-1234,"c_int24":-70000,""" +
        """"c_float":1.25,"c_double":-2.5,"c_dec":-123456789.0123,""" +
        """"c_date":"2024-02-29","c_dt":"2024-02-29 13:14:15.250",""" +
        """"c_ts":"2023-11-14 22:13:20","c_time":"-12:34:56",""" +
        """"c_timef":"12:34:56.78","c_year":2024,""" +
        "\"c_text\":\"héllo \\\"q\\\"\\u000a\",\"c_char\":\"abc\",\"c_enum\":2," +
        """"c_set":5,"c_bit":2748}""")
      // second image: NULLs scattered MID-row (c_dec, c_date, c_text) — the
      // columns after each null must still align
      assert(rows(1)._3 === """{"c_tiny":7,"c_short":300,"c_int24":99999,""" +
        """"c_float":-0.5,"c_double":1000000.0,"c_dec":null,"c_date":null,""" +
        """"c_dt":"2024-03-01 00:00:00.000","c_ts":"2023-11-14 22:13:21",""" +
        """"c_time":"00:00:05","c_timef":"01:02:03.04","c_year":0,""" +
        """"c_text":null,"c_char":"","c_enum":1,"c_set":0,"c_bit":1}""")
    } finally m.stop()
  }

  test("binlog_row_image=MINIMAL/NOBLOB partial images decode: null bitmap " +
      "and values cover included columns only; omitted columns surface in " +
      "_omitted (absent != NULL)") {
    val m = new MysqldLoopback(Password, extended = true, partialImage = true)
    try {
      val df = BinlogWire.scan(spark, "127.0.0.1", m.port, "repl", Password,
        "binlog.000002", 200L,
        columns = Map(("shop", "alltypes") -> allTypesCols))
      val rows = df.select("table", "op", "payload").as[(String, String, String)]
        .collect().toSeq.filter(_._1 == "alltypes")
      assert(rows.map(_._2) === Seq("insert", "insert", "update"))
      // NOBLOB write, full-values image: everything except c_text, which
      // is listed as omitted — all later columns still aligned
      assert(rows(0)._3 === """{"c_tiny":-5,"c_short":-1234,"c_int24":-70000,""" +
        """"c_float":1.25,"c_double":-2.5,"c_dec":-123456789.0123,""" +
        """"c_date":"2024-02-29","c_dt":"2024-02-29 13:14:15.250",""" +
        """"c_ts":"2023-11-14 22:13:20","c_time":"-12:34:56",""" +
        """"c_timef":"12:34:56.78","c_year":2024,"c_char":"abc","c_enum":2,""" +
        """"c_set":5,"c_bit":2748,"_omitted":["c_text"]}""")
      // NOBLOB write, image with NULLs mid-row (c_dec, c_date): the null
      // bitmap indexes included columns only — c_text's absence must NOT
      // shift the null bits
      assert(rows(1)._3 === """{"c_tiny":7,"c_short":300,"c_int24":99999,""" +
        """"c_float":-0.5,"c_double":1000000.0,"c_dec":null,"c_date":null,""" +
        """"c_dt":"2024-03-01 00:00:00.000","c_ts":"2023-11-14 22:13:21",""" +
        """"c_time":"00:00:05","c_timef":"01:02:03.04","c_year":0,""" +
        """"c_char":"","c_enum":1,"c_set":0,"c_bit":1,"_omitted":["c_text"]}""")
      // MINIMAL update: the AFTER image carries PK + changed columns only
      // (c_short changed, c_text set to explicit NULL); everything else is
      // omitted-not-null
      assert(rows(2)._3 === """{"c_tiny":7,"c_short":300,"c_text":null,""" +
        """"_omitted":["c_int24","c_float","c_double","c_dec","c_date",""" +
        """"c_dt","c_ts","c_time","c_timef","c_year","c_char","c_enum",""" +
        """"c_set","c_bit"]}""")
    } finally m.stop()
  }

  test("an AuthSwitchRequest (caching_sha2_password server) fails with the " +
      "requested plugin named, not an opaque error") {
    val m = new MysqldLoopback(Password, authSwitch = Some("caching_sha2_password"))
    try {
      val e = intercept[Exception](
        BinlogWire.scan(spark, "127.0.0.1", m.port, "repl", Password,
          "binlog.000001", 4L).collect())
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("caching_sha2_password") &&
        msg.contains("mysql_native_password"))
    } finally m.stop()
  }

  test("drain-throughput probe: bounded re-pulls deliver the backlog " +
      "exactly once, at a documented events/s ceiling") {
    val n = 200000
    val m = new MysqldLoopback(Password, bulkRows = n)
    try {
      for (maxPerPull <- Seq(10000, 50000)) {
        val t0 = System.nanoTime()
        var total = 0L
        var off = BinlogOffset(2, 180) // resume past the base fixture
        var last = off.encoded
        var done = false
        while (!done) { // the stream source's bounded-drain loop
          val batch = BinlogWire.pull("127.0.0.1", m.port, "repl", Password,
            f"binlog.${off.fileIndex}%06d", off.filePos, 65535L,
            columns = registry, maxEvents = maxPerPull)
          if (batch.isEmpty) done = true
          else {
            batch.foreach { e => assert(e.offset >= last); last = e.offset }
            total += batch.length
            off = BinlogOffset.decode(batch.last.offset)
          }
        }
        val dt = (System.nanoTime() - t0) / 1e9
        info(f"maxEventsPerBatch=$maxPerPull: $total rows in $dt%.2fs = " +
          f"${total / dt}%.0f events/s")
        assert(total === n.toLong) // exactly once, no gaps, no re-delivery
      }
    } finally m.stop()
  }

  private val Uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

  test("GTID resume: the executed-set token survives a primary restart " +
      "that renames every binlog file") {
    val m1 = new MysqldLoopback(Password, fileBase = 1L)
    val (events1, executed1) =
      try BinlogWire.pullGtid("127.0.0.1", m1.port, "repl", Password, "",
        columns = registry)
      finally m1.stop()
    assert(events1.map(e => (e.table, e.op)) === Seq(
      ("orders", "insert"), ("users", "insert"),
      ("orders", "update"), ("users", "delete")))
    assert(executed1 === s"$Uuid:1-4")
    // primary restart: binlog files now named binlog.000009+ — a (file,
    // pos) resume would 1236-fail or misread; the GTID set doesn't care
    val m2 = new MysqldLoopback(Password, fileBase = 9L)
    try {
      val (events2, executed2) = BinlogWire.pullGtid("127.0.0.1", m2.port,
        "repl", Password, executed1, columns = registry)
      assert(events2.isEmpty, "acknowledged transactions were re-delivered")
      assert(executed2 === executed1)
      // partial acknowledgement: txns 1-2 done -> exactly 3,4 replayed
      val (events3, executed3) = BinlogWire.pullGtid("127.0.0.1", m2.port,
        "repl", Password, s"$Uuid:1-2", columns = registry)
      assert(events3.map(e => (e.table, e.op)) === Seq(
        ("orders", "update"), ("users", "delete")))
      assert(executed3 === s"$Uuid:1-4")
    } finally m2.stop()
  }

  test("GTID pull honors maxEvents at TRANSACTION boundaries: the executed " +
      "set never records a half-delivered transaction") {
    val m = new MysqldLoopback(Password)
    try {
      val (events, executed) = BinlogWire.pullGtid("127.0.0.1", m.port,
        "repl", Password, "", columns = registry, maxEvents = 1)
      assert(events.length === 1)
      assert(executed === s"$Uuid:1") // txn 1 committed, nothing else
      // resuming from that set replays txns 2-4 exactly
      val (rest, executed2) = BinlogWire.pullGtid("127.0.0.1", m.port,
        "repl", Password, executed, columns = registry)
      assert(rest.length === 3)
      assert(executed2 === s"$Uuid:1-4")
    } finally m.stop()
  }

  test("GtidSet text/binary round trips and interval merging") {
    val s0 = GtidSet.parse(s"$Uuid:1-3:7,aaaaaaaa-bbbb-cccc-dddd-eeeeffff0000:2")
    assert(GtidSet.decode(s0.encoded).format === s0.format)
    assert(GtidSet.parse(s0.format) === s0)
    // adding gno 4 bridges 1-3 and 7? no — 4 extends 1-3 only
    val s1 = s0.add(Uuid, 4)
    assert(s1.format.startsWith(s"3e11fa47-71ca-11e1-9e33-c80aa9429562:1-4:7"))
    // 5 then 6 merges everything into 1-7
    val s2 = s1.add(Uuid, 5).add(Uuid, 6)
    assert(s2.intervals(Uuid) === Vector((1L, 7L)))
    assert(s2.contains(Uuid, 7) && !s2.contains(Uuid, 8))
    assert(GtidSet.parse("").isEmpty)
  }

  test("wrong replication password is rejected by the server") {
    val m = new MysqldLoopback(Password)
    try {
      val e = intercept[Exception](
        BinlogWire.scan(spark, "127.0.0.1", m.port, "repl", "nope",
          "binlog.000001", 4L).collect())
      assert(e.getMessage.contains("auth failed") ||
        Option(e.getCause).exists(_.getMessage.contains("auth failed")))
    } finally m.stop()
  }
}
