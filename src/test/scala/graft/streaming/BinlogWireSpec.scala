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
