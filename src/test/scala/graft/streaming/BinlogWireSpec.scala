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
