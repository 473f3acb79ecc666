package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** [[PgWire]] against [[PgLoopback]]: SCRAM auth (mutual), walsender
  * commands, pgoutput decode (insert/update K-image/delete O-image with
  * TOAST marker/truncate), commit timestamps, LSN resume, maxEvents
  * bounding, and consumption confirmation. */
class PgWireSpec extends AnyFunSuite {

  private val Password = "wal-pw"
  private def pull(m: PgLoopback, start: Long, max: Int = 1000) = {
    PgWire.createSlot("127.0.0.1", m.port, "repl", Password, "shop", "s1")
    PgWire.pull("127.0.0.1", m.port, "repl", Password, "shop", "s1", "pub1",
      start, maxEvents = max)
  }

  test("full drain decodes the fixture with commit timestamps and LSN offsets") {
    val m = new PgLoopback(Password)
    try {
      val events = pull(m, 0L)
      assert(events.map(e => (e.table, e.op, e.lsn)) === Seq(
        ("orders", "insert", 110L), ("users", "insert", 120L),
        ("orders", "update", 310L), ("users", "delete", 320L),
        ("orders", "truncate", 450L)))
      assert(events.forall(_.db == "public"))
      // PG epoch micros → unix ms
      assert(events.map(_.tsMs) === Seq(946684801000L, 946684801000L,
        946684802000L, 946684802000L, 946684803000L))
      assert(events(0).payload === """{"id":"1","item":"widget"}""")
      // update: K old image (key cols, non-key null) lands under _before
      assert(events(2).payload ===
        """{"id":"1","item":"gadget","_before":{"id":"1","item":null}}""")
      // delete: O old image with an unchanged-TOAST column marker
      assert(events(3).payload ===
        """{"uid":"7","name":"ada","_unchanged":["bio"]}""")
      assert(events(4).payload === "{}")
    } finally m.stop()
  }

  test("resume from a commit LSN replays only later transactions") {
    val m = new PgLoopback(Password)
    try {
      assert(pull(m, 200L).map(_.lsn) === Seq(310L, 320L, 450L))
      assert(pull(m, 400L).map(_.lsn) === Seq(450L))
      assert(pull(m, 500L) === Seq.empty) // caught up → idle keepalive
    } finally m.stop()
  }

  test("maxEvents bounds a drain mid-stream") {
    val m = new PgLoopback(Password)
    try {
      val events = pull(m, 0L, max = 2)
      assert(events.map(_.lsn) === Seq(110L, 120L))
    } finally m.stop()
  }

  test("a wrong password fails the SCRAM proof, and the server signature is verified") {
    val m = new PgLoopback(Password)
    try {
      val e = intercept[IllegalStateException] {
        PgWire.identifySystem("127.0.0.1", m.port, "repl", "WRONG", "shop")
      }
      assert(e.getMessage.contains("authentication failed")
        || e.getMessage.contains("28P01"))
      // and with the right password IDENTIFY_SYSTEM returns the log end
      assert(PgWire.identifySystem("127.0.0.1", m.port, "repl", Password, "shop")
        === m.LogEnd)
    } finally m.stop()
  }

  test("slot creation is idempotent; missing slot fails loudly on start") {
    val m = new PgLoopback(Password)
    try {
      assert(PgWire.createSlot("127.0.0.1", m.port, "repl", Password, "shop", "s1")
        .nonEmpty)
      // second create: 42710 swallowed → None, resume path
      assert(PgWire.createSlot("127.0.0.1", m.port, "repl", Password, "shop", "s1")
        === None)
      val e = intercept[IllegalStateException] {
        PgWire.pull("127.0.0.1", m.port, "repl", Password, "shop",
          "missing_slot", "pub1", 0L, 10)
      }
      assert(e.getMessage.contains("does not exist"))
    } finally m.stop()
  }

  test("md5 and cleartext auth paths work (and reject bad passwords)") {
    for (method <- Seq("md5", "cleartext")) {
      val m = new PgLoopback(Password, authMethod = method)
      try {
        assert(PgWire.identifySystem("127.0.0.1", m.port, "repl", Password, "shop")
          === m.LogEnd, s"$method happy path")
        val e = intercept[IllegalStateException] {
          PgWire.identifySystem("127.0.0.1", m.port, "repl", "WRONG", "shop")
        }
        assert(e.getMessage.contains("authentication failed"), s"$method rejection")
      } finally m.stop()
    }
  }

  test("status updates report write = consumed but flush = caller-durable only") {
    val m = new PgLoopback(Password)
    try {
      // caller declares LSN 200 durable; the pull consumes through 500
      PgWire.createSlot("127.0.0.1", m.port, "repl", Password, "shop", "s1")
      PgWire.pull("127.0.0.1", m.port, "repl", Password, "shop", "s1", "pub1",
        0L, maxEvents = 1000, confirmLsn = 200L)
      val deadline = System.currentTimeMillis() + 3000
      while (m.writtenLsn < 500L && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(m.writtenLsn === 500L, "write position = consumed")
      assert(m.confirmedLsn === 200L,
        "flush position must be what the caller committed, NOT what was consumed")
    } finally m.stop()
  }

  test("a crash between pull and checkpoint commit keeps the range replayable") {
    val m = new PgLoopback(Password)
    try {
      // first pull consumes everything but confirms nothing (no commit yet);
      // a real slot restarted at confirmed_flush_lsn must replay in full
      assert(pull(m, 0L).map(_.lsn) === Seq(110L, 120L, 310L, 320L, 450L))
      assert(m.confirmedLsn === 0L, "nothing durable → nothing confirmed")
      assert(pull(m, 0L).map(_.lsn) === Seq(110L, 120L, 310L, 320L, 450L),
        "un-confirmed range must replay after a simulated driver crash")
      // once the caller declares 500 durable, the slot trims and goes dry
      PgWire.pull("127.0.0.1", m.port, "repl", Password, "shop", "s1", "pub1",
        0L, maxEvents = 1000, confirmLsn = 500L)
      val deadline = System.currentTimeMillis() + 3000
      while (m.confirmedLsn < 500L && System.currentTimeMillis() < deadline)
        Thread.sleep(20) // status updates land async after pull returns
      assert(pull(m, 0L) === Seq.empty,
        "slot resumes at confirmed_flush_lsn regardless of older requested start")
    } finally m.stop()
  }
}
