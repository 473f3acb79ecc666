package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite

/** `spark.readStream.format("graft-pg")` — the DSv2 micro-batch source
  * over the real walsender wire ([[PgWire]] + [[PgLoopback]]): delivery
  * into the standard unbounded-DataFrame contract and checkpointed
  * exactly-once restart (slot replays whole transactions; the source must
  * trim already-committed LSNs). */
class PgStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private val Password = "wal-pw"

  private def stream(port: Int) =
    spark.readStream.format("graft-pg")
      .option("host", "127.0.0.1").option("port", port)
      .option("user", "repl").option("password", Password)
      .option("database", "shop").option("slot", "s1")
      .option("publication", "pub1")
      .load()

  test("micro-batch stream delivers pgoutput changes as CDC rows") {
    val m = new PgLoopback(Password)
    try {
      val q = stream(m.port).writeStream
        .format("memory").queryName("pg_events").outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("pg_events")
        .select("db", "table", "op", "offset", "payload")
        .as[(String, String, String, Long, String)].collect().sortBy(_._4).toSeq
      assert(rows.map(r => (r._2, r._3, r._4)) === Seq(
        ("orders", "insert", 110L), ("users", "insert", 120L),
        ("orders", "update", 310L), ("users", "delete", 320L),
        ("orders", "truncate", 450L)))
      assert(rows(2)._5.startsWith("""{"id":"1","item":"gadget""""))
    } finally m.stop()
  }

  test("restart from checkpoint does not re-deliver committed transactions") {
    val m = new PgLoopback(Password)
    val ckpt = Files.createTempDirectory("graft-pg-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = stream(m.port).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("offset").as[Long].collect() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      run()
      assert(seen.sorted.toSeq === Seq(110L, 120L, 310L, 320L, 450L))
      run() // new query, same checkpoint: slot would replay, source must not
      assert(seen.sorted.toSeq === Seq(110L, 120L, 310L, 320L, 450L),
        "restart re-delivered committed LSNs")
    } finally m.stop()
  }

  test("maxEventsPerBatch paces delivery without loss") {
    val m = new PgLoopback(Password)
    try {
      val sizes = mutable.ArrayBuffer.empty[Long]
      val paced = spark.readStream.format("graft-pg")
        .option("host", "127.0.0.1").option("port", m.port)
        .option("user", "repl").option("password", Password)
        .option("database", "shop").option("slot", "s1")
        .option("publication", "pub1")
        .option("maxEventsPerBatch", "2") // source option: admission control
        .load()
      val q = paced.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.synchronized { sizes += b.count() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      val delivered = sizes.filter(_ > 0)
      assert(delivered.sum === 5L, s"expected all 5 events, got $sizes")
      assert(delivered.forall(_ <= 2L), s"a batch exceeded the cap: $sizes")
    } finally m.stop()
  }

  test("a batch boundary never splits events sharing one LSN (multi-rel truncate)") {
    val m = new PgLoopback(Password)
    m.includeMultiTruncate = true // tx4: TRUNCATE orders, users → two
                                  // events BOTH at dataStart 550
    try {
      val sizes = mutable.ArrayBuffer.empty[Long]
      val seen = mutable.ArrayBuffer.empty[(String, Long)]
      val paced = spark.readStream.format("graft-pg")
        .option("host", "127.0.0.1").option("port", m.port)
        .option("user", "repl").option("password", Password)
        .option("database", "shop").option("slot", "s1")
        .option("publication", "pub1")
        .option("maxEventsPerBatch", "1") // every cut lands on a boundary —
                                          // including mid-tied-group ones
        .load()
      val q = paced.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = b.select("table", "offset").as[(String, Long)].collect()
          seen.synchronized { seen ++= got; sizes += got.length.toLong }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      // all 7 events exactly once; in particular BOTH truncates at 550
      assert(seen.sortBy(e => (e._2, e._1)).toSeq === Seq(
        ("orders", 110L), ("users", 120L), ("orders", 310L), ("users", 320L),
        ("orders", 450L), ("orders", 550L), ("users", 550L)),
        "an LSN-tied group was split across a batch boundary and lost")
    } finally m.stop()
  }

  test("crash between pull and checkpoint commit: range stays replayable " +
       "(flush confirms only committed LSNs)") {
    val m = new PgLoopback(Password)
    try {
      // Simulate the crash window: a stream instance pulls everything
      // (consumes through 450) but the driver dies before Spark commits —
      // commit() never runs, so nothing may be confirmed as flushed.
      val s1 = new PgMicroBatchStream(PgStreamOptions(Map(
        "host" -> "127.0.0.1", "port" -> m.port.toString, "user" -> "repl",
        "password" -> Password, "database" -> "shop", "slot" -> "s1",
        "publication" -> "pub1")))
      val start = s1.initialOffset()
      val end = s1.latestOffset(start, s1.getDefaultReadLimit)
      assert(end.asInstanceOf[PgStreamOffset].lsn === 450L)
      // the final status update travels on the same message as the write
      // position — wait for THAT to land, then check what was flushed
      awaitWritten(m, 500L)
      assert(m.confirmedLsn === 0L,
        "consumed-but-uncommitted LSNs were confirmed as flushed — a crash " +
        "here would lose the checkpointed range")
      // The loopback resumes at max(requested, confirmed_flush) like a real
      // slot: a FRESH stream restarted from the checkpointed offset (0)
      // must be able to replay the full range.
      val s2 = new PgMicroBatchStream(PgStreamOptions(Map(
        "host" -> "127.0.0.1", "port" -> m.port.toString, "user" -> "repl",
        "password" -> Password, "database" -> "shop", "slot" -> "s1",
        "publication" -> "pub1")))
      val parts = s2.planInputPartitions(PgStreamOffset(0L), PgStreamOffset(450L))
      val replayed = parts.head.asInstanceOf[PgEventsPartition].events.map(_.lsn).toSeq
      assert(replayed === Seq(110L, 120L, 310L, 320L, 450L),
        "checkpointed-but-uncommitted range was not replayable after crash")
      // and once commit() runs, the NEXT pull confirms it
      s2.commit(PgStreamOffset(450L))
      s2.latestOffset(PgStreamOffset(450L), s2.getDefaultReadLimit)
      val deadline = System.currentTimeMillis() + 3000
      while (m.confirmedLsn < 450L && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(m.confirmedLsn === 450L, "committed LSN was not confirmed to the slot")
    } finally m.stop()
  }

  /** Wait until the loopback has absorbed a status update whose write
    * position reached `lsn` (the updates arrive asynchronously after
    * `pull` returns). */
  private def awaitWritten(m: PgLoopback, lsn: Long): Unit = {
    val deadline = System.currentTimeMillis() + 3000
    while (m.writtenLsn < lsn && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(m.writtenLsn >= lsn, s"status update with write >= $lsn never arrived")
  }

  test("pg stream composes with the multi-table demux sink end to end") {
    import org.apache.spark.sql.types._
    val m = new PgLoopback(Password)
    val root = Files.createTempDirectory("graft-pg-lake").toString
    val ckpt = Files.createTempDirectory("graft-pg-lake-ckpt").toString
    // pgoutput v1 ships text-format tuples, so the landing schema is
    // string-typed; numeric casts belong to the downstream transform
    val ordersSchema = StructType(Seq(
      StructField("id", StringType), StructField("item", StringType)))
    val usersSchema = StructType(Seq(
      StructField("uid", StringType), StructField("name", StringType),
      StructField("bio", StringType)))
    val sink = new MultiTableSink(s"$root/{db}/ods_{db}_{table}",
      Seq(CdcTableSpec("public", "orders", ordersSchema, Seq("id"), "id"),
        CdcTableSpec("public", "users", usersSchema, Seq("uid"), "uid")), 1)
    try {
      // the demux treats "truncate" like an unknown op (skips it): filter
      // to row ops, the composition under test
      val rowOps = stream(m.port).filter("op IN ('insert','update','delete')")
      val q = sink.start(rowOps, ckpt)
      try q.processAllAvailable() finally q.stop()
      val orders = spark.read.parquet(s"$root/public/ods_public_orders/data")
        .select("id", "item").as[(String, String)].collect().toSet
      assert(orders === Set(("1", "gadget"))) // insert superseded by update
      val usersPath = s"$root/public/ods_public_users/data"
      val users =
        if (!new java.io.File(usersPath).exists) Set.empty[String]
        else spark.read.parquet(usersPath)
          .select("uid").as[String].collect().toSet
      assert(users === Set.empty) // insert then delete resolves to absent
    } finally m.stop()
  }
}
