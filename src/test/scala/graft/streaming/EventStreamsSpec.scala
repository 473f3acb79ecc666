package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

/** Watermarked window rollup + stateful sessionization, driven through
  * real micro-batches on a MemoryStream. */
class EventStreamsSpec extends SparkSuite {

  import spark.implicits._

  private val H = 3600L * 1000

  test("hourlyRollup: watermark drops very-late rows, windows finalize") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts_ms", "user_id", "event_type", "value")
    val q = EventStreams.hourlyRollup(events, "30 minutes")
      .writeStream.format("memory").queryName("rollup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour 0 rows, then advance the watermark well past hour 0
      in.addData((1L, 10L * 60 * 1000, 1L, "click", 1.0),
                 (2L, 20L * 60 * 1000, 1L, "click", 2.0))
      q.processAllAvailable()
      in.addData((3L, 3 * H + 1000L, 1L, "view", 5.0)) // watermark → ~2.5h
      q.processAllAvailable()
      // a very late hour-0 row must be dropped (beyond watermark)
      in.addData((4L, 30L * 60 * 1000, 1L, "click", 100.0))
      q.processAllAvailable()
      in.addData((5L, 6 * H, 1L, "view", 1.0)) // push watermark to close h3
      q.processAllAvailable()
      val got = spark.table("rollup_test")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)]
        .collect().toSet
      assert(got.contains(("click", 2L, 3.0))) // late row 4 NOT counted
      assert(got.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("dedupStream: duplicates within the watermark horizon emit once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts_ms", "user_id", "event_type", "value")
    val q = EventStreams.dedupStream(events, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, 1000L, 1L, "click", 1.0), (1L, 1000L, 1L, "click", 1.0))
      q.processAllAvailable()
      // same key again in a later micro-batch, still inside the horizon
      in.addData((1L, 2000L, 1L, "click", 1.0), (2L, 3000L, 1L, "view", 2.0))
      q.processAllAvailable()
      val got = spark.table("dedup_test").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(got === Seq(1L, 2L))
    } finally q.stop()
  }

  test("intervalJoin: pairs left rows with same-key right rows in the bound") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, Long, String, Double)]
    val rIn = MemoryStream[(Long, Long, Long, String, Double)]
    val cols = Seq("event_id", "ts_ms", "user_id", "event_type", "value")
    val joined = EventStreams.intervalJoin(
      lIn.toDF().toDF(cols: _*), rIn.toDF().toDF(cols: _*),
      key = "user_id", maxDelayMs = 10000, lateness = "1 minute")
    val q = joined
      .writeStream.format("memory").queryName("ij_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // right: signup at t=1s (user 1) and t=50s (user 2)
      rIn.addData((100L, 1000L, 1L, "signup", 0.0), (101L, 50000L, 2L, "signup", 0.0))
      // left: error at t=5s (user 1, within 10s of signup 100),
      //       error at t=30s (user 1, outside the bound)
      lIn.addData((1L, 5000L, 1L, "error", 1.0), (2L, 30000L, 1L, "error", 1.0))
      q.processAllAvailable()
      // advance both watermarks so the join emits finalized rows
      // (distinct filler users — same-key fillers would join each other)
      lIn.addData((8L, 600000L, 8L, "error", 0.0))
      rIn.addData((9L, 600000L, 9L, "noop", 0.0))
      q.processAllAvailable()
      val got = spark.table("ij_test").select("event_id", "r_event_id")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 100L)))
    } finally q.stop()
  }

  test("intervalJoin: sub-second maxDelayMs does not truncate to zero") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, Long, String, Double)]
    val rIn = MemoryStream[(Long, Long, Long, String, Double)]
    val cols = Seq("event_id", "ts_ms", "user_id", "event_type", "value")
    val joined = EventStreams.intervalJoin(
      lIn.toDF().toDF(cols: _*), rIn.toDF().toDF(cols: _*),
      key = "user_id", maxDelayMs = 500, lateness = "1 minute")
    val q = joined
      .writeStream.format("memory").queryName("ij_ms_test")
      .outputMode(OutputMode.Append()).start()
    try {
      rIn.addData((100L, 1000L, 1L, "signup", 0.0))
      // 400 ms after the right row: inside the 500 ms bound (the truncating
      // INTERVAL-0 form would reject it); 1800 ms: outside
      lIn.addData((1L, 1400L, 1L, "error", 1.0), (2L, 1800L, 1L, "error", 1.0))
      q.processAllAvailable()
      lIn.addData((8L, 600000L, 8L, "error", 0.0))
      rIn.addData((9L, 600000L, 9L, "noop", 0.0))
      q.processAllAvailable()
      val got = spark.table("ij_ms_test").select("event_id", "r_event_id")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 100L)))
    } finally q.stop()
  }

  test("enrich: stream-static broadcast join keeps unmatched events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts_ms", "user_id", "event_type", "value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrich(events, dim, "user_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((10L, 1000L, 1L, "click", 0.0), (11L, 1001L, 2L, "click", 0.0),
        (12L, 1002L, 99L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .as[(Long, Option[String])].collect().toSet
      assert(got === Set((10L, Some("gold")), (11L, Some("basic")), (12L, None)))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, one row per closed session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStreams.SessionEvent]
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString
    val q = EventStreams.sessionize(in.toDS(), gapMs = 10000)
      .writeStream.format("memory").queryName("sessions_test")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(
        EventStreams.SessionEvent(1, 1, 1000),
        EventStreams.SessionEvent(1, 2, 5000),
        EventStreams.SessionEvent(1, 3, 60000), // > gap → closes session 1
        EventStreams.SessionEvent(2, 4, 1000))
      q.processAllAvailable()
      // advance the watermark far past every open session's timeout
      in.addData(EventStreams.SessionEvent(9, 99, 500000))
      q.processAllAvailable()
      in.addData(EventStreams.SessionEvent(9, 100, 900000))
      q.processAllAvailable()
      val got = spark.table("sessions_test")
        .as[EventStreams.Session].collect().toSet
      // in-batch gap split: user1's first session closed by event 3
      assert(got.contains(EventStreams.Session(1, 1000, 5000, 2)))
      // watermark-driven timeouts closed the rest
      assert(got.contains(EventStreams.Session(1, 60000, 60000, 1)))
      assert(got.contains(EventStreams.Session(2, 1000, 1000, 1)))
    } finally q.stop()
  }
}
