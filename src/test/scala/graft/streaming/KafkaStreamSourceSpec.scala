package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite

/** `spark.readStream.format("graft-kafka")` — DSv2 micro-batch source over
  * the real Kafka wire ([[KafkaWire]] + [[KafkaLoopback]]): per-partition
  * parallel delivery, checkpointed exactly-once restart, backpressure via
  * maxOffsetsPerTrigger, and startingOffsets semantics. */
class KafkaStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)
  private def recs(kvs: (String, String)*): Seq[(Array[Byte], Array[Byte], Long)] =
    kvs.zipWithIndex.map { case ((k, v), i) => (b(k), b(v), 2000L + i) }

  private def stream(broker: KafkaLoopback, topic: String = "docs",
                     extra: Map[String, String] = Map.empty) = {
    val base = spark.readStream.format("graft-kafka")
      .option("bootstrap", broker.bootstrap)
      .option("topic", topic)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("delivers records from every partition with offsets and timestamps") {
    val broker = new KafkaLoopback(numPartitions = 2)
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(("a", "v0"), ("b", "v1")))
      broker.append("docs", 1, recs(("c", "v2")))
      val q = stream(broker).writeStream
        .format("memory").queryName("kafka_rows").outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("kafka_rows")
        .selectExpr("cast(value as string)", "partition", "offset", "timestamp")
        .as[(String, Int, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
      assert(rows === Seq(("v0", 0, 0L, 2000L), ("v1", 0, 1L, 2001L),
        ("v2", 1, 0L, 2000L)))
    } finally broker.close()
  }

  test("restart from checkpoint resumes at the committed log position") {
    val broker = new KafkaLoopback(numPartitions = 1)
    val ckpt = Files.createTempDirectory("graft-kafka-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[(Long, String)]
    def run(): Unit = {
      val q = stream(broker).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = batch.selectExpr("offset", "cast(value as string)")
            .as[(Long, String)].collect()
          seen.synchronized { seen ++= got }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(("k", "first"), ("k", "second")))
      run()
      assert(seen.sorted.toSeq === Seq((0L, "first"), (1L, "second")))
      broker.append("docs", 0, recs(("k", "third")))
      run() // a NEW query against the same checkpoint
      assert(seen.sorted.toSeq === Seq((0L, "first"), (1L, "second"), (2L, "third")),
        "restart re-delivered or skipped records")
    } finally broker.close()
  }

  test("offsets serialize to ONE line (OffsetSeqLog stores one line per source)") {
    val off = KafkaSourceOffset(Map(("docs", 0) -> 5L, ("docs", 1) -> 7L,
      ("aux.topic-2", 3) -> 0L))
    val json = off.json()
    assert(!json.contains('\n'),
      s"multi-line offset corrupts Spark's checkpoint offset log: '$json'")
    assert(KafkaSourceOffset.parse(json) === off, "round-trip")
    // legacy newline-joined checkpoints (pre-fix) must still load
    val legacy = "docs:0:5\ndocs:1:7"
    assert(KafkaSourceOffset.parse(legacy).positions
      === Map(("docs", 0) -> 5L, ("docs", 1) -> 7L))
  }

  test("restart from checkpoint resumes correctly with MULTIPLE partitions") {
    val broker = new KafkaLoopback(numPartitions = 3)
    val ckpt = Files.createTempDirectory("graft-kafka-ckpt-mp").toString
    val seen = mutable.ArrayBuffer.empty[(Int, Long, String)]
    def run(): Unit = {
      val q = stream(broker).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = batch.selectExpr("partition", "offset", "cast(value as string)")
            .as[(Int, Long, String)].collect()
          seen.synchronized { seen ++= got }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(("k", "p0-a"), ("k", "p0-b")))
      broker.append("docs", 1, recs(("k", "p1-a")))
      broker.append("docs", 2, recs(("k", "p2-a")))
      run()
      assert(seen.sorted.toSeq === Seq((0, 0L, "p0-a"), (0, 1L, "p0-b"),
        (1, 0L, "p1-a"), (2, 0L, "p2-a")))
      broker.append("docs", 0, recs(("k", "p0-c")))
      broker.append("docs", 2, recs(("k", "p2-b")))
      run() // NEW query, same checkpoint: the multi-partition offset must
            // have survived the OffsetSeqLog round-trip intact
      assert(seen.sorted.toSeq === Seq((0, 0L, "p0-a"), (0, 1L, "p0-b"),
        (0, 2L, "p0-c"), (1, 0L, "p1-a"), (2, 0L, "p2-a"), (2, 1L, "p2-b")),
        "restart re-delivered or skipped records on a multi-partition topic")
    } finally broker.close()
  }

  test("maxOffsetsPerTrigger paces batches and splits budget by backlog") {
    val broker = new KafkaLoopback(numPartitions = 2)
    try {
      broker.createTopic("docs")
      // backlog 6 on p0, 2 on p1
      broker.append("docs", 0, recs((0 until 6).map(i => (s"k$i", s"p0-$i")): _*))
      broker.append("docs", 1, recs((0 until 2).map(i => (s"k$i", s"p1-$i")): _*))
      val sizes = mutable.ArrayBuffer.empty[Long]
      val q = stream(broker, extra = Map("maxOffsetsPerTrigger" -> "4"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.synchronized { sizes += batch.count() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      val delivered = sizes.filter(_ > 0)
      assert(delivered.sum === 8L, s"expected all 8 rows, got $sizes")
      assert(delivered.forall(_ <= 4L), s"a batch exceeded the trigger cap: $sizes")
      assert(delivered.size >= 2, "cap of 4 cannot deliver 8 rows in one batch")
    } finally broker.close()
  }

  test("Trigger.AvailableNow drains to the pinned tip in capped batches, then exits") {
    val broker = new KafkaLoopback(numPartitions = 2)
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs((0 until 5).map(i => (s"k$i", s"p0-$i")): _*))
      broker.append("docs", 1, recs((0 until 3).map(i => (s"k$i", s"p1-$i")): _*))
      val sizes = mutable.ArrayBuffer.empty[Long]
      val q = stream(broker, extra = Map("maxOffsetsPerTrigger" -> "3"))
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.synchronized { sizes += batch.count() }
          ()
        }.start()
      q.awaitTermination() // AvailableNow: terminates at the pinned tip
      val delivered = sizes.synchronized(sizes.filter(_ > 0).toSeq)
      assert(delivered.sum === 8L, s"expected all 8 rows, got $sizes")
      assert(delivered.forall(_ <= 3L), s"a batch exceeded the cap: $sizes")
      assert(delivered.size >= 3, "cap of 3 cannot deliver 8 rows in two batches")
    } finally broker.close()
  }

  test("startingOffsets=latest skips the existing backlog") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(("k", "old-1"), ("k", "old-2")))
      val q = stream(broker, extra = Map("startingOffsets" -> "latest"))
        .writeStream
        .format("memory").queryName("kafka_latest").outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        broker.append("docs", 0, recs(("k", "new-1")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("kafka_latest")
        .selectExpr("cast(value as string)").as[String].collect().toSeq
      assert(rows === Seq("new-1"))
    } finally broker.close()
  }

  test("batch read: spark.read backfills the whole retained log") {
    val broker = new KafkaLoopback(numPartitions = 2)
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(("a", "v0"), ("b", "v1")))
      broker.append("docs", 1, recs(("c", "v2")))
      val rows = spark.read.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "docs")
        .load()
        .selectExpr("cast(value as string)", "partition", "offset")
        .as[(String, Int, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
      assert(rows === Seq(("v0", 0, 0L), ("v1", 0, 1L), ("v2", 1, 0L)))
      // retention-truncated logs backfill only the retained suffix
      // (truncation is whole-batch, like Kafka segment deletion)
      broker.truncateBelow("docs", 0, 2L)
      val after = spark.read.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "docs")
        .load().selectExpr("cast(value as string)").as[String].collect().toSet
      assert(after === Set("v2"))
    } finally broker.close()
  }

  test("plan contract: one Spark input partition per Kafka partition, exact ranges") {
    val broker = new KafkaLoopback(numPartitions = 3)
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(("a", "1"), ("b", "2")))
      broker.append("docs", 1, recs(("c", "3")))
      // partition 2 stays empty — it must get NO input partition
      val stream = new KafkaMicroBatchStream(
        KafkaStreamOptions(Map("bootstrap" -> broker.bootstrap, "topic" -> "docs")))
      val start = stream.initialOffset()
      val end = stream.latestOffset(start, stream.getDefaultReadLimit)
      val parts = stream.planInputPartitions(start, end)
        .map(_.asInstanceOf[KafkaRangePartition])
      assert(parts.map(p => (p.partition, p.from, p.until)).sorted.toSeq
        === Seq((0, 0L, 2L), (1, 0L, 1L)))
      assert(parts.forall(_.topic == "docs"))
    } finally broker.close()
  }

  test("SASL-authenticated brokers work end-to-end through the source") {
    val broker = new KafkaLoopback(numPartitions = 1,
      credentials = Some(("etl", "broker-pw")))
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(("k", "secured")))
      val q = stream(broker, extra = Map(
          "user" -> "etl", "password" -> "broker-pw")) // SCRAM default
        .writeStream.format("memory").queryName("kafka_sasl")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("kafka_sasl").selectExpr("cast(value as string)")
        .as[String].collect().toSeq === Seq("secured"))
    } finally broker.close()
  }

  test("composes with from_json parsing into typed columns downstream") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("docs")
      broker.append("docs", 0, recs(
        ("1", """{"doc_id": 1, "text": "hello world"}"""),
        ("2", """{"doc_id": 2, "text": "kafka wire"}""")))
      val q = stream(broker)
        .selectExpr("from_json(cast(value as string), 'doc_id BIGINT, text STRING') j")
        .select("j.doc_id", "j.text")
        .writeStream
        .format("memory").queryName("kafka_typed").outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("kafka_typed").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(rows === Seq((1L, "hello world"), (2L, "kafka wire")))
    } finally broker.close()
  }
}
