package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** `format("graft-kafka")` write path: batch + streaming produce through
  * [[KafkaWire]] into [[KafkaLoopback]], default-partitioner placement,
  * explicit partition/timestamp columns, and source round-trips. */
class KafkaSinkSpec extends SparkSuite {

  import spark.implicits._

  private def readAll(broker: KafkaLoopback, topic: String, parts: Int)
      : Seq[(Int, KafkaWire.Record)] =
    (0 until parts).flatMap { p =>
      val conn = new KafkaWire.Conn("127.0.0.1", broker.port)
      val end = try conn.listOffset(topic, p, KafkaWire.LatestTimestamp)
                finally conn.close()
      KafkaWire.readRange("127.0.0.1", broker.port, topic, p, 0L, end).map((p, _))
    }

  test("batch write places keyed records by the default partitioner and round-trips") {
    val broker = new KafkaLoopback(numPartitions = 3)
    try {
      broker.createTopic("out")
      val rows = (0 until 60).map(i => (s"key-${i % 7}", s"v$i"))
      rows.toDF("key", "value").repartition(4)
        .write.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out")
        .mode("append").save()
      val got = readAll(broker, "out", 3)
      assert(got.size === 60)
      assert(got.map(r => new String(r._2.value, UTF_8)).toSet
        === rows.map(_._2).toSet)
      // every record of one key sits in ONE partition, and that partition
      // is exactly murmur2(key) — the published default-partitioner rule
      val byKey = got.groupBy(r => new String(r._2.key, UTF_8))
        .map { case (k, rs) => k -> rs.map(_._1).distinct }
      assert(byKey.values.forall(_.size == 1), s"key split across partitions: $byKey")
      byKey.foreach { case (k, Seq(p)) =>
        assert(p === (KafkaSink.murmur2(k.getBytes(UTF_8)) & 0x7fffffff) % 3)
      }
    } finally broker.close()
  }

  test("explicit partition and timestamp columns override the partitioner") {
    val broker = new KafkaLoopback(numPartitions = 4)
    try {
      broker.createTopic("out")
      Seq(("a", "v1", 3, 111L), ("b", "v2", 0, 222L))
        .toDF("key", "value", "partition", "timestamp")
        .write.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out")
        .mode("append").save()
      val got = readAll(broker, "out", 4)
        .map(r => (r._1, new String(r._2.value, UTF_8), r._2.timestamp))
      assert(got.sortBy(_._2) === Seq((3, "v1", 111L), (0, "v2", 222L)).sortBy(_._2))
    } finally broker.close()
  }

  test("binary value column and null keys (sticky per task) work") {
    val broker = new KafkaLoopback(numPartitions = 2)
    try {
      broker.createTopic("out")
      Seq(Tuple1(Array[Byte](1, 2, 3)), Tuple1(Array[Byte](4, 5)))
        .toDF("value").coalesce(1)
        .write.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out")
        .mode("append").save()
      val got = readAll(broker, "out", 2)
      assert(got.size === 2)
      assert(got.forall(_._2.key == null))
      // one task ⇒ sticky ⇒ all in one partition
      assert(got.map(_._1).distinct.size === 1)
      assert(got.map(_._2.value.toSeq).toSet
        === Set(Seq[Byte](1, 2, 3), Seq[Byte](4, 5)))
    } finally broker.close()
  }

  test("sink compression option: zstd batches land and read back") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("out")
      Seq(("k", "compressed-payload " * 50)).toDF("key", "value")
        .write.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out")
        .option("compression", "zstd")
        .mode("append").save()
      val got = readAll(broker, "out", 1)
      assert(got.size === 1)
      assert(new String(got.head._2.value, UTF_8) === "compressed-payload " * 50)
    } finally broker.close()
  }

  test("a missing value column fails with an actionable message") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("out")
      val e = intercept[Exception] {
        Seq(Tuple1("x")).toDF("not_value")
          .write.format("graft-kafka")
          .option("bootstrap", broker.bootstrap).option("topic", "out")
          .mode("append").save()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("'value' column")))
    } finally broker.close()
  }

  test("streaming write delivers each micro-batch; source reads them back") {
    val broker = new KafkaLoopback(numPartitions = 2)
    try {
      broker.createTopic("out")
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, String)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-kafka-sink-ckpt")
      val q = in.toDF().toDF("key", "value")
        .writeStream.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out")
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        in.addData(("k1", "batch1-a"), ("k2", "batch1-b"))
        q.processAllAvailable()
        in.addData(("k1", "batch2-a"))
        q.processAllAvailable()
      } finally q.stop()
      // read back through the SOURCE — full wire round-trip both ways
      val got = spark.readStream.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out").load()
      val rq = got.writeStream.format("memory").queryName("kafka_roundtrip")
        .outputMode("append").start()
      try rq.processAllAvailable() finally rq.stop()
      val vals = spark.table("kafka_roundtrip")
        .selectExpr("cast(value as string)").as[String].collect().toSet
      assert(vals === Set("batch1-a", "batch1-b", "batch2-a"))
    } finally broker.close()
  }
}
