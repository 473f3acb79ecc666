package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

/** One-shot wire-throughput measurement (dev harness, like the binlog
  * bounded-drain probe): produce N records through Produce v3 into the
  * loopback broker, then drain them back through the Fetch loop, and
  * print records/s + MB/s for each direction. Run via
  * `Test/runMain graft.streaming.KafkaThroughputProbe [nRecords] [codec]`.
  * Numbers go to COVERAGE.md; this is a measurement tool, not a spec
  * (wall-clock assertions would flake under host contention). */
object KafkaThroughputProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val codec = if (args.length > 1) args(1).toInt else KafkaWire.CodecNone
    val batchSize = 1000
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("probe")
      val value = ("x" * 100).getBytes(UTF_8) // ~118 B/record with key+overhead
      val conn = new KafkaWire.Conn("127.0.0.1", broker.port)
      val t0 = System.nanoTime()
      var produced = 0
      while (produced < n) {
        val recs = (0 until batchSize).map(i =>
          (s"k${produced + i}".getBytes(UTF_8), value, 1000L + produced + i))
        conn.produce("probe", 0, KafkaWire.encodeBatch(0L, recs, codec))
        produced += batchSize
      }
      conn.close()
      val tProduce = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val got = KafkaWire.readRange("127.0.0.1", broker.port, "probe", 0, 0L, n.toLong)
      val tDrain = (System.nanoTime() - t1) / 1e9
      require(got.size == n, s"drained ${got.size} of $n")
      val bytes = n.toLong * (value.length + 10)
      println(f"[kafka-probe] codec=$codec n=$n produce ${tProduce}%.1fs " +
        f"(${n / tProduce / 1000}%.0fk rec/s, ${bytes / tProduce / 1e6}%.0f MB/s) " +
        f"drain ${tDrain}%.1fs (${n / tDrain / 1000}%.0fk rec/s, " +
        f"${bytes / tDrain / 1e6}%.0f MB/s)")
    } finally broker.close()
  }
}
