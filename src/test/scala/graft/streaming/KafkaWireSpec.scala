package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Protocol-level coverage for [[KafkaWire]] against [[KafkaLoopback]]:
  * record-batch v2 encode/decode (CRC32C, varints, gzip), the five RPCs,
  * batch-spanning fetches, max_bytes truncation, and error surfaces. */
class KafkaWireSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)
  private def recs(kvs: (String, String)*): Seq[(Array[Byte], Array[Byte], Long)] =
    kvs.zipWithIndex.map { case ((k, v), i) =>
      (if (k == null) null else b(k), b(v), 1000L + i)
    }

  test("record batch v2 round-trips: offsets, timestamps, null keys") {
    val batch = KafkaWire.encodeBatch(42L, recs(("k0", "v0"), (null, "v1"), ("k2", "v2")))
    val out = KafkaWire.decodeBatches(batch, Long.MinValue, Long.MaxValue)
    assert(out.map(_.offset) === Seq(42L, 43L, 44L))
    assert(out.map(_.timestamp) === Seq(1000L, 1001L, 1002L))
    assert(out(0).key.toSeq === b("k0").toSeq)
    assert(out(1).key === null)
    assert(out.map(r => new String(r.value, UTF_8)) === Seq("v0", "v1", "v2"))
  }

  test("all four wire codecs round-trip; an undefined codec id fails actionably") {
    for (codec <- Seq(KafkaWire.CodecGzip, KafkaWire.CodecSnappy,
                      KafkaWire.CodecLz4, KafkaWire.CodecZstd)) {
      val batch = KafkaWire.encodeBatch(0L,
        recs(("k", "v" * 500), ("k2", "w" * 100)), codec)
      val out = KafkaWire.decodeBatches(batch, 0, 10)
      assert(out.map(r => new String(r.value, UTF_8)) === Seq("v" * 500, "w" * 100),
        s"codec $codec")
    }
    // forge attributes to the undefined codec 7: attributes live at bytes
    // 21-22, inside the CRC span — recompute the CRC so ONLY the codec
    // dispatch trips
    val forged = KafkaWire.encodeBatch(0L, recs(("k", "v")))
    forged(22) = 7
    val crc = new java.util.zip.CRC32C
    crc.update(forged, 21, forged.length - 21)
    val c = crc.getValue.toInt
    forged(17) = (c >>> 24).toByte; forged(18) = (c >>> 16).toByte
    forged(19) = (c >>> 8).toByte; forged(20) = c.toByte
    val e = intercept[IllegalStateException](KafkaWire.decodeBatches(forged, 0, 10))
    assert(e.getMessage.contains("unknown codec"))
  }

  test("CRC32C validation rejects a flipped payload bit") {
    val batch = KafkaWire.encodeBatch(0L, recs(("k", "hello")))
    batch(batch.length - 3) = (batch(batch.length - 3) ^ 0x01).toByte
    val e = intercept[IllegalStateException](
      KafkaWire.decodeBatches(batch, Long.MinValue, Long.MaxValue))
    assert(e.getMessage.contains("CRC32C"))
  }

  test("truncated trailing batch (broker max_bytes cut) is skipped, not fatal") {
    val b1 = KafkaWire.encodeBatch(0L, recs(("a", "1"), ("b", "2")))
    val b2 = KafkaWire.encodeBatch(2L, recs(("c", "3")))
    val cut = b1 ++ b2.take(b2.length / 2)
    val out = KafkaWire.decodeBatches(cut, Long.MinValue, Long.MaxValue)
    assert(out.map(_.offset) === Seq(0L, 1L))
  }

  test("produce assigns broker offsets; fetch returns them; metadata/listOffsets agree") {
    val broker = new KafkaLoopback(numPartitions = 2)
    try {
      broker.createTopic("t")
      val conn = new KafkaWire.Conn("127.0.0.1", broker.port)
      try {
        val versions = conn.apiVersions()
        assert(versions(KafkaWire.ApiFetch)._2 >= 4)
        val meta = conn.metadata(Seq("t"))
        assert(meta.topics.head.partitions.map(_.partition).sorted === Seq(0, 1))
        assert(conn.produce("t", 0, KafkaWire.encodeBatch(0L, recs(("k1", "v1"), ("k2", "v2")))) === 0L)
        assert(conn.produce("t", 0, KafkaWire.encodeBatch(0L, recs(("k3", "v3")))) === 2L)
        assert(conn.listOffset("t", 0, KafkaWire.EarliestTimestamp) === 0L)
        assert(conn.listOffset("t", 0, KafkaWire.LatestTimestamp) === 3L)
        assert(conn.listOffset("t", 1, KafkaWire.LatestTimestamp) === 0L)
        val (bytes, hw) = conn.fetch("t", 0, 0L)
        assert(hw === 3L)
        val out = KafkaWire.decodeBatches(bytes, 0L, hw)
        assert(out.map(r => new String(r.value, UTF_8)) === Seq("v1", "v2", "v3"))
      } finally conn.close()
    } finally broker.close()
  }

  test("readRange trims batch-spanning fetches to the exact half-open range") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("t")
      broker.append("t", 0, recs(("a", "0"), ("b", "1"), ("c", "2")))
      broker.append("t", 0, recs(("d", "3"), ("e", "4")))
      // [1, 4): spans both batches, trims head of the first and tail of the second
      val out = KafkaWire.readRange("127.0.0.1", broker.port, "t", 0, 1L, 4L)
      assert(out.map(_.offset) === Seq(1L, 2L, 3L))
      assert(out.map(r => new String(r.value, UTF_8)) === Seq("1", "2", "3"))
      // empty range
      assert(KafkaWire.readRange("127.0.0.1", broker.port, "t", 0, 4L, 4L).isEmpty)
    } finally broker.close()
  }

  test("readRange survives max_bytes truncation by re-fetching from the cut") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("t")
      (0 until 10).foreach(i =>
        broker.append("t", 0, recs((s"k$i", "x" * 2000))))
      // ~2 KB per batch, 4 KB budget: every fetch returns 1 full + 1 cut batch
      val out = KafkaWire.readRange("127.0.0.1", broker.port, "t", 0, 0L, 10L,
        maxBytes = 4096)
      assert(out.map(_.offset) === (0L until 10L))
    } finally broker.close()
  }

  test("a truncated (retention-expired) range fails loudly, never skips") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("t")
      broker.append("t", 0, recs(("a", "0"), ("b", "1")))
      broker.append("t", 0, recs(("c", "2"), ("d", "3")))
      broker.truncateBelow("t", 0, 2L)
      val e = intercept[IllegalStateException](
        KafkaWire.readRange("127.0.0.1", broker.port, "t", 0, 0L, 4L))
      assert(e.getMessage.contains("out of range") || e.getMessage.contains("drained"))
      // the retained suffix still reads fine
      assert(KafkaWire.readRange("127.0.0.1", broker.port, "t", 0, 2L, 4L)
        .map(_.offset) === Seq(2L, 3L))
    } finally broker.close()
  }

  test("SASL SCRAM-SHA-256 and PLAIN authenticate; bad credentials fail; " +
    "unauthenticated data APIs are cut") {
    val broker = new KafkaLoopback(numPartitions = 1,
      credentials = Some(("etl", "broker-pw")))
    try {
      broker.createTopic("t")
      broker.append("t", 0, recs(("k", "v")))
      // SCRAM (default mechanism): full round-trip incl. server signature
      val scram = new KafkaWire.Conn("127.0.0.1", broker.port,
        auth = Some(KafkaWire.SaslAuth("etl", "broker-pw")))
      try assert(KafkaWire.decodeBatches(scram.fetch("t", 0, 0L)._1, 0, 1)
        .map(r => new String(r.value, UTF_8)) === Seq("v"))
      finally scram.close()
      // PLAIN
      val plain = new KafkaWire.Conn("127.0.0.1", broker.port,
        auth = Some(KafkaWire.SaslAuth("etl", "broker-pw", "PLAIN")))
      try assert(plain.listOffset("t", 0, KafkaWire.LatestTimestamp) === 1L)
      finally plain.close()
      // wrong password: SCRAM proof rejected server-side
      val e1 = intercept[IllegalStateException] {
        new KafkaWire.Conn("127.0.0.1", broker.port,
          auth = Some(KafkaWire.SaslAuth("etl", "WRONG")))
      }
      assert(e1.getMessage.contains("SASL authentication failed"))
      // wrong password over PLAIN
      val e2 = intercept[IllegalStateException] {
        new KafkaWire.Conn("127.0.0.1", broker.port,
          auth = Some(KafkaWire.SaslAuth("etl", "WRONG", "PLAIN")))
      }
      assert(e2.getMessage.contains("SASL authentication failed"))
      // no auth at all: the broker cuts the connection on a data API
      intercept[Exception] {
        val anon = new KafkaWire.Conn("127.0.0.1", broker.port)
        try anon.metadata(Seq("t")) finally anon.close()
      }
    } finally broker.close()
  }

  test("compressed batches survive the produce→store→fetch wire round-trip") {
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("t")
      for ((codec, i) <- Seq(KafkaWire.CodecGzip, KafkaWire.CodecSnappy,
                             KafkaWire.CodecLz4, KafkaWire.CodecZstd).zipWithIndex)
        broker.append("t", 0, recs(("k", s"payload-α-$i")), codec = codec)
      val out = KafkaWire.readRange("127.0.0.1", broker.port, "t", 0, 0L, 4L)
      assert(out.map(r => new String(r.value, UTF_8))
        === (0 until 4).map(i => s"payload-α-$i"))
    } finally broker.close()
  }

  test("control batches (txn markers) are skipped, never emitted as data") {
    // unit level: a batch with attributes bit 0x20 decodes to NO records
    val marker = KafkaWire.encodeBatch(7L,
      Seq((Array[Byte](0, 0, 0, 1), Array.emptyByteArray, 0L)),
      extraAttributes = 0x20)
    assert(KafkaWire.decodeBatches(marker, Long.MinValue, Long.MaxValue).isEmpty,
      "a transaction marker leaked through as a data record")

    // wire level: data · marker · data interleaved in one partition log —
    // readRange over the full range must return ONLY the data records,
    // with the marker's offset consumed but absent from the output
    val broker = new KafkaLoopback(numPartitions = 1)
    try {
      broker.createTopic("tx")
      broker.append("tx", 0, recs(("a", "v0"), ("b", "v1"))) // offsets 0,1
      broker.appendControlMarker("tx", 0, commit = true)     // offset 2
      broker.append("tx", 0, recs(("c", "v3")))              // offset 3
      val out = KafkaWire.readRange("127.0.0.1", broker.port, "tx", 0,
        0L, 4L, 1 << 20, None)
      assert(out.map(_.offset) === Seq(0L, 1L, 3L))
      assert(out.map(r => new String(r.value, UTF_8)) === Seq("v0", "v1", "v3"))

      // a range that ENDS on the marker must still drain (advance is by
      // batch extent, not record offsets — a marker-only tail would
      // otherwise stall and throw)
      val head = KafkaWire.readRange("127.0.0.1", broker.port, "tx", 0,
        0L, 3L, 1 << 20, None)
      assert(head.map(_.offset) === Seq(0L, 1L))
      // and a range that is ONLY the marker returns empty, not an error
      val markerOnly = KafkaWire.readRange("127.0.0.1", broker.port, "tx", 0,
        2L, 3L, 1 << 20, None)
      assert(markerOnly.isEmpty)
    } finally broker.close()
  }
}
