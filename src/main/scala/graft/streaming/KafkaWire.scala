package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable.ArrayBuffer

/** From-scratch Kafka binary-protocol client (JDK sockets only), the same
  * pattern as [[graft.sources.MongoWire]] / [[BinlogWire]]: speak the REAL
  * wire format so the source works against any broker, and test against an
  * in-process loopback broker speaking the identical bytes.
  *
  * Reference behavior modeled on the published Kafka protocol guide
  * (kafka.apache.org/protocol) — the reference repo ingests streams via a
  * deltastreamer-style loop (see SURVEY §2.4); Kafka is the
  * production-standard transport for that loop at 100 TB scale, so this is
  * a beyond-parity source. Implemented (non-flexible versions, fixed
  * request header v1 / response header v0):
  *
  *  - ApiVersions v0 (key 18) — handshake sanity check
  *  - Metadata    v1 (key 3)  — topic → partition/leader discovery
  *  - ListOffsets v1 (key 2)  — earliest (-2) / latest (-1) log offsets
  *  - Fetch       v4 (key 1)  — record-batch (magic v2) reads
  *  - Produce     v3 (key 0)  — record-batch (magic v2) writes
  *
  * RecordBatch v2 is fully encoded/decoded here: CRC32C over
  * attributes..end (validated on read), zigzag-varint record fields,
  * headers, and ALL FOUR wire codecs — gzip (JDK), snappy (xerial framed
  * stream), lz4 (LZ4 frame format), zstd — each via libraries Spark
  * itself ships, so no new dependencies.
  *
  * Scale shape: ONE socket per (task, broker); the parallel unit is the
  * Kafka partition, mapped 1:1 to Spark input partitions by
  * [[KafkaStreamSource]]. No driver-side buffering anywhere: offsets are
  * broker log positions, so a 1000-executor cluster fans out as one
  * bounded Fetch loop per partition.
  */
object KafkaWire {

  // ---- api keys ----
  val ApiProduce = 0.toShort
  val ApiFetch = 1.toShort
  val ApiListOffsets = 2.toShort
  val ApiMetadata = 3.toShort
  val ApiSaslHandshake = 17.toShort
  val ApiVersions = 18.toShort
  val ApiSaslAuthenticate = 36.toShort

  /** SASL credentials for a broker connection. Mechanisms: `PLAIN`
    * (username/password over the [authzid]\0user\0pass payload — pair
    * with TLS in production) and `SCRAM-SHA-256` (RFC 7677 with mutual
    * server-signature verification, the same construction as the
    * Mongo/Postgres clients here). */
  final case class SaslAuth(user: String, password: String,
                            mechanism: String = "SCRAM-SHA-256") {
    require(mechanism == "PLAIN" || mechanism == "SCRAM-SHA-256",
      s"mechanism must be PLAIN or SCRAM-SHA-256, got '$mechanism'")
  }

  // ---- error codes (the subset we surface) ----
  val ErrNone = 0.toShort
  val ErrOffsetOutOfRange = 1.toShort
  val ErrCorruptMessage = 2.toShort
  val ErrUnknownTopicOrPartition = 3.toShort

  val EarliestTimestamp: Long = -2L
  val LatestTimestamp: Long = -1L

  final case class Record(offset: Long, timestamp: Long, key: Array[Byte],
                          value: Array[Byte], headers: Seq[(String, Array[Byte])])
  final case class PartitionMeta(partition: Int, leader: Int, error: Short)
  final case class TopicMeta(name: String, error: Short, partitions: Seq[PartitionMeta])
  final case class BrokerMeta(nodeId: Int, host: String, port: Int)
  final case class MetadataResponse(brokers: Seq[BrokerMeta], topics: Seq[TopicMeta])

  // ======================================================================
  // primitive codec
  // ======================================================================

  final class Writer {
    private val bos = new ByteArrayOutputStream(256)
    private val out = new DataOutputStream(bos)
    def i8(v: Int): Writer = { out.writeByte(v); this }
    def i16(v: Int): Writer = { out.writeShort(v); this }
    def i32(v: Int): Writer = { out.writeInt(v); this }
    def i64(v: Long): Writer = { out.writeLong(v); this }
    def raw(b: Array[Byte]): Writer = { out.write(b); this }
    def str(s: String): Writer = {
      if (s == null) i16(-1)
      else { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    }
    def bytes(b: Array[Byte]): Writer = {
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    }
    def varInt(v: Int): Writer = varLong(v.toLong)
    def varLong(v: Long): Writer = { // zigzag
      var u = (v << 1) ^ (v >> 63)
      while ((u & ~0x7fL) != 0) { out.writeByte(((u & 0x7f) | 0x80).toInt); u >>>= 7 }
      out.writeByte(u.toInt)
      this
    }
    def size: Int = bos.size()
    def toBytes: Array[Byte] = bos.toByteArray
  }

  final class Reader(buf: ByteBuffer) {
    def this(b: Array[Byte]) = this(ByteBuffer.wrap(b))
    def i8(): Byte = buf.get()
    def i16(): Short = buf.getShort()
    def i32(): Int = buf.getInt()
    def i64(): Long = buf.getLong()
    def raw(n: Int): Array[Byte] = { val b = new Array[Byte](n); buf.get(b); b }
    def str(): String = {
      val n = i16()
      if (n < 0) null else new String(raw(n), UTF_8)
    }
    def bytes(): Array[Byte] = {
      val n = i32()
      if (n < 0) null else raw(n)
    }
    def varInt(): Int = varLong().toInt
    def varLong(): Long = {
      var u = 0L; var shift = 0; var b = 0
      do {
        b = buf.get() & 0xff
        u |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      (u >>> 1) ^ -(u & 1) // un-zigzag
    }
    def remaining: Int = buf.remaining()
    def position: Int = buf.position()
    def skip(n: Int): Unit = buf.position(buf.position() + n)
  }

  // ======================================================================
  // RecordBatch v2 (magic 2)
  // ======================================================================

  val CodecMask = 0x07
  val CodecNone = 0
  val CodecGzip = 1
  val CodecSnappy = 2
  val CodecLz4 = 3
  val CodecZstd = 4

  /** The four Kafka wire codecs, each in the EXACT stream format the
    * broker expects — all from libraries Spark itself ships (no new
    * dependencies): gzip (JDK), snappy via xerial's framed
    * SnappyOutputStream (Kafka's CompressionType.SNAPPY wrapper), lz4 via
    * the LZ4 FRAME format (lz4-java's LZ4FrameOutputStream — record-batch
    * magic v2 uses the spec-correct frame, the v0-era broken-checksum
    * variant is long gone), zstd via zstd-jni's standard stream. */
  private def compressor(codec: Int, out: java.io.OutputStream): java.io.OutputStream =
    codec match {
      case CodecGzip => new GZIPOutputStream(out)
      case CodecSnappy => new org.xerial.snappy.SnappyOutputStream(out)
      case CodecLz4 => new net.jpountz.lz4.LZ4FrameOutputStream(out)
      case CodecZstd => new com.github.luben.zstd.ZstdOutputStream(out)
      case other => throw new IllegalArgumentException(s"unsupported codec $other")
    }

  private def decompressor(codec: Int, in: java.io.InputStream): java.io.InputStream =
    codec match {
      case CodecGzip => new GZIPInputStream(in)
      case CodecSnappy => new org.xerial.snappy.SnappyInputStream(in)
      case CodecLz4 => new net.jpountz.lz4.LZ4FrameInputStream(in)
      case CodecZstd => new com.github.luben.zstd.ZstdInputStream(in)
      case other => throw new IllegalStateException(
        s"record batch compressed with unknown codec #$other")
    }

  /** Encode one v2 record batch. `baseOffset` is what the writer believes;
    * brokers reassign it on append (the field sits OUTSIDE the CRC for
    * exactly that reason). */
  def encodeBatch(baseOffset: Long, records: Seq[(Array[Byte], Array[Byte], Long)],
                  codec: Int = CodecNone, extraAttributes: Int = 0): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val firstTs = records.head._3
    val maxTs = records.map(_._3).max
    val body = new Writer
    records.zipWithIndex.foreach { case ((k, v, ts), i) =>
      val rec = new Writer
      rec.i8(0) // record attributes (unused)
      rec.varLong(ts - firstTs)
      rec.varInt(i)
      if (k == null) rec.varInt(-1) else { rec.varInt(k.length); rec.raw(k) }
      if (v == null) rec.varInt(-1) else { rec.varInt(v.length); rec.raw(v) }
      rec.varInt(0) // headers
      val rb = rec.toBytes
      body.varInt(rb.length); body.raw(rb)
    }
    val payload = codec match {
      case CodecNone => body.toBytes
      case other =>
        val bos = new ByteArrayOutputStream()
        val cos = compressor(other, bos)
        cos.write(body.toBytes); cos.close()
        bos.toByteArray
    }
    // crc covers attributes(i16)..end
    val afterCrc = new Writer
    afterCrc.i16((codec & CodecMask) | extraAttributes) // attributes
    afterCrc.i32(records.size - 1)                // lastOffsetDelta
    afterCrc.i64(firstTs)                         // firstTimestamp
    afterCrc.i64(maxTs)                           // maxTimestamp
    afterCrc.i64(-1L)                             // producerId
    afterCrc.i16(-1)                              // producerEpoch
    afterCrc.i32(-1)                              // baseSequence
    afterCrc.i32(records.size)
    afterCrc.raw(payload)
    val tail = afterCrc.toBytes
    val crc = new CRC32C
    crc.update(tail)
    val w = new Writer
    w.i64(baseOffset)
    w.i32(4 + 1 + 4 + tail.length)                // batchLength: from epoch to end
    w.i32(-1)                                     // partitionLeaderEpoch
    w.i8(2)                                       // magic
    w.i32(crc.getValue.toInt)
    w.raw(tail)
    w.toBytes
  }

  /** Decode every record in a concatenation of v2 batches, keeping only
    * offsets in `[fromOffset, untilOffset)` (brokers return whole batches
    * CONTAINING the fetch offset — trimming is the client's job). CRC32C
    * is validated per batch; a trailing partial batch (brokers truncate at
    * `max_bytes`) is skipped silently, per protocol. */
  def decodeBatches(data: Array[Byte], fromOffset: Long,
                    untilOffset: Long): Seq[Record] =
    decodeBatchesAdvance(data, fromOffset, untilOffset)._1

  /** Like [[decodeBatches]], but also returns how far the log position
    * advanced: `max(baseOffset + lastOffsetDelta + 1)` over the COMPLETE
    * batches seen. Callers looping Fetch must advance by this, not by
    * `max(record offset) + 1` — a control batch (or a batch whose records
    * are all compacted away) yields zero records but still consumes
    * offsets, and advancing by records alone would spin forever on it. */
  def decodeBatchesAdvance(data: Array[Byte], fromOffset: Long,
                           untilOffset: Long): (Seq[Record], Long) = {
    val out = ArrayBuffer.empty[Record]
    var advance = Long.MinValue
    val buf = ByteBuffer.wrap(data)
    while (buf.remaining() >= 12) {
      val baseOffset = buf.getLong()
      val batchLength = buf.getInt()
      if (buf.remaining() < batchLength) {
        buf.position(buf.limit()) // truncated trailing batch
      } else {
        val batch = new Array[Byte](batchLength)
        buf.get(batch)
        val r = new Reader(batch)
        r.i32() // partitionLeaderEpoch
        val magic = r.i8()
        require(magic == 2, s"unsupported record-batch magic $magic (want v2)")
        val crcStored = r.i32()
        val crc = new CRC32C
        crc.update(batch, r.position, batch.length - r.position)
        if (crc.getValue.toInt != crcStored)
          throw new IllegalStateException(
            s"record batch at offset $baseOffset failed CRC32C " +
            f"(stored 0x$crcStored%08x, computed 0x${crc.getValue.toInt}%08x)")
        val attributes = r.i16()
        val lastOffsetDelta = r.i32()
        advance = math.max(advance, baseOffset + lastOffsetDelta + 1)
        val firstTs = r.i64()
        r.i64(); r.i64(); r.i16(); r.i32() // maxTs, pid, pepoch, baseSeq
        val count = r.i32()
        // Control batches (attributes bit 0x20) carry transaction
        // commit/abort MARKERS from transactional producers, not data —
        // skip their records entirely (offsets still advance past them
        // because the range filter below is what bounds the fetch, and
        // the markers' offsets are simply never emitted).
        val isControl = (attributes & 0x20) != 0
        val payload = r.raw(r.remaining)
        val records = if (isControl) Array.emptyByteArray
        else (attributes & CodecMask) match {
          case CodecNone => payload
          case c =>
            val dec = decompressor(c, new ByteArrayInputStream(payload))
            val bos = new ByteArrayOutputStream(payload.length * 4)
            val tmp = new Array[Byte](8192)
            var n = dec.read(tmp)
            while (n >= 0) { bos.write(tmp, 0, n); n = dec.read(tmp) }
            dec.close()
            bos.toByteArray
        }
        val rr = new Reader(records)
        var i = 0
        while (!isControl && i < count) {
          val len = rr.varInt()
          val end = rr.position + len
          rr.i8() // record attributes
          val tsDelta = rr.varLong()
          val offDelta = rr.varInt()
          val klen = rr.varInt()
          val key = if (klen < 0) null else rr.raw(klen)
          val vlen = rr.varInt()
          val value = if (vlen < 0) null else rr.raw(vlen)
          val nHeaders = rr.varInt()
          val headers = (0 until nHeaders).map { _ =>
            val hk = new String(rr.raw(rr.varInt()), UTF_8)
            val hvLen = rr.varInt()
            val hv = if (hvLen < 0) null else rr.raw(hvLen)
            (hk, hv)
          }
          require(rr.position == end, s"record length mismatch in batch $baseOffset")
          val off = baseOffset + offDelta
          if (off >= fromOffset && off < untilOffset)
            out += Record(off, firstTs + tsDelta, key, value, headers)
          i += 1
        }
      }
    }
    (out.toSeq, advance)
  }

  // ======================================================================
  // connection
  // ======================================================================

  /** One broker connection: framed request/response with correlation-id
    * bookkeeping. Not thread-safe (one per task, like the other wire
    * clients here). */
  final class Conn(host: String, port: Int, clientId: String = "graft",
                   auth: Option[SaslAuth] = None) extends AutoCloseable {
    private val socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    private val out = new DataOutputStream(socket.getOutputStream)
    private val in = new DataInputStream(socket.getInputStream)
    private var correlation = 0
    auth.foreach(saslAuthenticate)

    private def send(apiKey: Short, apiVersion: Short, body: Array[Byte]): Array[Byte] = {
      correlation += 1
      val h = new Writer
      h.i16(apiKey).i16(apiVersion).i32(correlation).str(clientId)
      val header = h.toBytes
      out.writeInt(header.length + body.length)
      out.write(header); out.write(body); out.flush()
      val size = in.readInt()
      if (size < 4 || size > (1 << 26))
        throw new IllegalStateException(s"implausible kafka response size $size")
      val resp = new Array[Byte](size)
      in.readFully(resp)
      val r = new Reader(resp)
      val corr = r.i32()
      if (corr != correlation)
        throw new IllegalStateException(s"correlation mismatch: sent $correlation got $corr")
      r.raw(r.remaining)
    }

    /** SaslHandshake v1 + SaslAuthenticate v0 rounds. */
    private def saslAuthenticate(a: SaslAuth): Unit = {
      val hw = new Writer
      hw.str(a.mechanism)
      val hr = new Reader(send(ApiSaslHandshake, 1, hw.toBytes))
      val herr = hr.i16()
      if (herr != ErrNone) {
        val offered = (0 until hr.i32()).map(_ => hr.str())
        throw new IllegalStateException(
          s"broker rejected SASL mechanism ${a.mechanism} (error $herr; " +
            s"offers: ${offered.mkString(",")})")
      }
      def round(bytes: Array[Byte]): Array[Byte] = {
        val w = new Writer
        w.bytes(bytes)
        val r = new Reader(send(ApiSaslAuthenticate, 0, w.toBytes))
        val err = r.i16(); val msg = r.str()
        if (err != ErrNone) throw new IllegalStateException(
          s"SASL authentication failed: ${Option(msg).getOrElse(s"error $err")}")
        r.bytes()
      }
      a.mechanism match {
        case "PLAIN" =>
          round(("\u0000" + a.user + "\u0000" + a.password).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case "SCRAM-SHA-256" =>
          val cnonce = java.util.UUID.randomUUID().toString.replace("-", "")
          val bare = s"n=${a.user.replace("=", "=3D").replace(",", "=2C")},r=$cnonce"
          val serverFirst = new String(round(("n,," + bare).getBytes(java.nio.charset.StandardCharsets.UTF_8)),
            java.nio.charset.StandardCharsets.UTF_8)
          val attrs = serverFirst.split(",").map { kv =>
            val i = kv.indexOf('='); kv.substring(0, i) -> kv.substring(i + 1)
          }.toMap
          val fullNonce = attrs("r")
          require(fullNonce.startsWith(cnonce) && fullNonce.length > cnonce.length,
            "server nonce does not extend the client nonce")
          val iters = attrs("i").toInt
          require(iters >= 4096, s"refusing weak SCRAM iteration count $iters")
          val salted = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
            .generateSecret(new javax.crypto.spec.PBEKeySpec(a.password.toCharArray,
              java.util.Base64.getDecoder.decode(attrs("s")), iters, 256)).getEncoded
          def hmac(key: Array[Byte], msg: String): Array[Byte] = {
            val m = javax.crypto.Mac.getInstance("HmacSHA256")
            m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
            m.doFinal(msg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          val clientKey = hmac(salted, "Client Key")
          val storedKey = java.security.MessageDigest.getInstance("SHA-256").digest(clientKey)
          val withoutProof = s"c=biws,r=$fullNonce"
          val authMessage = s"$bare,$serverFirst,$withoutProof"
          val clientSig = hmac(storedKey, authMessage)
          val proof = clientKey.zip(clientSig).map { case (x, y) => (x ^ y).toByte }
          val serverFinal = new String(round(
            s"$withoutProof,p=${java.util.Base64.getEncoder.encodeToString(proof)}"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
            java.nio.charset.StandardCharsets.UTF_8)
          val fin = serverFinal.split(",").map { kv =>
            val i = kv.indexOf('='); kv.substring(0, i) -> kv.substring(i + 1)
          }.toMap
          val serverSig = hmac(hmac(salted, "Server Key"), authMessage)
          require(java.util.Arrays.equals(
            java.util.Base64.getDecoder.decode(fin("v")), serverSig),
            "server signature mismatch — peer does not hold this credential")
      }
    }

    /** ApiVersions v0 → map of apiKey → (min, max). */
    def apiVersions(): Map[Short, (Short, Short)] = {
      val r = new Reader(send(ApiVersions, 0, Array.emptyByteArray))
      val err = r.i16()
      require(err == ErrNone, s"ApiVersions error $err")
      val n = r.i32()
      (0 until n).map { _ => (r.i16(), (r.i16(), r.i16())) }.toMap
    }

    /** Metadata v1 for the given topics (empty = all). */
    def metadata(topics: Seq[String]): MetadataResponse = {
      val w = new Writer
      w.i32(topics.size); topics.foreach(w.str)
      val r = new Reader(send(ApiMetadata, 1, w.toBytes))
      val brokers = (0 until r.i32()).map { _ =>
        val id = r.i32(); val host = r.str(); val port = r.i32(); r.str() // rack
        BrokerMeta(id, host, port)
      }
      r.i32() // controller id
      val ts = (0 until r.i32()).map { _ =>
        val err = r.i16(); val name = r.str(); r.i8() // is_internal
        val parts = (0 until r.i32()).map { _ =>
          val perr = r.i16(); val pid = r.i32(); val leader = r.i32()
          r.raw(4 * r.i32()) // replicas
          r.raw(4 * r.i32()) // isr
          PartitionMeta(pid, leader, perr)
        }
        TopicMeta(name, err, parts)
      }
      MetadataResponse(brokers, ts)
    }

    /** ListOffsets v1: timestamp -1 = latest (log end), -2 = earliest. */
    def listOffset(topic: String, partition: Int, timestamp: Long): Long = {
      val w = new Writer
      w.i32(-1) // replica id
      w.i32(1).str(topic).i32(1).i32(partition).i64(timestamp)
      val r = new Reader(send(ApiListOffsets, 1, w.toBytes))
      require(r.i32() == 1, "unexpected topic count in ListOffsets response")
      val name = r.str()
      require(name == topic, s"ListOffsets returned $name, wanted $topic")
      require(r.i32() == 1, "unexpected partition count")
      val pid = r.i32(); val err = r.i16(); r.i64() // ts
      if (err != ErrNone)
        throw new IllegalStateException(s"ListOffsets($topic-$pid) error $err")
      r.i64()
    }

    /** Fetch v4 one partition starting at `offset`. Returns the raw
      * record-set bytes (possibly spanning the fetch offset — see
      * [[decodeBatches]]) plus the high watermark. */
    def fetch(topic: String, partition: Int, offset: Long,
              maxBytes: Int = 4 << 20): (Array[Byte], Long) = {
      val w = new Writer
      w.i32(-1)          // replica id
      w.i32(0)           // max wait ms — bounded reads, never long-poll
      w.i32(0)           // min bytes
      w.i32(maxBytes)    // response max bytes
      w.i8(0)            // isolation level: read_uncommitted
      w.i32(1).str(topic).i32(1).i32(partition).i64(offset).i32(maxBytes)
      val r = new Reader(send(ApiFetch, 4, w.toBytes))
      r.i32() // throttle
      require(r.i32() == 1, "unexpected topic count in Fetch response")
      val name = r.str()
      require(name == topic, s"Fetch returned $name, wanted $topic")
      require(r.i32() == 1, "unexpected partition count")
      val pid = r.i32(); val err = r.i16()
      val hw = r.i64()
      r.i64() // last stable offset
      r.i32() match { case n if n > 0 => (0 until n).foreach { _ => r.i64(); r.i64() }; case _ => } // aborted txns
      val recordSet = r.bytes()
      if (err != ErrNone)
        throw new IllegalStateException(s"Fetch($topic-$pid@$offset) error $err" +
          (if (err == ErrOffsetOutOfRange) " (offset out of range — log truncated past the checkpoint?)" else ""))
      (if (recordSet == null) Array.emptyByteArray else recordSet, hw)
    }

    /** Produce v3 (acks=-1): append one encoded record batch, returning
      * the broker-assigned base offset. */
    def produce(topic: String, partition: Int, recordBatch: Array[Byte]): Long = {
      val w = new Writer
      w.str(null)  // transactional id
      w.i16(-1)    // acks: all
      w.i32(30000) // timeout
      w.i32(1).str(topic).i32(1).i32(partition).bytes(recordBatch)
      val r = new Reader(send(ApiProduce, 3, w.toBytes))
      require(r.i32() == 1, "unexpected topic count in Produce response")
      val name = r.str()
      require(name == topic, s"Produce response for $name, wanted $topic")
      require(r.i32() == 1, "unexpected partition count")
      val pid = r.i32(); val err = r.i16()
      if (err != ErrNone)
        throw new IllegalStateException(s"Produce($topic-$pid) error $err")
      val baseOffset = r.i64()
      r.i64() // log append time
      baseOffset
    }

    override def close(): Unit = {
      try out.close() catch { case _: Exception => }
      try socket.close() catch { case _: Exception => }
    }
  }

  /** Bounded range read: all records of `[from, until)`, looping Fetch
    * until the range is drained. The loop is executor-side and strictly
    * bounded — exactly the re-readable micro-batch contract. */
  def readRange(host: String, port: Int, topic: String, partition: Int,
                from: Long, until: Long, maxBytes: Int = 4 << 20,
                auth: Option[SaslAuth] = None): Seq[Record] = {
    if (until <= from) return Seq.empty
    val conn = new Conn(host, port, auth = auth)
    try {
      val out = ArrayBuffer.empty[Record]
      var pos = from
      var stall = 0
      while (pos < until && stall < 3) {
        val (bytes, hw) = conn.fetch(topic, partition, pos, maxBytes)
        val (recs, batchEnd) = decodeBatchesAdvance(bytes, pos, until)
        out ++= recs
        if (batchEnd > pos) {
          // advance by BATCH extent, not record offsets: a control batch
          // (txn marker) or fully-compacted batch yields no records but
          // still consumes offsets
          pos = batchEnd
          stall = 0
        } else {
          // nothing decodable at pos: either past HW (shouldn't happen for
          // a checkpointed range) or an empty response — avoid spinning
          if (pos >= hw) stall = 3 else stall += 1
        }
      }
      if (pos < until)
        throw new IllegalStateException(
          s"$topic-$partition: range [$from,$until) drained only to $pos — " +
          "log truncated or broker returned no data for a committed range")
      out.toSeq
    } finally conn.close()
  }

  private[streaming] def eof(): Nothing = throw new EOFException("kafka connection closed")

  /** Parse `host:port` (the first entry of a bootstrap list). */
  def parseBootstrap(bootstrap: String): (String, Int) = {
    val first = bootstrap.split(',').head.trim
    val i = first.lastIndexOf(':')
    require(i > 0, s"bootstrap must be host:port, got '$bootstrap'")
    (first.substring(0, i), first.substring(i + 1).toInt)
  }
}
