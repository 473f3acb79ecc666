package graft.streaming

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}

import scala.collection.mutable

import graft.streaming.KafkaWire.{Reader, Writer}

/** In-process loopback Kafka broker for the kafka-source specs: speaks the
  * real binary protocol at the exact versions [[KafkaWire]] sends
  * (ApiVersions v0, Metadata v1, ListOffsets v1, Fetch v4, Produce v3)
  * and stores per-partition logs as the encoded v2 record batches that
  * producers ship — Produce patches only the 8-byte baseOffset field
  * (which sits outside the CRC, exactly why the format puts it there) and
  * Fetch returns stored batches verbatim from the one containing the
  * fetch offset, honoring `max_bytes` by truncation mid-batch the way a
  * real broker's zero-copy path does. */
final class KafkaLoopback(numPartitions: Int = 2,
                          credentials: Option[(String, String)] = None) {
  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  /** (topic, partition) -> appended batches (baseOffset, lastOffset, bytes). */
  private val logs = mutable.Map.empty[(String, Int), mutable.ArrayBuffer[(Long, Long, Array[Byte])]]
  private val topics = mutable.LinkedHashSet.empty[String]

  def port: Int = server.getLocalPort
  def bootstrap: String = s"127.0.0.1:$port"

  def createTopic(name: String): Unit = synchronized {
    topics += name
    (0 until numPartitions).foreach(p =>
      logs.getOrElseUpdate((name, p), mutable.ArrayBuffer.empty))
  }

  private def logEnd(tp: (String, Int)): Long = synchronized {
    logs.get(tp).flatMap(_.lastOption).map(_._2 + 1).getOrElse(0L)
  }
  private def logStart(tp: (String, Int)): Long = synchronized {
    logs.get(tp).flatMap(_.headOption).map(_._1).getOrElse(0L)
  }

  /** Test convenience: append via the SAME wire path a producer uses. */
  def append(topic: String, partition: Int,
             records: Seq[(Array[Byte], Array[Byte], Long)], codec: Int = 0): Long = {
    val conn = new KafkaWire.Conn("127.0.0.1", port,
      auth = credentials.map { case (u, p) => KafkaWire.SaslAuth(u, p) })
    try conn.produce(topic, partition, KafkaWire.encodeBatch(0L, records, codec))
    finally conn.close()
  }

  /** Inject a transaction-marker CONTROL batch (attributes bit 0x20)
    * directly into the log, the way a broker's transaction coordinator
    * does (markers never travel through Produce). The single record uses
    * the standard control-key layout: version i16 + type i16 (1=commit,
    * 0=abort). Consumes one offset. */
  def appendControlMarker(topic: String, partition: Int, commit: Boolean = true,
                          ts: Long = 0L): Unit = synchronized {
    val key = java.nio.ByteBuffer.allocate(4)
      .putShort(0).putShort(if (commit) 1 else 0).array()
    val batch = KafkaWire.encodeBatch(0L, Seq((key, Array.emptyByteArray, ts)),
      extraAttributes = 0x20)
    val base = logEnd((topic, partition))
    val assigned = batch.clone()
    var i = 0
    while (i < 8) { assigned(i) = (base >>> (8 * (7 - i))).toByte; i += 1 }
    logs((topic, partition)) += ((base, base, assigned))
  }

  /** Retention simulation: drop whole batches whose last offset < floor. */
  def truncateBelow(topic: String, partition: Int, floor: Long): Unit = synchronized {
    logs.get((topic, partition)).foreach { buf =>
      val keep = buf.filter(_._2 >= floor)
      buf.clear(); buf ++= keep
    }
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s), "kafka-loopback-conn")
        t.setDaemon(true); t.start()
      } catch { case _: Exception => /* closed */ }
    }
  }, "kafka-loopback-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  // ---- request dispatch ----

  private def serve(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    val in = new DataInputStream(socket.getInputStream)
    val out = new DataOutputStream(socket.getOutputStream)
    // per-connection SASL state: None = no auth required
    var authed = credentials.isEmpty
    var scramAuthMsg: Option[(String, Array[Byte])] = None // authMessage-so-far, salted
    try {
      while (running) {
        val size = in.readInt()
        val req = new Array[Byte](size)
        in.readFully(req)
        val r = new Reader(req)
        val apiKey = r.i16(); val apiVersion = r.i16()
        val correlation = r.i32(); r.str() // client id
        val body: Array[Byte] = (apiKey, apiVersion) match {
          case (KafkaWire.ApiSaslHandshake, 1) =>
            val mech = r.str()
            val w = new Writer
            if (mech == "PLAIN" || mech == "SCRAM-SHA-256") w.i16(0).i32(0)
            else { w.i16(33 /* UNSUPPORTED_SASL_MECHANISM */).i32(2)
                   .str("PLAIN").str("SCRAM-SHA-256") }
            w.toBytes
          case (KafkaWire.ApiSaslAuthenticate, 0) =>
            val bytes = r.bytes()
            val (code, msg, resp) = saslRound(bytes, scramAuthMsg,
              st => scramAuthMsg = st)
            if (code == 0 && resp.isEmpty && scramAuthMsg.isEmpty) authed = true
            if (code == 0 && scramAuthMsg.exists(_._1 == "DONE")) {
              authed = true; scramAuthMsg = None
            }
            val w = new Writer
            w.i16(code.toShort).str(msg).bytes(resp.orNull)
            w.toBytes
          case _ if !authed =>
            // a real broker kills unauthenticated connections using
            // data APIs; EOF on the client is the observable behavior
            return
          case (KafkaWire.ApiVersions, 0) => apiVersions()
          case (KafkaWire.ApiMetadata, 1) => metadata(r)
          case (KafkaWire.ApiListOffsets, 1) => listOffsets(r)
          case (KafkaWire.ApiFetch, 4) => fetch(r)
          case (KafkaWire.ApiProduce, 3) => produce(r)
          case (k, v) => throw new IllegalStateException(s"loopback: unsupported api $k v$v")
        }
        val w = new Writer
        w.i32(correlation).raw(body)
        val resp = w.toBytes
        out.writeInt(resp.length); out.write(resp); out.flush()
      }
    } catch {
      case _: EOFException | _: java.net.SocketException => // client closed
    } finally socket.close()
  }

  // ---- server-side SASL (PLAIN + SCRAM-SHA-256 verifier) ----
  private def sha256(b: Array[Byte]) =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
  private val scramSalt = Array.tabulate[Byte](16)(i => (i * 13 + 7).toByte)
  private def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String) = java.util.Base64.getDecoder.decode(s)

  /** One SaslAuthenticate round → (errorCode, errorMsg, responseBytes).
    * `state` carries SCRAM progress between the two rounds; the sentinel
    * ("DONE", _) marks a verified client proof. */
  private def saslRound(bytes: Array[Byte],
                        state: Option[(String, Array[Byte])],
                        setState: Option[(String, Array[Byte])] => Unit)
      : (Int, String, Option[Array[Byte]]) = {
    val (user, password) = credentials.get
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    state match {
      case None if s.startsWith("\u0000") => // PLAIN: authzid NUL user NUL pass
        val parts = s.split('\u0000')
        if (parts.length == 3 && parts(1) == user && parts(2) == password)
          (0, null, None)
        else (58 /* SASL_AUTHENTICATION_FAILED */, "Authentication failed", None)
      case None => // SCRAM client-first: gs2 "n,," + bare
        val bare = s.substring(s.indexOf("n=", 3).max(3))
        val cnonce = bare.split(",").find(_.startsWith("r=")).get.substring(2)
        val snonce = cnonce + "KAFKASRV"
        val iters = 4096
        val serverFirst = s"r=$snonce,s=${b64(scramSalt)},i=$iters"
        val salted = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
          .generateSecret(new javax.crypto.spec.PBEKeySpec(
            password.toCharArray, scramSalt, iters, 256)).getEncoded
        setState(Some((s"$bare,$serverFirst", salted)))
        (0, null, Some(serverFirst.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case Some((prefix, salted)) => // SCRAM client-final
        val withoutProof = s.substring(0, s.lastIndexOf(",p="))
        val proof = unb64(s.substring(s.lastIndexOf(",p=") + 3))
        val authMessage = s"$prefix,$withoutProof"
        val clientKey = hmac(salted, "Client Key")
        val clientSig = hmac(sha256(clientKey), authMessage)
        val expected = clientKey.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
        if (!java.util.Arrays.equals(proof, expected)) {
          setState(None)
          (58, "Authentication failed: bad SCRAM proof", None)
        } else {
          val serverSig = hmac(hmac(salted, "Server Key"), authMessage)
          setState(Some(("DONE", Array.emptyByteArray)))
          (0, null, Some(s"v=${b64(serverSig)}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
    }
  }

  private def apiVersions(): Array[Byte] = {
    val w = new Writer
    val apis = Seq((KafkaWire.ApiProduce, 3, 3), (KafkaWire.ApiFetch, 4, 4),
      (KafkaWire.ApiListOffsets, 1, 1), (KafkaWire.ApiMetadata, 1, 1),
      (KafkaWire.ApiVersions, 0, 0))
    w.i16(0).i32(apis.size)
    apis.foreach { case (k, lo, hi) => w.i16(k).i16(lo).i16(hi) }
    w.toBytes
  }

  private def metadata(r: Reader): Array[Byte] = synchronized {
    val n = r.i32()
    val asked = if (n < 0) topics.toSeq else (0 until n).map(_ => r.str())
    val names = if (asked.isEmpty) topics.toSeq else asked
    val w = new Writer
    w.i32(1).i32(0).str("127.0.0.1").i32(port).str(null) // one broker, node 0
    w.i32(0) // controller id
    w.i32(names.size)
    names.foreach { t =>
      if (!topics.contains(t)) {
        w.i16(KafkaWire.ErrUnknownTopicOrPartition).str(t).i8(0).i32(0)
      } else {
        w.i16(0).str(t).i8(0)
        w.i32(numPartitions)
        (0 until numPartitions).foreach { p =>
          w.i16(0).i32(p).i32(0)        // error, partition, leader
          w.i32(1).i32(0)               // replicas [0]
          w.i32(1).i32(0)               // isr [0]
        }
      }
    }
    w.toBytes
  }

  private def listOffsets(r: Reader): Array[Byte] = synchronized {
    r.i32() // replica id
    val nTopics = r.i32()
    val w = new Writer
    w.i32(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = r.str()
      val nParts = r.i32()
      w.str(topic).i32(nParts)
      (0 until nParts).foreach { _ =>
        val p = r.i32(); val ts = r.i64()
        if (!logs.contains((topic, p))) {
          w.i32(p).i16(KafkaWire.ErrUnknownTopicOrPartition).i64(-1L).i64(-1L)
        } else {
          val off = if (ts == KafkaWire.EarliestTimestamp) logStart((topic, p))
                    else logEnd((topic, p))
          w.i32(p).i16(0).i64(-1L).i64(off)
        }
      }
    }
    w.toBytes
  }

  private def fetch(r: Reader): Array[Byte] = synchronized {
    r.i32(); r.i32(); r.i32() // replica, max wait, min bytes
    val maxBytesTotal = r.i32()
    r.i8() // isolation
    val nTopics = r.i32()
    val w = new Writer
    w.i32(0) // throttle
    w.i32(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = r.str()
      val nParts = r.i32()
      w.str(topic).i32(nParts)
      (0 until nParts).foreach { _ =>
        val p = r.i32(); val fetchOffset = r.i64(); val maxBytes = r.i32()
        logs.get((topic, p)) match {
          case None =>
            w.i32(p).i16(KafkaWire.ErrUnknownTopicOrPartition)
              .i64(-1L).i64(-1L).i32(0).bytes(null)
          case Some(buf) =>
            val hw = logEnd((topic, p))
            if (fetchOffset < logStart((topic, p)) || fetchOffset > hw) {
              w.i32(p).i16(KafkaWire.ErrOffsetOutOfRange)
                .i64(hw).i64(hw).i32(0).bytes(null)
            } else {
              val cap = math.min(maxBytes, maxBytesTotal)
              val bos = new java.io.ByteArrayOutputStream()
              // serve whole stored batches from the one containing the
              // offset; the FIRST batch always goes out complete even if
              // over budget (the real broker's progress guarantee), later
              // ones may be truncated mid-batch at the byte budget
              buf.iterator.filter(_._2 >= fetchOffset).foreach { case (_, _, bytes) =>
                if (bos.size() == 0) bos.write(bytes)
                else if (bos.size() < cap) {
                  val room = cap - bos.size()
                  bos.write(bytes, 0, math.min(room, bytes.length))
                }
              }
              w.i32(p).i16(0).i64(hw).i64(hw).i32(0).bytes(bos.toByteArray)
            }
        }
      }
    }
    w.toBytes
  }

  private def produce(r: Reader): Array[Byte] = synchronized {
    r.str(); r.i16(); r.i32() // txn id, acks, timeout
    val nTopics = r.i32()
    val w = new Writer
    w.i32(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = r.str()
      val nParts = r.i32()
      w.str(topic).i32(nParts)
      (0 until nParts).foreach { _ =>
        val p = r.i32()
        val batch = r.bytes()
        if (!logs.contains((topic, p))) {
          w.i32(p).i16(KafkaWire.ErrUnknownTopicOrPartition).i64(-1L).i64(-1L)
        } else {
          // validate CRC + count records by decoding with the client codec
          val recs = try KafkaWire.decodeBatches(batch, Long.MinValue, Long.MaxValue)
            catch { case _: Exception => Nil }
          if (recs.isEmpty) {
            w.i32(p).i16(KafkaWire.ErrCorruptMessage).i64(-1L).i64(-1L)
          } else {
            val base = logEnd((topic, p))
            // patch baseOffset (bytes 0-7, big-endian) — outside the CRC
            val assigned = batch.clone()
            var i = 0
            while (i < 8) {
              assigned(i) = (base >>> (8 * (7 - i))).toByte; i += 1
            }
            logs((topic, p)) += ((base, base + recs.size - 1, assigned))
            w.i32(p).i16(0).i64(base).i64(-1L)
          }
        }
      }
    }
    w.toBytes
  }
}
