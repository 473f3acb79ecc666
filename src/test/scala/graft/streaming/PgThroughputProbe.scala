package graft.streaming

/** One-shot pgoutput drain-rate measurement against a loopback walsender
  * extended with a bulk fixture: `Test/runMain
  * graft.streaming.PgThroughputProbe [nRows]` prints decoded rows/s for
  * one replication socket (the binlog probe's sibling). Measurement
  * tool, not a spec. */
object PgThroughputProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val m = new PgBulkLoopback("probe-pw", nRows = n)
    try {
      PgWire.createSlot("127.0.0.1", m.port, "repl", "probe-pw", "shop", "s1")
      val t0 = System.nanoTime()
      val events = PgWire.pull("127.0.0.1", m.port, "repl", "probe-pw",
        "shop", "s1", "pub1", 0L, maxEvents = n + 10)
      val dt = (System.nanoTime() - t0) / 1e9
      require(events.size == n, s"drained ${events.size} of $n")
      println(f"[pg-probe] n=$n drain ${dt}%.1fs (${n / dt / 1000}%.0fk rows/s)")
    } finally m.stop()
  }
}

/** Minimal loopback walsender whose fixture is ONE big transaction of
  * `nRows` inserts (PgLoopback's fixture is fixed and small; the probe
  * needs volume). Cleartext auth keeps the probe focused on the
  * streaming path. */
final class PgBulkLoopback(password: String, nRows: Int) {
  import java.io.{DataInputStream, DataOutputStream}
  import java.net.{InetAddress, ServerSocket, Socket}
  import java.nio.charset.StandardCharsets.UTF_8
  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  def port: Int = server.getLocalPort
  def stop(): Unit = { running = false; server.close() }

  private def cstr(s: String) = s.getBytes(UTF_8) :+ 0.toByte
  private def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long) = be32((v >>> 32).toInt) ++ be32(v.toInt)
  private def send(out: DataOutputStream, tpe: Char, body: Array[Byte]): Unit = {
    out.writeByte(tpe); out.writeInt(body.length + 4); out.write(body); out.flush()
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => try serve(s) catch { case _: Exception => })
        t.setDaemon(true); t.start()
      } catch { case _: Exception => }
    }
  })
  acceptor.setDaemon(true); acceptor.start()

  private def serve(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    val in = new DataInputStream(socket.getInputStream)
    val out = new DataOutputStream(socket.getOutputStream)
    try {
      val len = in.readInt()
      val body = new Array[Byte](len - 4); in.readFully(body)
      // cleartext auth keeps the probe focused on the streaming path
      send(out, 'R', be32(3))
      val (tp, _) = { val t = in.readByte().toChar
        val l = in.readInt(); val b = new Array[Byte](l - 4); in.readFully(b); (t, b) }
      require(tp == 'p')
      send(out, 'R', be32(0))
      send(out, 'Z', Array('I'.toByte))
      while (running) {
        val t = in.readByte().toChar
        val l = in.readInt(); val qb = new Array[Byte](l - 4); in.readFully(qb)
        if (t == 'X') return
        if (t == 'Q') {
          val sql = new String(qb.dropRight(1), UTF_8).trim.toUpperCase
          if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
            send(out, 'T', be16(2) ++
              (cstr("slot_name") ++ be32(0) ++ be16(0) ++ be32(25) ++ be16(-1) ++ be32(-1) ++ be16(0)) ++
              (cstr("consistent_point") ++ be32(0) ++ be16(0) ++ be32(25) ++ be16(-1) ++ be32(-1) ++ be16(0)))
            val lsn = "0/0".getBytes(UTF_8)
            send(out, 'D', be16(2) ++ be32(2) ++ "s1".getBytes(UTF_8) ++
              be32(lsn.length) ++ lsn)
            send(out, 'C', cstr("CREATE_REPLICATION_SLOT"))
            send(out, 'Z', Array('I'.toByte))
          } else if (sql.startsWith("START_REPLICATION")) {
            send(out, 'W', Array(0.toByte) ++ be16(0))
            streamBulk(out)
            // absorb status updates until close
            try { while (running) { in.readByte(); val l2 = in.readInt()
              in.readFully(new Array[Byte](l2 - 4)) } } catch { case _: Exception => }
            return
          } else {
            send(out, 'C', cstr("OK")); send(out, 'Z', Array('I'.toByte))
          }
        }
      }
    } finally socket.close()
  }

  private def streamBulk(out: DataOutputStream): Unit = {
    def xlog(ds: Long, msg: Array[Byte]): Unit =
      send(out, 'd', Array('w'.toByte) ++ be64(ds) ++ be64(nRows + 10L) ++ be64(0L) ++ msg)
    xlog(0L, Array('B'.toByte) ++ be64(nRows + 10L) ++ be64(1000000L) ++ be32(1))
    val relB = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      b += 'R'.toByte; b ++= be32(1); b ++= cstr("public"); b ++= cstr("docs")
      b += 'd'.toByte; b ++= be16(2)
      Seq("id", "body").foreach { c => b += 1.toByte; b ++= cstr(c); b ++= be32(25); b ++= be32(-1) }
      b.toArray
    }
    xlog(0L, relB)
    val payload = "x" * 100
    var i = 0
    while (i < nRows) {
      val id = i.toString.getBytes(UTF_8)
      val v = payload.getBytes(UTF_8)
      val b = new java.io.ByteArrayOutputStream(140)
      b.write('I'); b.write(be32(1)); b.write('N'); b.write(be16(2))
      b.write('t'); b.write(be32(id.length)); b.write(id)
      b.write('t'); b.write(be32(v.length)); b.write(v)
      xlog(i + 1L, b.toByteArray)
      i += 1
    }
    xlog(nRows + 10L, Array('C'.toByte, 0.toByte) ++ be64(nRows + 10L) ++
      be64(nRows + 10L) ++ be64(1000000L))
    send(out, 'd', Array('k'.toByte) ++ be64(nRows + 10L) ++ be64(0L) ++ Array(0.toByte))
  }
}
