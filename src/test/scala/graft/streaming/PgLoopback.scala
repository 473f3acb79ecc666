package graft.streaming

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** In-process loopback "postgres" walsender for the PgWire specs: speaks
  * protocol v3 startup with `replication=database`, server-side
  * SCRAM-SHA-256 (full RFC 7677 verifier — a wrong password fails the
  * proof check exactly like a real server), the walsender simple-query
  * grammar (IDENTIFY_SYSTEM / CREATE_REPLICATION_SLOT), and CopyBoth
  * streaming of a fixed pgoutput fixture:
  *
  *   tx1 @ commit 0/200: INSERT public.orders(id=1, item='widget'),
  *                       INSERT public.users(uid=7, name='ada', bio='b1')
  *   tx2 @ commit 0/400: UPDATE orders id=1 item→'gadget' (K old image),
  *                       DELETE users uid=7 (O old image, bio TOAST 'u')
  *   tx3 @ commit 0/500: TRUNCATE orders
  *
  * Resume semantics match a real slot: a START_REPLICATION at LSN X
  * streams every transaction whose commit LSN is > X, whole (Begin and
  * per-connection Relation messages re-sent), then a keepalive carrying
  * the log-end so the client can detect idle. Standby status updates are
  * parsed and the confirmed LSN recorded (visible to the spec). */
final class PgLoopback(password: String, dbName: String = "shop",
                       authMethod: String = "scram") {
  require(authMethod == "scram" || authMethod == "md5" || authMethod == "cleartext",
    s"authMethod must be scram|md5|cleartext, got $authMethod")
  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  /** Slot's confirmed_flush_lsn: advanced from the FLUSH field of standby
    * status updates, exactly like a real walsender. Streaming always
    * resumes at `max(requested start, confirmedLsn)` — the Postgres
    * behavior that makes premature confirmation a data-loss bug. */
  @volatile var confirmedLsn: Long = 0L
  /** Last WRITE position reported by the client (visibility only). */
  @volatile var writtenLsn: Long = 0L
  @volatile private var slots = Set.empty[String]

  def port: Int = server.getLocalPort
  def stop(): Unit = { running = false; server.close() }

  // ---- fixture ----
  /** When set, a 4th transaction (commit 0/600) TRUNCATEs BOTH relations
    * in one statement — pgoutput then emits one Truncate event per
    * relation with the SAME dataStart LSN (550), the shape that tests
    * batch boundaries never landing mid-LSN-group. */
  @volatile var includeMultiTruncate: Boolean = false
  def LogEnd: Long = if (includeMultiTruncate) 600L else 500L

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => try serve(s) catch { case _: Exception => }, "pg-loopback-conn")
        t.setDaemon(true); t.start()
      } catch { case _: Exception => }
    }
  }, "pg-loopback-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  // ---- low-level ----
  private def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte
  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32((v >>> 32).toInt) ++ be32(v.toInt)

  private def send(out: DataOutputStream, tpe: Char, body: Array[Byte]): Unit = {
    out.writeByte(tpe); out.writeInt(body.length + 4); out.write(body); out.flush()
  }
  private def errorResp(out: DataOutputStream, sqlstate: String, msg: String): Unit =
    send(out, 'E', Array('S'.toByte) ++ cstr("ERROR") ++ Array('C'.toByte) ++
      cstr(sqlstate) ++ Array('M'.toByte) ++ cstr(msg) :+ 0.toByte)
  private def ready(out: DataOutputStream): Unit = send(out, 'Z', Array('I'.toByte))
  private def dataRow(out: DataOutputStream, cols: Seq[String]): Unit = {
    val b = ArrayBuffer.empty[Byte]
    b ++= be16(cols.size)
    cols.foreach { c =>
      if (c == null) b ++= be32(-1)
      else { val bs = c.getBytes(UTF_8); b ++= be32(bs.length); b ++= bs }
    }
    send(out, 'D', b.toArray)
  }
  private def rowDescription(out: DataOutputStream, names: Seq[String]): Unit = {
    val b = ArrayBuffer.empty[Byte]
    b ++= be16(names.size)
    names.foreach { n =>
      b ++= cstr(n); b ++= be32(0); b ++= be16(0); b ++= be32(25) // text oid
      b ++= be16(-1); b ++= be32(-1); b ++= be16(0)
    }
    send(out, 'T', b.toArray)
  }
  private def commandComplete(out: DataOutputStream, tag: String): Unit =
    send(out, 'C', cstr(tag))

  // ---- crypto (server side of SCRAM-SHA-256) ----
  private def sha256(b: Array[Byte]) =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(UTF_8))
  }
  private val salt: Array[Byte] = Array.tabulate[Byte](16)(i => (i * 11 + 5).toByte)
  private val iters = 4096
  private def saltedPassword: Array[Byte] =
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, iters, 256)).getEncoded
  private def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String) = java.util.Base64.getDecoder.decode(s)

  // ---- connection ----
  private def serve(socket: Socket): Unit = {
    val in = new DataInputStream(socket.getInputStream)
    val out = new DataOutputStream(socket.getOutputStream)
    try {
      // startup (no type byte)
      val len = in.readInt()
      val body = new Array[Byte](len - 4); in.readFully(body)
      val proto = java.nio.ByteBuffer.wrap(body, 0, 4).getInt
      require(proto == 196608, s"unexpected protocol $proto")
      // auth exchange per the configured method
      if (authMethod == "md5") {
        // user name from the startup parameters (key/value cstring pairs)
        val params = new String(body, 4, body.length - 4, UTF_8)
          .split('\u0000').filter(_.nonEmpty)
        val user = params.sliding(2, 2).collectFirst {
          case Array("user", u) => u }.getOrElse("")
        val md5salt = Array[Byte](9, 8, 7, 6)
        send(out, 'R', be32(5) ++ md5salt)
        val (tp, pb) = recvMsg(in)
        require(tp == 'p', s"expected PasswordMessage, got $tp")
        def md5hex(b: Array[Byte]) =
          java.security.MessageDigest.getInstance("MD5").digest(b)
            .map("%02x".format(_)).mkString
        val inner = md5hex((password + user).getBytes(UTF_8))
        val want = "md5" + md5hex(inner.getBytes(UTF_8) ++ md5salt)
        if (new String(pb.dropRight(1), UTF_8) != want) {
          errorResp(out, "28P01", "password authentication failed")
          return
        }
      } else if (authMethod == "cleartext") {
        send(out, 'R', be32(3))
        val (tp, pb) = recvMsg(in)
        require(tp == 'p', s"expected PasswordMessage, got $tp")
        if (new String(pb.dropRight(1), UTF_8) != password) {
          errorResp(out, "28P01", "password authentication failed")
          return
        }
      } else {
      // SCRAM handshake
      send(out, 'R', be32(10) ++ cstr("SCRAM-SHA-256") :+ 0.toByte)
      val (t1, b1) = recvMsg(in)
      require(t1 == 'p', s"expected SASLInitialResponse, got $t1")
      // mechanism cstring + i32 + client-first
      var p = 0; while (b1(p) != 0) p += 1
      val respLen = java.nio.ByteBuffer.wrap(b1, p + 1, 4).getInt
      val clientFirst = new String(b1, p + 5, respLen, UTF_8)
      val bare = clientFirst.substring(clientFirst.indexOf("n=")) // after gs2 "n,,"
      val cnonce = bare.split(",").find(_.startsWith("r=")).get.substring(2)
      val snonce = cnonce + "SRVNONCE"
      val serverFirst = s"r=$snonce,s=${b64(salt)},i=$iters"
      send(out, 'R', be32(11) ++ serverFirst.getBytes(UTF_8))
      val (t2, b2) = recvMsg(in)
      require(t2 == 'p', s"expected SASLResponse, got $t2")
      val clientFinal = new String(b2, UTF_8)
      val attrs = clientFinal.split(",").map { kv =>
        val i = kv.indexOf('='); kv.substring(0, i) -> kv.substring(i + 1)
      }.toMap
      val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      val authMessage = s"$bare,$serverFirst,$withoutProof"
      val salted = saltedPassword
      val clientKey = hmac(salted, "Client Key")
      val clientSig = hmac(sha256(clientKey), authMessage)
      val expected = clientKey.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
      if (!java.util.Arrays.equals(unb64(attrs("p")), expected)) {
        errorResp(out, "28P01", "password authentication failed")
        return
      }
      val serverSig = hmac(hmac(salted, "Server Key"), authMessage)
      send(out, 'R', be32(12) ++ s"v=${b64(serverSig)}".getBytes(UTF_8))
      }
      send(out, 'R', be32(0))
      send(out, 'S', cstr("server_version") ++ cstr("16.0-loopback"))
      ready(out)
      // query loop
      while (running) {
        val (tpe, qb) = recvMsg(in)
        tpe match {
          case 'Q' => handleQuery(new String(qb.dropRight(1), UTF_8).trim, in, out)
          case 'X' => return // terminate
          case _ =>
        }
      }
    } catch {
      case _: EOFException | _: java.net.SocketException => // client closed
    } finally socket.close()
  }

  private def recvMsg(in: DataInputStream): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt()
    val body = new Array[Byte](len - 4); in.readFully(body)
    (tpe, body)
  }

  private def fmtLsn(l: Long): String = PgWire.formatLsn(l)

  private def handleQuery(sql: String, in: DataInputStream, out: DataOutputStream): Unit = {
    val upper = sql.toUpperCase
    if (upper.startsWith("IDENTIFY_SYSTEM")) {
      rowDescription(out, Seq("systemid", "timeline", "xlogpos", "dbname"))
      dataRow(out, Seq("7000000000000000001", "1", fmtLsn(LogEnd), dbName))
      commandComplete(out, "IDENTIFY_SYSTEM")
      ready(out)
    } else if (upper.startsWith("CREATE_REPLICATION_SLOT")) {
      val slot = sql.split("\"")(1)
      if (slots.contains(slot)) {
        errorResp(out, "42710", s"replication slot \"$slot\" already exists")
        ready(out)
      } else {
        synchronized { slots += slot }
        rowDescription(out, Seq("slot_name", "consistent_point", "snapshot_name", "output_plugin"))
        dataRow(out, Seq(slot, fmtLsn(0L), null, "pgoutput"))
        commandComplete(out, "CREATE_REPLICATION_SLOT")
        ready(out)
      }
    } else if (upper.startsWith("START_REPLICATION")) {
      val slot = sql.split("\"")(1)
      if (!slots.contains(slot)) {
        errorResp(out, "42704", s"replication slot \"$slot\" does not exist")
        ready(out)
        return
      }
      val lsnStr = sql.split("\\s+").find(_.matches("[0-9A-Fa-f]+/[0-9A-Fa-f]+")).get
      val start = PgWire.parseLsn(lsnStr)
      send(out, 'W', Array(0.toByte) ++ be16(0)) // CopyBothResponse
      streamFixture(start, in, out)
    } else {
      errorResp(out, "42601", s"unrecognized walsender command: $sql")
      ready(out)
    }
  }

  // ---- pgoutput encoding ----
  private def xlog(out: DataOutputStream, dataStart: Long, msg: Array[Byte]): Unit =
    send(out, 'd', Array('w'.toByte) ++ be64(dataStart) ++ be64(LogEnd) ++ be64(0L) ++ msg)
  private def begin(finalLsn: Long, tsMicros: Long, xid: Int): Array[Byte] =
    Array('B'.toByte) ++ be64(finalLsn) ++ be64(tsMicros) ++ be32(xid)
  private def commitMsg(commitLsn: Long, endLsn: Long, tsMicros: Long): Array[Byte] =
    Array('C'.toByte, 0.toByte) ++ be64(commitLsn) ++ be64(endLsn) ++ be64(tsMicros)
  private def relationFull(id: Int, ns: String, name: String, cols: Seq[String]): Array[Byte] = {
    val b = ArrayBuffer.empty[Byte]
    b += 'R'.toByte; b ++= be32(id); b ++= cstr(ns); b ++= cstr(name)
    b += 'd'.toByte // replica identity default
    b ++= be16(cols.size)
    cols.foreach { c => b += 1.toByte; b ++= cstr(c); b ++= be32(25); b ++= be32(-1) }
    b.toArray
  }
  private def tuple(vals: Seq[Option[Option[String]]]): Array[Byte] = {
    // None = unchanged toast 'u'; Some(None) = null; Some(Some(v)) = text
    val b = ArrayBuffer.empty[Byte]
    b ++= be16(vals.size)
    vals.foreach {
      case None => b += 'u'.toByte
      case Some(None) => b += 'n'.toByte
      case Some(Some(v)) =>
        b += 't'.toByte
        val bs = v.getBytes(UTF_8); b ++= be32(bs.length); b ++= bs
    }
    b.toArray
  }
  private def insert(relId: Int, vals: Seq[Option[Option[String]]]): Array[Byte] =
    Array('I'.toByte) ++ be32(relId) ++ ('N'.toByte +: tuple(vals))
  private def update(relId: Int, oldKind: Char, oldVals: Seq[Option[Option[String]]],
                     newVals: Seq[Option[Option[String]]]): Array[Byte] =
    Array('U'.toByte) ++ be32(relId) ++ (oldKind.toByte +: tuple(oldVals)) ++
      ('N'.toByte +: tuple(newVals))
  private def delete(relId: Int, kind: Char, vals: Seq[Option[Option[String]]]): Array[Byte] =
    Array('D'.toByte) ++ be32(relId) ++ (kind.toByte +: tuple(vals))
  private def truncate(relIds: Seq[Int]): Array[Byte] =
    Array('T'.toByte) ++ be32(relIds.size) ++ Array(0.toByte) ++
      relIds.flatMap(be32)

  private val OrdersRel = 16384
  private val UsersRel = 16385
  private def v(s: String): Option[Option[String]] = Some(Some(s))

  /** Transactions: (commitLsn, frames(dataStart → pgoutput bytes)). */
  private def transactions: Seq[(Long, Seq[(Long, Array[Byte])])] = Seq(
    (200L, Seq(
      0L -> begin(200L, 1000000L, 701),
      0L -> relationFull(OrdersRel, "public", "orders", Seq("id", "item")),
      110L -> insert(OrdersRel, Seq(v("1"), v("widget"))),
      0L -> relationFull(UsersRel, "public", "users", Seq("uid", "name", "bio")),
      120L -> insert(UsersRel, Seq(v("7"), v("ada"), v("b1"))),
      200L -> commitMsg(200L, 200L, 1000000L))),
    (400L, Seq(
      0L -> begin(400L, 2000000L, 702),
      0L -> relationFull(OrdersRel, "public", "orders", Seq("id", "item")),
      310L -> update(OrdersRel, 'K', Seq(v("1"), Some(None)), Seq(v("1"), v("gadget"))),
      0L -> relationFull(UsersRel, "public", "users", Seq("uid", "name", "bio")),
      320L -> delete(UsersRel, 'O', Seq(v("7"), v("ada"), None)),
      400L -> commitMsg(400L, 400L, 2000000L))),
    (500L, Seq(
      0L -> begin(500L, 3000000L, 703),
      0L -> relationFull(OrdersRel, "public", "orders", Seq("id", "item")),
      450L -> truncate(Seq(OrdersRel)),
      500L -> commitMsg(500L, 500L, 3000000L)))) ++
    (if (includeMultiTruncate) Seq(
      (600L, Seq(
        0L -> begin(600L, 4000000L, 704),
        0L -> relationFull(OrdersRel, "public", "orders", Seq("id", "item")),
        0L -> relationFull(UsersRel, "public", "users", Seq("uid", "name", "bio")),
        // ONE Truncate message naming both relations → decoder emits two
        // events sharing dataStart 550
        550L -> truncate(Seq(OrdersRel, UsersRel)),
        600L -> commitMsg(600L, 600L, 4000000L))))
     else Seq.empty)

  private def streamFixture(start: Long, in: DataInputStream, out: DataOutputStream): Unit = {
    // real slots ignore a requested start older than confirmed_flush_lsn
    val effectiveStart = math.max(start, confirmedLsn)
    transactions.filter(_._1 > effectiveStart).foreach { case (_, frames) =>
      frames.foreach { case (ds, msg) => xlog(out, ds, msg) }
    }
    // caught up: keepalive with walEnd = log end, no reply required
    send(out, 'd', Array('k'.toByte) ++ be64(LogEnd) ++ be64(0L) ++ Array(0.toByte))
    // then absorb status updates until the client leaves
    try {
      while (running) {
        val (tpe, body) = recvMsg(in)
        if (tpe == 'd' && body.nonEmpty && body(0) == 'r') {
          // bytes 1-8 = write, 9-16 = flush; the slot advances on FLUSH
          writtenLsn = java.nio.ByteBuffer.wrap(body, 1, 8).getLong
          confirmedLsn = math.max(confirmedLsn,
            java.nio.ByteBuffer.wrap(body, 9, 8).getLong)
        } else if (tpe == 'c' || tpe == 'X') return
      }
    } catch { case _: EOFException | _: java.net.SocketException => }
  }
}
