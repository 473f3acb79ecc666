package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S8 live-read path: a JDK-only MongoDB wire-protocol client — BSON (the
  * public BSON spec) + `OP_MSG` (opcode 2013) framing, driving the real
  * `find`/`getMore` cursor exchange the mongo-spark connector performs
  * (reference read surface: `boxer-mongodb/.../HoodieMongoBatch.scala:
  * 101-120`). The zero-egress sandbox has no connector jar and no mongod,
  * so the spec runs this against an in-process loopback TCP server
  * speaking the identical protocol; swapping the URI to a real cluster is
  * the production delta (plus SCRAM auth, which loopback skips —
  * credentials are parsed off the URI by [[MongoUri]] either way).
  *
  * Scale shape: one server-side cursor streamed in `batchSize` pages —
  * nothing collection-sized buffers anywhere. Real deployments
  * parallelize by running one cursor per id-range split (the connector's
  * splitVector seam); the filter document ships to the server, so
  * predicate pushdown happens THERE. */
object MongoWire {

  private def mapper = DocPushdown.jsonMapper

  // ------------------------------------------------------------ BSON
  /** Encode a JSON document as BSON (the JSON-expressible subset:
    * doc/array/string/bool/null/int32/int64/double). */
  def bsonEncode(doc: JsonNode): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream, doc: JsonNode): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val fields: Iterator[(String, JsonNode)] = doc match {
      case o: ObjectNode =>
        val it = o.fields()
        Iterator.continually(it).takeWhile(_.hasNext).map { i =>
          val e = i.next(); (e.getKey, e.getValue)
        }
      case a: ArrayNode => // BSON arrays are docs keyed "0", "1", ...
        (0 until a.size()).iterator.map(i => (i.toString, a.get(i)))
      case other => throw new IllegalArgumentException(s"not a BSON document: $other")
    }
    fields.foreach { case (name, v) => writeElement(body, name, v) }
    val total = 4 + body.size() + 1
    out.write(le4(total)); body.writeTo(out); out.write(0)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String, v: JsonNode): Unit = {
    def cstr(s: String): Unit = {
      out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0)
    }
    v match {
      case _ if v.isNull => out.write(0x0A); cstr(name)
      case _ if v.isBoolean => out.write(0x08); cstr(name); out.write(if (v.asBoolean) 1 else 0)
      case _ if v.isIntegralNumber =>
        val l = v.asLong
        if (l >= Int.MinValue && l <= Int.MaxValue) {
          out.write(0x10); cstr(name); out.write(le4(l.toInt))
        } else { out.write(0x12); cstr(name); out.write(le8(l)) }
      case _ if v.isNumber =>
        out.write(0x01); cstr(name); out.write(le8(java.lang.Double.doubleToLongBits(v.asDouble)))
      case _ if v.isTextual =>
        val bytes = v.asText.getBytes(StandardCharsets.UTF_8)
        out.write(0x02); cstr(name); out.write(le4(bytes.length + 1)); out.write(bytes); out.write(0)
      case _ if v.isArray => out.write(0x04); cstr(name); writeDoc(out, v)
      case _ if v.isObject => out.write(0x03); cstr(name); writeDoc(out, v)
      case other => throw new IllegalArgumentException(s"unsupported BSON value: $other")
    }
  }

  private def le4(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
  private def le8(l: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()

  /** Decode one BSON document at `off`; returns (node, bytesConsumed). */
  def bsonDecode(bytes: Array[Byte], off: Int): (ObjectNode, Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val len = buf.getInt(off)
    val node = mapper.createObjectNode()
    var p = off + 4
    while ((bytes(p) & 0xFF) != 0) {
      val tpe = bytes(p) & 0xFF
      p += 1
      val nameEnd = { var q = p; while (bytes(q) != 0) q += 1; q }
      val name = new String(bytes, p, nameEnd - p, StandardCharsets.UTF_8)
      p = nameEnd + 1
      tpe match {
        case 0x01 => node.put(name, java.lang.Double.longBitsToDouble(buf.getLong(p))); p += 8
        case 0x02 =>
          val sl = buf.getInt(p)
          node.put(name, new String(bytes, p + 4, sl - 1, StandardCharsets.UTF_8)); p += 4 + sl
        case 0x03 =>
          val (child, used) = bsonDecode(bytes, p); node.set(name, child); p += used
        case 0x04 =>
          val (child, used) = bsonDecode(bytes, p)
          val arr = node.putArray(name)
          child.fields().forEachRemaining(e => arr.add(e.getValue))
          p += used
        case 0x07 => // ObjectId -> 24-char hex string
          node.put(name, (0 until 12).map(i => f"${bytes(p + i) & 0xFF}%02x").mkString); p += 12
        case 0x08 => node.put(name, bytes(p) != 0); p += 1
        case 0x0A => node.putNull(name)
        case 0x10 => node.put(name, buf.getInt(p)); p += 4
        case 0x12 => node.put(name, buf.getLong(p)); p += 8
        case other => throw new IllegalArgumentException(
          f"unsupported BSON type 0x$other%02x for field '$name'")
      }
    }
    (node, len)
  }

  // ------------------------------------------------------------ OP_MSG
  /** One command round-trip over an established connection. */
  def command(in: DataInputStream, out: DataOutputStream,
              requestId: Int, cmd: ObjectNode): ObjectNode = {
    val body = bsonEncode(cmd)
    val total = 16 + 4 + 1 + body.length
    out.write(le4(total)); out.write(le4(requestId)); out.write(le4(0))
    out.write(le4(2013)) // OP_MSG
    out.write(le4(0))    // flagBits
    out.write(0)         // section kind 0: body
    out.write(body)
    out.flush()
    val header = new Array[Byte](16)
    in.readFully(header)
    val msgLen = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
    val rest = new Array[Byte](msgLen - 16)
    in.readFully(rest)
    require((rest(4) & 0xFF) == 0, "expected OP_MSG body section from server")
    val (reply, _) = bsonDecode(rest, 5) // 4 flag bytes + kind byte
    val ok = reply.get("ok")
    if (ok == null || ok.asDouble() != 1.0)
      throw new java.io.IOException(s"mongo command failed: $reply")
    reply
  }

  /** Stream every matching document of `database.collection` as a
    * DataFrame via the real find/getMore cursor protocol. */
  def scan(spark: SparkSession, uri: String, database: String, collection: String,
           filter: String = "{}", batchSize: Int = 100,
           schema: Option[StructType] = None): DataFrame =
    cursorRead(spark, uri, database, collection, batchSize, schema) { db =>
      val find = mapper.createObjectNode()
      find.put("find", collection)
      find.set[JsonNode]("filter", mapper.readTree(filter))
      find.put("batchSize", batchSize)
      find.put("$db", db)
      find
    }

  /** Run an aggregation PIPELINE on the server (the `aggregate` command +
    * the same cursor paging) — `$match`/`$project`/`$unwind`/`$group`/
    * `$lookup`/... execute where the data lives, exactly what the real
    * connector's pipeline option does. The Catalyst compile in
    * [[DocPushdown.mongoPipeline]] remains the ANALOG path's semantics
    * oracle; live reads ship the JSON verbatim. */
  def aggregate(spark: SparkSession, uri: String, database: String,
                collection: String, pipeline: String, batchSize: Int = 100,
                schema: Option[StructType] = None): DataFrame =
    cursorRead(spark, uri, database, collection, batchSize, schema) { db =>
      val agg = mapper.createObjectNode()
      agg.put("aggregate", collection)
      agg.set[JsonNode]("pipeline", mapper.readTree(pipeline))
      agg.set[JsonNode]("cursor",
        mapper.createObjectNode().put("batchSize", batchSize))
      agg.put("$db", db)
      agg
    }

  /** Shared cursor machinery: open with `firstCmd`, page with getMore. */
  private def cursorRead(spark: SparkSession, uri: String, database: String,
                         collection: String, batchSize: Int,
                         schema: Option[StructType])
                        (firstCmd: String => ObjectNode): DataFrame = {
    val parsed = MongoUri.parse(uri) // credential/host validation up front
    require(parsed.hosts.nonEmpty, s"no hosts in $uri")
    import spark.implicits._
    val host = parsed.hosts.head
    val db = if (database.nonEmpty) database else parsed.database.getOrElse(
      throw new IllegalArgumentException(s"no database in $uri and none passed"))
    val docs = spark.range(0, 1, 1, 1).mapPartitions { _ =>
      val (h, p) = host.split(":") match {
        case Array(a) => (a, 27017)
        case Array(a, b) => (a, b.toInt)
      }
      val sock = new java.net.Socket(h, p)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      // the task-completion listener owns the socket: the iterator below is
      // lazy and may be dropped mid-cursor (limit pushups, task kill)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => sock.close()))
      var reply = command(in, out, 1, firstCmd(db))
      var rid = 2
      var cursor = reply.get("cursor")
      var cursorId = cursor.get("id").asLong
      var batch = cursor.get("firstBatch").elements()
      // LAZY paging: getMore is issued only when the previous batch is
      // fully consumed, so one `batchSize` batch is resident per task —
      // a multi-GB collection never sits in executor heap at once
      new Iterator[String] {
        override def hasNext: Boolean = {
          while (!batch.hasNext && cursorId != 0L) {
            val more = mapper.createObjectNode()
            more.put("getMore", cursorId)
            more.put("collection", collection)
            more.put("batchSize", batchSize)
            more.put("$db", db)
            reply = command(in, out, rid, more); rid += 1
            cursor = reply.get("cursor")
            cursorId = cursor.get("id").asLong
            batch = cursor.get("nextBatch").elements()
          }
          val more = batch.hasNext
          if (!more) sock.close() // cursor drained (listener close is idempotent)
          more
        }
        override def next(): String = mapper.writeValueAsString(batch.next())
      }
    }
    val reader = schema.foldLeft(spark.read)((r, s) => r.schema(s))
    reader.json(docs)
  }
}
