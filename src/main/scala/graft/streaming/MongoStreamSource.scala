package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{DocPushdown, MongoUri, MongoWire}

/** Incremental collection tailing over the real MongoDB wire protocol:
  * `spark.readStream.format("graft-mongo")` — the standard
  * "pull new rows by a monotonic cursor column" ingestion pattern (an
  * auto-increment id or insert timestamp), built on [[MongoWire]]'s
  * find/getMore cursors with the range predicate shipped SERVER-side.
  *
  * Contract: `cursorField` must be numeric, monotonically increasing for
  * new documents, and the collection append-only with respect to it — a
  * document landing later with a smaller cursor value is missed, exactly
  * like any watermark-less incremental puller (the same contract the
  * JDBC-incremental and file-arrival patterns carry).
  *
  * Output schema is the Kafka-source-style raw contract: (`cursor` LONG,
  * `doc` STRING json) — downstream parses with `from_json`, so the source
  * stays schema-free and composes with the demux/merge sinks.
  *
  * Scale/exactly-once shape: the DRIVER holds NO buffer — offsets are
  * server-side cursor values; `latestOffset` asks the server for
  * max(cursorField) (an aggregate returning ONE row) and each micro-batch
  * plans the half-open range `(start, end]`, which the EXECUTOR reads as
  * one server-filtered cursor. Restart replays the checkpointed range by
  * re-querying — no source state outlives the checkpoint. A batch is
  * re-read identically on retry because the range filter is by value, not
  * by position (requires the append-only contract above).
  *
  * Options: `uri` (mongodb://[user:pass@]host[:port]/db — credentials run
  * SCRAM-SHA-256), `collection` (required), `database` (defaults to the
  * URI database), `cursorField` (default `seq`), `startAfter` (first-start
  * exclusive lower bound, default Long.MinValue), `batchSize` (cursor page
  * size, default 100). */
class MongoStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mongo"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MongoStreamSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new MongoStreamTable(MongoStreamOptions(properties.asScala.toMap))
}

object MongoStreamSource {
  val Schema: StructType = StructType(Seq(
    StructField("cursor", LongType, nullable = false),
    StructField("doc", StringType, nullable = false)))
}

final case class MongoStreamOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  val uri: String = ci("uri").getOrElse(
    throw new IllegalArgumentException("graft-mongo requires option uri"))
  val parsed: MongoUri = MongoUri.parse(uri)
  val collection: String = ci("collection").getOrElse(
    throw new IllegalArgumentException("graft-mongo requires option collection"))
  val database: String = ci("database").orElse(parsed.database).getOrElse(
    throw new IllegalArgumentException("no database in uri and none passed"))
  val cursorField: String = ci("cursorField").getOrElse("seq")
  val startAfter: Long = ci("startAfter").map(_.trim.toLong).getOrElse(Long.MinValue)
  val batchSize: Int = ci("batchSize").map(_.trim.toInt).getOrElse(100)
  val host: String = parsed.hosts.headOption.getOrElse(
    throw new IllegalArgumentException(s"no hosts in $uri"))
  val user: Option[String] = parsed.user
  val password: String = parsed.password.getOrElse("")
  val authSource: String =
    parsed.options.getOrElse("authSource", parsed.database.getOrElse("admin"))
}

class MongoStreamTable(opts: MongoStreamOptions) extends Table with SupportsRead {
  override def name(): String =
    s"graft-mongo(${opts.database}.${opts.collection})"
  override def schema(): StructType = MongoStreamSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = MongoStreamSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MongoMicroBatchStream(opts)
    }
}

final case class MongoStreamOffset(cursor: Long) extends Offset {
  override def json(): String = cursor.toString
}

/** Stateless driver: offsets ARE server-side cursor values. */
class MongoMicroBatchStream(opts: MongoStreamOptions) extends MicroBatchStream {

  private def mapper = DocPushdown.jsonMapper

  override def initialOffset(): Offset = MongoStreamOffset(opts.startAfter)

  /** max(cursorField) on the server — one aggregate row over the wire. */
  override def latestOffset(): Offset = {
    val agg = mapper.createObjectNode()
    agg.put("aggregate", opts.collection)
    val pipe = agg.putArray("pipeline")
    pipe.addObject().putObject("$sort").put(opts.cursorField, -1)
    pipe.addObject().put("$limit", 1)
    pipe.addObject().putObject("$project").put(opts.cursorField, 1)
    agg.set[com.fasterxml.jackson.databind.JsonNode]("cursor",
      mapper.createObjectNode().put("batchSize", 1))
    agg.put("$db", opts.database)
    val (it, close) = MongoWire.openCursor(opts.host, opts.user, opts.password,
      opts.authSource, opts.database, opts.collection, 1, agg)
    try {
      val max = if (it.hasNext)
        Option(mapper.readTree(it.next()).get(opts.cursorField)).map(_.asLong)
      else None
      MongoStreamOffset(max.getOrElse(opts.startAfter))
    } finally close()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MongoStreamOffset].cursor
    val e = end.asInstanceOf[MongoStreamOffset].cursor
    if (e <= s) Array.empty
    else Array(MongoRangePartition(opts, s, e))
  }

  override def commit(end: Offset): Unit = () // nothing buffered anywhere

  override def deserializeOffset(json: String): Offset =
    MongoStreamOffset(json.trim.toLong)

  override def createReaderFactory(): PartitionReaderFactory =
    new MongoRangeReaderFactory

  override def stop(): Unit = ()
}

final case class MongoRangePartition(opts: MongoStreamOptions,
                                     startExclusive: Long, endInclusive: Long)
    extends InputPartition

class MongoRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val MongoRangePartition(opts, s, e) = p.asInstanceOf[MongoRangePartition]
    val mapper = DocPushdown.jsonMapper
    // find with the range shipped server-side: {f: {$gt: s, $lte: e}}
    val find = mapper.createObjectNode()
    find.put("find", opts.collection)
    val range = find.putObject("filter").putObject(opts.cursorField)
    range.put("$gt", s); range.put("$lte", e)
    find.put("batchSize", opts.batchSize)
    find.put("$db", opts.database)
    val (docs, closeCursor) = MongoWire.openCursor(opts.host, opts.user,
      opts.password, opts.authSource, opts.database, opts.collection,
      opts.batchSize, find)
    new PartitionReader[InternalRow] {
      private var current: String = _
      override def next(): Boolean = {
        val more = docs.hasNext
        if (more) current = docs.next()
        more
      }
      override def get(): InternalRow = {
        val cur = Option(mapper.readTree(current).get(opts.cursorField))
          .map(_.asLong).getOrElse(throw new IllegalStateException(
            s"document without numeric ${opts.cursorField}: $current"))
        new GenericInternalRow(Array[Any](cur, UTF8String.fromString(current)))
      }
      override def close(): Unit = closeCursor()
    }
  }
}
