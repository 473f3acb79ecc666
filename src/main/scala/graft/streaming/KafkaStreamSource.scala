package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Kafka micro-batch source over [[KafkaWire]]'s from-scratch protocol
  * client: `spark.readStream.format("graft-kafka")`.
  *
  * Output schema matches the standard Kafka-source contract (key BINARY,
  * value BINARY, topic, partition, offset, timestamp) so downstream
  * parses with `from_json(cast(value as string), …)` and composes with
  * the demux/merge sinks unchanged.
  *
  * Scale shape — this is the part that matters at 100 TB:
  *  - The DRIVER never touches record bytes. Offsets are broker log
  *    positions per topic-partition; `latestOffset` is one ListOffsets
  *    round-trip per partition (a few bytes each).
  *  - Each Kafka partition maps to ONE Spark input partition whose reader
  *    opens its own socket and drains exactly `[start, end)` — so
  *    parallelism is the topic's partition count, fanned across
  *    executors with no shared state and no shuffle.
  *  - Restart/retry replays identically: the range is by log position,
  *    and `readRange` throws (not skips) if the broker no longer retains
  *    a checkpointed range.
  *  - `maxOffsetsPerTrigger` backpressure distributes the row budget
  *    over partitions proportionally to their backlog, mirroring the
  *    built-in Kafka source's admission control.
  *
  * Options: `bootstrap` (host:port, required), `topic` (required, one
  * topic; comma-split for several), `startingOffsets` =
  * `earliest` (default) | `latest`, `maxOffsetsPerTrigger` (total rows
  * per micro-batch), `maxBytesPerFetch` (socket fetch size, default 4 MiB).
  */
class KafkaStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaStreamSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new KafkaStreamTable(KafkaStreamOptions(properties.asScala.toMap))
}

object KafkaStreamSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))
}

final case class KafkaStreamOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  val bootstrap: String = ci("bootstrap").getOrElse(
    throw new IllegalArgumentException("graft-kafka requires option bootstrap (host:port)"))
  val (host, port) = KafkaWire.parseBootstrap(bootstrap)
  val topics: Seq[String] = ci("topic").map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    .filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException("graft-kafka requires option topic"))
  val startingOffsets: String = ci("startingOffsets").getOrElse("earliest").toLowerCase match {
    case s @ ("earliest" | "latest") => s
    case other => throw new IllegalArgumentException(
      s"startingOffsets must be earliest|latest, got '$other'")
  }
  val maxOffsetsPerTrigger: Option[Long] = ci("maxOffsetsPerTrigger").map(_.trim.toLong)
  val maxBytesPerFetch: Int = ci("maxBytesPerFetch").map(_.trim.toInt).getOrElse(4 << 20)
  /** SASL credentials (PLAIN or SCRAM-SHA-256); absent = unauthenticated. */
  val auth: Option[KafkaWire.SaslAuth] = ci("user").map { u =>
    KafkaWire.SaslAuth(u,
      ci("password").getOrElse(throw new IllegalArgumentException(
        "graft-kafka: user given without password")),
      ci("mechanism").getOrElse("SCRAM-SHA-256"))
  }
  /** Sink-side batch compression (`compression.type` in Kafka terms). */
  val compressionCodec: Int = ci("compression").map(_.trim.toLowerCase).getOrElse("none") match {
    case "none" | "uncompressed" => KafkaWire.CodecNone
    case "gzip" => KafkaWire.CodecGzip
    case "snappy" => KafkaWire.CodecSnappy
    case "lz4" => KafkaWire.CodecLz4
    case "zstd" => KafkaWire.CodecZstd
    case other => throw new IllegalArgumentException(
      s"compression must be none|gzip|snappy|lz4|zstd, got '$other'")
  }
}

class KafkaStreamTable(opts: KafkaStreamOptions) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-kafka(${opts.topics.mkString(",")})"
  override def schema(): StructType = KafkaStreamSource.Schema
  // ACCEPT_ANY_SCHEMA: the WRITE schema is the incoming DataFrame's
  // (value/key/partition/timestamp contract, validated in KafkaSink
  // .planColumns), not the fixed read schema above
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new KafkaWriteBuilder(opts, info)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = KafkaStreamSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KafkaMicroBatchStream(opts)
      /** Bounded backfill: `spark.read.format("graft-kafka")` scans the
        * log's current `[earliest, latest)` per partition (or the
        * `startingOffsets`/`endingOffsets` bounds) — the standard
        * reprocess-history path, one Spark partition per Kafka
        * partition, same executor range readers as streaming. */
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        new org.apache.spark.sql.connector.read.Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            val conn = new KafkaWire.Conn(opts.host, opts.port, auth = opts.auth)
            try {
              val meta = conn.metadata(opts.topics)
              val found = meta.topics.map(t => t.name -> t).toMap
              opts.topics.flatMap { t =>
                val tm = found.getOrElse(t, throw new IllegalArgumentException(
                  s"topic $t missing from broker metadata"))
                require(tm.error == KafkaWire.ErrNone, s"topic $t metadata error ${tm.error}")
                tm.partitions.map(_.partition).sorted.flatMap { p =>
                  val from =
                    if (opts.startingOffsets == "latest")
                      conn.listOffset(t, p, KafkaWire.LatestTimestamp)
                    else conn.listOffset(t, p, KafkaWire.EarliestTimestamp)
                  val until = conn.listOffset(t, p, KafkaWire.LatestTimestamp)
                  if (until > from)
                    Some(KafkaRangePartition(opts.host, opts.port, t, p,
                      from, until, opts.maxBytesPerFetch, opts.auth))
                  else None
                }
              }.toArray
            } finally conn.close()
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new KafkaRangeReaderFactory
        }
    }
}

/** Offset = map of "topic-partition" → next offset to read, serialized as
  * ONE line of sorted `topic:partition:offset` entries joined with `,`.
  *
  * The single-line shape is a hard requirement, not a style choice:
  * Spark's `OffsetSeqLog` stores ONE LINE PER SOURCE in the checkpoint
  * offset log, so a multi-line offset (one line per partition) corrupts
  * the log for any topic with >1 partition — restart then mis-parses or
  * fails. Kafka topic names are restricted to `[a-zA-Z0-9._-]`, so both
  * `,` and `:` are safe delimiters and no JSON parser is needed. */
final case class KafkaSourceOffset(positions: Map[(String, Int), Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy { case ((t, p), _) => (t, p) }
      .map { case ((t, p), o) => s"$t:$p:$o" }.mkString(",")
}

object KafkaSourceOffset {
  /** Accepts the current `,`-joined single line; also tolerates the
    * legacy newline-joined form so pre-existing checkpoints still load. */
  def parse(s: String): KafkaSourceOffset = KafkaSourceOffset(
    s.split(Array(',', '\n')).iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val j = line.lastIndexOf(':')
      val i = line.lastIndexOf(':', j - 1)
      require(i > 0, s"bad kafka offset line '$line'")
      ((line.substring(0, i), line.substring(i + 1, j).toInt),
        line.substring(j + 1).toLong)
    }.toMap)
}

/** Stateless driver: every position lives in the broker's log. */
class KafkaMicroBatchStream(opts: KafkaStreamOptions)
    extends MicroBatchStream with SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow pins per-partition log-end offsets at query
    * start: the backlog drains to exactly these positions in
    * maxOffsetsPerTrigger-bounded batches, then the query finishes —
    * bounded Kafka backfill, the same shape as the lake tails. */
  @volatile private var availableNowTip: Option[Map[(String, Int), Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTip = Some(withConn { conn =>
      partitions.map { case (t, p) =>
        (t, p) -> conn.listOffset(t, p, KafkaWire.LatestTimestamp)
      }.toMap
    })

  override def reportLatestOffset(): Offset = KafkaSourceOffset(
    availableNowTip.getOrElse(withConn { conn =>
      partitions.map { case (t, p) =>
        (t, p) -> conn.listOffset(t, p, KafkaWire.LatestTimestamp)
      }.toMap
    }))

  private def withConn[A](body: KafkaWire.Conn => A): A = {
    val conn = new KafkaWire.Conn(opts.host, opts.port, auth = opts.auth)
    try body(conn) finally conn.close()
  }

  /** topic → partition ids, discovered once per stream instance. */
  private lazy val partitions: Seq[(String, Int)] = withConn { conn =>
    val meta = conn.metadata(opts.topics)
    val found = meta.topics.map(t => t.name -> t).toMap
    opts.topics.flatMap { t =>
      val tm = found.getOrElse(t, throw new IllegalArgumentException(
        s"topic $t missing from broker metadata"))
      require(tm.error == KafkaWire.ErrNone, s"topic $t metadata error ${tm.error}")
      require(tm.partitions.nonEmpty, s"topic $t has no partitions")
      tm.partitions.map(p => (t, p.partition))
    }
  }

  override def initialOffset(): Offset = withConn { conn =>
    val ts = if (opts.startingOffsets == "latest") KafkaWire.LatestTimestamp
             else KafkaWire.EarliestTimestamp
    KafkaSourceOffset(partitions.map { case (t, p) =>
      (t, p) -> conn.listOffset(t, p, ts)
    }.toMap)
  }

  override def getDefaultReadLimit: ReadLimit =
    opts.maxOffsetsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  /** Log-end offsets (or the AvailableNow-pinned tip), capped
    * `maxOffsetsPerTrigger` rows past `start`, budget split over
    * partitions proportionally to backlog. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KafkaSourceOffset].positions
    val ends = availableNowTip.getOrElse(withConn { conn =>
      partitions.map { case (t, p) =>
        (t, p) -> conn.listOffset(t, p, KafkaWire.LatestTimestamp)
      }.toMap
    })
    val capped = limit match {
      case r: ReadMaxRows =>
        val lag = ends.map { case (tp, e) => tp -> math.max(0L, e - from.getOrElse(tp, e)) }
        val total = lag.values.sum
        if (total <= r.maxRows()) ends
        else {
          // proportional split; floor then give the remainder to the
          // largest backlogs so the budget is used exactly
          val scaled = lag.toSeq.map { case (tp, l) =>
            (tp, l, l * r.maxRows() / math.max(1L, total))
          }
          val spare = r.maxRows() - scaled.map(_._3).sum
          val bumped = scaled.sortBy(-_._2).zipWithIndex.map { case ((tp, _, share), i) =>
            tp -> (share + (if (i < spare) 1L else 0L))
          }.toMap
          ends.map { case (tp, e) =>
            tp -> math.min(e, from.getOrElse(tp, e) + bumped.getOrElse(tp, 0L))
          }
        }
      case _ => ends
    }
    KafkaSourceOffset(capped)
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaSourceOffset].positions
    val e = end.asInstanceOf[KafkaSourceOffset].positions
    e.toSeq.sortBy { case ((t, p), _) => (t, p) }.flatMap { case ((t, p), until) =>
      val from = s.getOrElse((t, p), until)
      if (until > from)
        Some(KafkaRangePartition(opts.host, opts.port, t, p, from, until,
          opts.maxBytesPerFetch, opts.auth))
      else None
    }.toArray
  }

  override def commit(end: Offset): Unit = () // nothing buffered anywhere

  override def deserializeOffset(json: String): Offset = KafkaSourceOffset.parse(json)

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaRangeReaderFactory

  override def stop(): Unit = ()
}

final case class KafkaRangePartition(host: String, port: Int, topic: String,
                                     partition: Int, from: Long, until: Long,
                                     maxBytes: Int,
                                     auth: Option[KafkaWire.SaslAuth])
    extends InputPartition

class KafkaRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KafkaRangePartition]
    new PartitionReader[InternalRow] {
      private val records = KafkaWire.readRange(kp.host, kp.port, kp.topic,
        kp.partition, kp.from, kp.until, kp.maxBytes, kp.auth).iterator
      private var current: KafkaWire.Record = _
      override def next(): Boolean = {
        val more = records.hasNext
        if (more) current = records.next()
        more
      }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        current.key, current.value, UTF8String.fromString(kp.topic),
        kp.partition, current.offset, current.timestamp))
      override def close(): Unit = ()
    }
  }
}
