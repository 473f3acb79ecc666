package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType, StructType}

/** Write side of the `graft-kafka` table: `df.write.format("graft-kafka")`
  * and `ds.writeStream.format("graft-kafka")` both land records on the
  * broker via [[KafkaWire]]'s Produce v3 (RecordBatch v2, CRC32C, acks=all).
  *
  * Input schema contract (column names, mirroring the standard Kafka sink):
  *  - `value` BINARY or STRING — required
  *  - `key` BINARY or STRING — optional; drives partition assignment
  *  - `partition` INT — optional explicit partition override
  *  - `timestamp` LONG — optional record timestamp (epoch ms; 0 if absent)
  *
  * Partitioning matches Kafka's default partitioner: keyed records go to
  * `murmur2(keyBytes) & 0x7fffffff % numPartitions` (the exact published
  * algorithm, so records land where any standard client would put them);
  * unkeyed records are sticky per Spark task (task id mod partitions), the
  * modern sticky-partitioner behavior.
  *
  * Delivery is at-least-once: each Spark task flushes its buffered batches
  * before commit, a failed/retried task re-produces its rows
  * (transactional/idempotent produce needs broker-coordinated producer ids
  * — out of scope; compose with the idempotent keyed-merge sinks downstream
  * for effective exactly-once, same as every other source here). Buffers
  * are per-partition and bounded by `batchSize` records — executor memory
  * holds one in-flight batch per partition, never the task's whole input. */
object KafkaSink {

  /** Kafka's default-partitioner hash (murmur2, the published algorithm —
    * parity matters so OUR records land where standard clients expect). */
  def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = 0x9747b28c ^ data.length
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val tail = data.length & ~3
    (data.length % 4: @unchecked) match {
      case 3 =>
        h ^= (data(tail + 2) & 0xff) << 16
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff; h *= m
      case 2 =>
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff; h *= m
      case 1 =>
        h ^= data(tail) & 0xff; h *= m
      case 0 =>
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  def partitionFor(key: Array[Byte], numPartitions: Int, sticky: Int): Int =
    if (key == null) ((sticky % numPartitions) + numPartitions) % numPartitions
    else (murmur2(key) & 0x7fffffff) % numPartitions

  /** Column plan resolved once at write-build time: index + needs-encoding
    * for each contract column (-1 = absent). */
  final case class ColumnPlan(valueIdx: Int, valueIsString: Boolean,
                              keyIdx: Int, keyIsString: Boolean,
                              partitionIdx: Int, timestampIdx: Int)

  def planColumns(schema: StructType): ColumnPlan = {
    def find(name: String): Int = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    val v = find("value")
    require(v >= 0, s"graft-kafka sink requires a 'value' column, got ${schema.simpleString}")
    def stringish(i: Int): Boolean = schema.fields(i).dataType match {
      case StringType => true
      case BinaryType => false
      case other => throw new IllegalArgumentException(
        s"graft-kafka sink: column ${schema.fields(i).name} must be STRING or BINARY, got $other")
    }
    val k = find("key")
    val p = find("partition")
    if (p >= 0) require(schema.fields(p).dataType == IntegerType,
      "graft-kafka sink: 'partition' column must be INT")
    val ts = find("timestamp")
    if (ts >= 0) require(schema.fields(ts).dataType == LongType,
      "graft-kafka sink: 'timestamp' column must be BIGINT (epoch ms)")
    ColumnPlan(v, stringish(v), k, k >= 0 && stringish(k), p, ts)
  }
}

/** One write description, shared by batch and streaming epochs. */
final class KafkaWrite(opts: KafkaStreamOptions, schema: StructType) extends Write {
  require(opts.topics.size == 1,
    s"graft-kafka sink writes ONE topic, got ${opts.topics.mkString(",")}")
  private val topic = opts.topics.head
  private val plan = KafkaSink.planColumns(schema)

  /** Partition count discovered once on the driver, shipped to tasks. */
  private lazy val numPartitions: Int = {
    val conn = new KafkaWire.Conn(opts.host, opts.port, auth = opts.auth)
    try {
      val tm = conn.metadata(Seq(topic)).topics.find(_.name == topic)
        .getOrElse(throw new IllegalArgumentException(s"topic $topic not found"))
      require(tm.error == KafkaWire.ErrNone, s"topic $topic metadata error ${tm.error}")
      tm.partitions.size
    } finally conn.close()
  }

  private def factory = KafkaWriterFactory(opts.host, opts.port, topic,
    numPartitions, plan, opts.raw.collectFirst {
      case (k, v) if k.equalsIgnoreCase("batchSize") => v.trim.toInt
    }.getOrElse(500), opts.compressionCodec, opts.auth)

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = factory
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      factory
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

final class KafkaWriteBuilder(opts: KafkaStreamOptions, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new KafkaWrite(opts, info.schema())
}

final case class KafkaWriterFactory(host: String, port: Int, topic: String,
                                    numPartitions: Int, plan: KafkaSink.ColumnPlan,
                                    batchSize: Int, codec: Int,
                                    auth: Option[KafkaWire.SaslAuth])
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KafkaDataWriter(this, partitionId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new KafkaDataWriter(this, partitionId)
}

final case class KafkaCommitDone(records: Long) extends WriterCommitMessage

/** Task-side writer: per-Kafka-partition bounded buffers, flushed as one
  * Produce record-batch each time `batchSize` accumulates and at commit. */
final class KafkaDataWriter(f: KafkaWriterFactory, sparkPartitionId: Int)
    extends DataWriter[InternalRow] {
  private val buffers =
    Array.fill(f.numPartitions)(mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte], Long)])
  private var conn: KafkaWire.Conn = _
  private var written = 0L

  private def flush(p: Int): Unit = if (buffers(p).nonEmpty) {
    if (conn == null) conn = new KafkaWire.Conn(f.host, f.port, auth = f.auth)
    conn.produce(f.topic, p, KafkaWire.encodeBatch(0L, buffers(p).toSeq, f.codec))
    written += buffers(p).size
    buffers(p).clear()
  }

  override def write(row: InternalRow): Unit = {
    val plan = f.plan
    val value =
      if (row.isNullAt(plan.valueIdx)) null
      else if (plan.valueIsString) row.getUTF8String(plan.valueIdx).getBytes
      else row.getBinary(plan.valueIdx)
    val key =
      if (plan.keyIdx < 0 || row.isNullAt(plan.keyIdx)) null
      else if (plan.keyIsString) row.getUTF8String(plan.keyIdx).getBytes
      else row.getBinary(plan.keyIdx)
    val ts =
      if (plan.timestampIdx < 0 || row.isNullAt(plan.timestampIdx)) 0L
      else row.getLong(plan.timestampIdx)
    val p =
      if (plan.partitionIdx >= 0 && !row.isNullAt(plan.partitionIdx)) {
        val explicit = row.getInt(plan.partitionIdx)
        require(explicit >= 0 && explicit < f.numPartitions,
          s"explicit partition $explicit outside [0, ${f.numPartitions})")
        explicit
      } else KafkaSink.partitionFor(key, f.numPartitions, sparkPartitionId)
    buffers(p) += ((key, value, ts))
    if (buffers(p).size >= f.batchSize) flush(p)
  }

  override def commit(): WriterCommitMessage = {
    buffers.indices.foreach(flush)
    KafkaCommitDone(written)
  }
  override def abort(): Unit = ()
  override def close(): Unit = {
    if (conn != null) { conn.close(); conn = null }
  }
}
