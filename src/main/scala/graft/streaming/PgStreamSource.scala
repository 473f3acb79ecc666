package graft.streaming

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Postgres logical-replication CDC as a Structured Streaming source:
  * `spark.readStream.format("graft-pg")` over [[PgWire]] — the Postgres
  * sibling of `graft-binlog`, emitting the SAME event schema
  * ([[CdcSchema.EventSchema]]: db, table, op, ts_ms, offset, payload) so
  * the demux/merge sinks compose unchanged.
  *
  * Offsets are WAL LSNs (plain longs — human-readable checkpoints). The
  * driver buffers at most ~one bounded pull beyond the uncommitted range
  * (same admission-control shape as [[BinlogMicroBatchStream]]); restart
  * re-pulls from the checkpointed LSN, which a logical slot retains until
  * our standby status updates confirm consumption. Single socket per pull
  * by protocol design (a slot has one consumer); parallelism lives in the
  * demux sink.
  *
  * Options: `host`, `port` (default 5432), `user`, `password`,
  * `database`, `slot` (default `graft_slot`), `publication` (default
  * `graft_pub`), `createSlot` (default true — CREATE_REPLICATION_SLOT on
  * first start, existing slot tolerated), `startLsn` (`X/Y` form, default
  * `0/0`), `maxEventsPerBatch` (default 10000). */
class PgStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pg"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcSchema.EventSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PgStreamTable(PgStreamOptions(properties.asScala.toMap))
}

final case class PgStreamOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  private def req(key: String): String = ci(key).getOrElse(
    throw new IllegalArgumentException(s"graft-pg requires option $key"))
  val host: String = req("host")
  val port: Int = ci("port").map(_.trim.toInt).getOrElse(5432)
  val user: String = req("user")
  val password: String = req("password")
  val database: String = req("database")
  val slot: String = ci("slot").getOrElse("graft_slot")
  val publication: String = ci("publication").getOrElse("graft_pub")
  val createSlot: Boolean = ci("createSlot").forall(_.trim.toBoolean)
  val startLsn: Long = ci("startLsn").map(PgWire.parseLsn).getOrElse(0L)
  val maxEventsPerBatch: Int =
    ci("maxEventsPerBatch").map(_.trim.toInt).getOrElse(10000)
}

class PgStreamTable(opts: PgStreamOptions) extends Table with SupportsRead {
  override def name(): String =
    s"graft-pg(${opts.host}:${opts.port}/${opts.database}@${opts.slot})"
  override def schema(): StructType = CdcSchema.EventSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = CdcSchema.EventSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PgMicroBatchStream(opts)
    }
}

final case class PgStreamOffset(lsn: Long) extends Offset {
  override def json(): String = lsn.toString
}

class PgMicroBatchStream(opts: PgStreamOptions)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Uncommitted events, ascending by LSN. Guarded by `this`. */
  private val buffer = mutable.ArrayBuffer.empty[PgWire.PgEvent]
  private var bufferBase: Long = opts.startLsn
  private var pulledThrough: Long = opts.startLsn
  private var lastEnd: Long = opts.startLsn
  /** Highest LSN Spark has durably committed (commit() ran). This — and
    * ONLY this — is what pulls confirm to the slot as flushed: confirming
    * the merely-consumed position would let Postgres trim WAL that a
    * checkpointed-but-uncommitted batch still needs, making a driver
    * crash between pull and checkpoint commit unrecoverable. */
  private var committedLsn: Long = opts.startLsn
  private var slotReady = false

  private def ensureSlot(): Unit = if (!slotReady) {
    if (opts.createSlot)
      PgWire.createSlot(opts.host, opts.port, opts.user, opts.password,
        opts.database, opts.slot)
    slotReady = true
  }

  private def pullFrom(lsn: Long): Seq[PgWire.PgEvent] = {
    ensureSlot()
    PgWire.pull(opts.host, opts.port, opts.user, opts.password, opts.database,
      opts.slot, opts.publication, lsn, maxEvents = opts.maxEventsPerBatch,
      confirmLsn = committedLsn)
      .filter(_.lsn > lsn) // slot replays whole transactions; trim
  }

  override def initialOffset(): Offset = PgStreamOffset(opts.startLsn)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(opts.maxEventsPerBatch)

  private def seekTo(lsn: Long): Unit =
    if (lsn > pulledThrough || lsn < bufferBase) {
      buffer.clear()
      bufferBase = lsn
      pulledThrough = lsn
      lastEnd = math.max(lastEnd, lsn)
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    seekTo(start.asInstanceOf[PgStreamOffset].lsn)
    val maxRows = limit match {
      case r: ReadMaxRows => math.min(r.maxRows(), opts.maxEventsPerBatch.toLong).toInt
      case _ => opts.maxEventsPerBatch
    }
    val fresh = pullFrom(pulledThrough)
    buffer ++= fresh
    fresh.lastOption.foreach(e => pulledThrough = math.max(pulledThrough, e.lsn))
    // An offset must never land mid-LSN-group: several events can share
    // one LSN (e.g. a multi-relation Truncate emits one event per
    // relation with identical dataStart), and planInputPartitions selects
    // (start, end] inclusively — so extend past take(maxRows) to the
    // whole tied group at the boundary. Excluding the group instead could
    // stall forever when one LSN carries more events than maxRows.
    val pendingAll = buffer.iterator.filter(_.lsn > lastEnd).toSeq
    val taken = pendingAll.take(maxRows)
    val end = taken.lastOption.map(_.lsn).getOrElse(lastEnd)
    lastEnd = math.max(lastEnd, end)
    PgStreamOffset(lastEnd)
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[PgStreamOffset].lsn
      val e = end.asInstanceOf[PgStreamOffset].lsn
      seekTo(s)
      while (pulledThrough < e) {
        val fresh = pullFrom(pulledThrough)
        if (fresh.isEmpty) throw new IllegalStateException(
          s"slot ${opts.slot} no longer replays events up to LSN $e " +
            s"(dry at $pulledThrough) — checkpointed range lost")
        buffer ++= fresh
        pulledThrough = math.max(pulledThrough, fresh.last.lsn)
      }
      lastEnd = math.max(lastEnd, e)
      val batch = buffer.filter(ev => ev.lsn > s && ev.lsn <= e).toArray
      Array(PgEventsPartition(batch))
    }

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PgStreamOffset].lsn
    val keep = buffer.filter(_.lsn > e)
    buffer.clear(); buffer ++= keep
    bufferBase = math.max(bufferBase, e)
    pulledThrough = math.max(pulledThrough, e)
    // now durable in Spark's checkpoint → eligible for slot confirmation
    // on the NEXT pull (never confirmed before this point)
    committedLsn = math.max(committedLsn, e)
  }

  override def deserializeOffset(json: String): Offset =
    PgStreamOffset(json.trim.toLong)

  override def createReaderFactory(): PartitionReaderFactory =
    new PgEventsReaderFactory

  override def stop(): Unit = ()
}

final case class PgEventsPartition(events: Array[PgWire.PgEvent])
    extends InputPartition

class PgEventsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val events = p.asInstanceOf[PgEventsPartition].events
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < events.length }
      override def get(): InternalRow = {
        val e = events(i)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(e.db), UTF8String.fromString(e.table),
          UTF8String.fromString(e.op), e.tsMs, e.lsn,
          UTF8String.fromString(e.payload)))
      }
      override def close(): Unit = ()
    }
  }
}
