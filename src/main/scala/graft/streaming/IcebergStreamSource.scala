package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.IcebergRead

/** STREAMING tail of an Iceberg table's CHANGE history:
  * `spark.readStream.format("graft-iceberg").option("path", table)` —
  * the Iceberg sibling of `graft-delta`, same doc-style contract
  * `(version LONG = snapshot id, change_type STRING, row STRING json)`.
  * Append snapshots emit `insert` rows; equality-delete commit shapes
  * (the CDC-target pattern [[graft.sink.IcebergWrite.upsert]] /
  * `deleteKeys` writes) emit `upsert` rows for the snapshot's data
  * files and `delete` rows (the key tuples) for its equality-delete
  * files — so a table MIRRORED INTO Iceberg can itself be tailed
  * onward (A→B→C replication chains through an Iceberg middle).
  *
  * Offsets are SNAPSHOT IDS (`{"snapshotId":N}`; null = nothing
  * processed), resolved to a position in the metadata's snapshots array
  * at PLAN time — ids are stable across snapshot expiration and
  * rollback, where an ordinal cursor would silently shift and re-read
  * or skip snapshots. A checkpointed id no longer in the metadata fails
  * the restart loudly (the history between it and the tip is gone —
  * exactly Iceberg's own streaming-source behavior). Each micro-batch
  * diffs the in-range snapshots against their predecessors' manifest
  * lists through [[IcebergRead.changedBySnapshots]] — one input
  * partition per changed file, decoded on executors by the shared
  * [[ChangeFileReaderFactory]]. Histories with NO row-level change
  * representation fail the stream loudly: a snapshot that DROPS a
  * manifest (rewrite/compaction), a status-2 entry, or a position
  * delete (addresses file offsets, not keys).
  *
  * ADMISSION CONTROL: `maxFilesPerTrigger` (default 1000, `none` =
  * unbounded) caps how many appended data files one micro-batch plans —
  * snapshots are admitted WHOLE, oldest-first, until the budget is
  * spent (always at least one). The admission walk reads only the
  * candidate snapshots' manifests (metadata; executor-parallel), so a
  * fresh tail of a long history drains in bounded batches.
  * `Trigger.AvailableNow` pins the tip snapshot at query start and
  * drains to exactly it, then finishes.
  *
  * Options: `path` (required), `startingSnapshotId` (default: from the
  * first snapshot; `latest` starts after the current tip),
  * `maxFilesPerTrigger`. */
class IcebergStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-iceberg"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DeltaStreamSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new IcebergStreamTable(IcebergStreamOptions(properties.asScala.toMap))
}

final case class IcebergStreamOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  val path: String = ci("path").getOrElse(
    throw new IllegalArgumentException("graft-iceberg requires option path"))
  /** None = everything; Some(id) = snapshots AFTER id; Latest = tip. */
  val startingSnapshotId: Option[String] = ci("startingSnapshotId")
  /** start from the earliest snapshot whose `timestamp-ms` is AT OR
    * AFTER this epoch-millis value; mutually exclusive with an
    * explicit `startingSnapshotId`. */
  val startingTimestamp: Option[Long] = ci("startingTimestamp").map(_.trim.toLong)
  require(startingTimestamp.isEmpty || startingSnapshotId.isEmpty,
    "startingTimestamp and startingSnapshotId are mutually exclusive")
  /** appended-file budget per micro-batch; None = unbounded. */
  val maxFilesPerTrigger: Option[Int] =
    LakeTailOptions.maxFilesPerTrigger(ci("maxFilesPerTrigger"))
}

class IcebergStreamTable(opts: IcebergStreamOptions) extends Table with SupportsRead {
  override def name(): String = s"graft-iceberg(${opts.path})"
  override def schema(): StructType = DeltaStreamSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = DeltaStreamSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new IcebergMicroBatchStream(opts)
    }
}

/** Offset = id of the highest PROCESSED snapshot (None = nothing yet).
  * Ids are the durable cursor — positions are looked up at plan time. */
final case class IcebergStreamOffset(snapshotId: Option[Long]) extends Offset {
  override def json(): String =
    s"""{"snapshotId":${snapshotId.map(_.toString).getOrElse("null")}}"""
}

object IcebergStreamOffset {
  def parse(json: String): IcebergStreamOffset = {
    val t = json.trim
    if (t.nonEmpty && (t.head.isDigit || t.head == '-'))
      throw new IllegalStateException(
        s"Iceberg stream checkpoint offset '$t' is a snapshot ORDINAL " +
          "written by an older graft version — ordinals shift under " +
          "snapshot expiration, so it cannot be resumed safely; restart " +
          "the stream with a fresh checkpoint (startingSnapshotId " +
          "selects the resume point)")
    val node = graft.sources.DocPushdown.jsonMapper.readTree(t)
    val id = Option(node.get("snapshotId")).filterNot(_.isNull).map(_.asLong())
    IcebergStreamOffset(id)
  }
}

class IcebergMicroBatchStream(opts: IcebergStreamOptions)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def spark = org.apache.spark.sql.SparkSession.active

  /** Trigger.AvailableNow pins the tip snapshot id at query start
    * (outer None = not pinned; inner None = table had no snapshots). */
  @volatile private var availableNowTip: Option[Option[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTip = Some(
      IcebergRead.snapshotManifests(spark, opts.path).lastOption.map(_.id))

  override def initialOffset(): Offset = {
    val snaps = IcebergRead.snapshotManifests(spark, opts.path)
    val id = opts.startingTimestamp match {
      case Some(ts) =>
        // earliest snapshot at-or-after ts; all-older history = tip
        import scala.jdk.CollectionConverters._
        val stamped = Option(IcebergRead.readMetadata(spark, opts.path)
            .get("snapshots")).toSeq
          .flatMap(_.elements().asScala)
          .map(s => (s.get("snapshot-id").asLong(),
            Option(s.get("timestamp-ms")).map(_.asLong()).getOrElse(0L)))
        val idx = stamped.indexWhere(_._2 >= ts)
        if (idx < 0) snaps.lastOption.map(_.id) // start after the tip
        else if (idx == 0) None // everything qualifies
        else Some(stamped(idx - 1)._1) // predecessor = last processed
      case None => opts.startingSnapshotId match {
        case None => None
        case Some(s) if s.equalsIgnoreCase("latest") => snaps.lastOption.map(_.id)
        case Some(s) =>
          val id = s.trim.toLong
          require(snaps.exists(_.id == id),
            s"startingSnapshotId $id not in metadata")
          Some(id)
      }
    }
    IcebergStreamOffset(id)
  }

  override def getDefaultReadLimit: ReadLimit =
    opts.maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  /** Admit whole snapshots oldest-first until the changed-file budget
    * is spent (always at least one). Counting goes through
    * [[IcebergRead.changedBySnapshots]], so the change-representability
    * gates (manifest drops, position deletes) fire here — at admission —
    * just as loudly as they would at planning. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val snaps = IcebergRead.snapshotManifests(spark, opts.path)
    val tipId = availableNowTip.getOrElse(snaps.lastOption.map(_.id))
    val sIdx = ordinalOf(snaps,
      start.asInstanceOf[IcebergStreamOffset].snapshotId, "checkpointed start")
    val tipIdx = ordinalOf(snaps, tipId, "tip")
    if (tipIdx <= sIdx)
      return start.asInstanceOf[IcebergStreamOffset] // nothing new
    LakeTailOptions.budgetOf(limit) match {
      case None => IcebergStreamOffset(tipId)
      case Some(budget) =>
        var i = sIdx
        var used = 0
        var stop = false
        while (!stop && i < tipIdx) {
          val prev = if (i >= 0) Some(snaps(i)) else None
          val c = IcebergRead
            .changedBySnapshots(spark, prev, Seq(snaps(i + 1))).size
          if (i > sIdx && used + c > budget) stop = true
          else {
            i += 1
            used += c
            if (used >= budget) stop = true
          }
        }
        IcebergStreamOffset(if (i < 0) None else Some(snaps(i).id))
    }
  }

  override def reportLatestOffset(): Offset = IcebergStreamOffset(
    availableNowTip.getOrElse(
      IcebergRead.snapshotManifests(spark, opts.path).lastOption.map(_.id)))

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  /** Position of `id` in the current snapshots array (−1 = None = from
    * the beginning); an id the metadata no longer holds fails LOUDLY —
    * resuming past an expired snapshot would silently skip or replay. */
  private def ordinalOf(snaps: Seq[IcebergRead.SnapshotRef],
                        id: Option[Long], role: String): Int = id match {
    case None => -1
    case Some(wanted) =>
      val i = snaps.indexWhere(_.id == wanted)
      if (i < 0) throw new IllegalStateException(
        s"$role snapshot $wanted is no longer in the table metadata " +
          "(expired or rolled back) — the stream cannot resume without " +
          "skipping or replaying history")
      i
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val snaps = IcebergRead.snapshotManifests(spark, opts.path)
    val s = ordinalOf(snaps, start.asInstanceOf[IcebergStreamOffset].snapshotId,
      "checkpointed start")
    val e = ordinalOf(snaps, end.asInstanceOf[IcebergStreamOffset].snapshotId,
      "batch end")
    if (e <= s) return Array.empty
    val slice = snaps.slice(s + 1, e + 1)
    val props = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(kv => (kv.getKey, kv.getValue)).toArray
    // schema evolution: emit every field under its CURRENT schema name,
    // resolved through the footer field ids (files written before a
    // rename carry the old spelling; id-less fixture files fall back to
    // their file names)
    val idRenames = IcebergRead.fieldIdNames(spark, opts.path)
    val prev = if (s >= 0) Some(snaps(s)) else None
    IcebergRead.changedBySnapshots(spark, prev, slice).map { c =>
      // Iceberg data files carry their partition columns IN-FILE — no
      // value merge needed; the change class comes from the changelog
      // diff: append data = insert, overwrite/delete data = upsert,
      // equality-delete files = delete (rows are the key tuples)
      ChangeFilePartition(c.path, Map.empty, Some(c.changeClass),
        c.snapshotId, props, idRenames = idRenames): InputPartition
    }.toArray
  }

  override def commit(end: Offset): Unit = ()
  override def deserializeOffset(json: String): Offset =
    IcebergStreamOffset.parse(json)
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFileReaderFactory
  override def stop(): Unit = ()
}
