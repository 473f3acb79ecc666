package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.IcebergRead

/** STREAMING tail of an Iceberg table's APPEND history:
  * `spark.readStream.format("graft-iceberg").option("path", table)` —
  * the Iceberg sibling of `graft-delta`, same doc-style contract
  * `(version LONG = snapshot id, change_type STRING = "insert",
  * row STRING json)`.
  *
  * Offsets are SNAPSHOT ORDINALS (the index in the metadata's snapshots
  * array — snapshot ids are arbitrary, their commit ORDER is the
  * cursor). Each micro-batch plans the files appended by the in-range
  * snapshots through [[IcebergRead.appendedBySnapshots]] — one input
  * partition per appended file, decoded on executors by the shared
  * [[ChangeFileReaderFactory]]. A delete anywhere in the tail fails the
  * stream loudly: an append-only incremental scan has no row-level
  * representation for it (Iceberg's own streaming read has the same
  * restriction).
  *
  * Options: `path` (required), `startingSnapshotId` (default: from the
  * first snapshot; `latest` starts after the current tip). */
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

/** Offset = highest PROCESSED snapshot ordinal (−1 = nothing yet). */
final case class IcebergStreamOffset(ordinal: Long) extends Offset {
  override def json(): String = ordinal.toString
}

class IcebergMicroBatchStream(opts: IcebergStreamOptions) extends MicroBatchStream {
  private def spark = org.apache.spark.sql.SparkSession.active

  override def initialOffset(): Offset = {
    val snaps = IcebergRead.snapshotManifests(spark, opts.path)
    val ord = opts.startingSnapshotId match {
      case None => -1L
      case Some(s) if s.equalsIgnoreCase("latest") => snaps.size - 1L
      case Some(s) =>
        val id = s.trim.toLong
        val i = snaps.indexWhere(_._1 == id)
        require(i >= 0, s"startingSnapshotId $id not in metadata")
        i.toLong
    }
    IcebergStreamOffset(ord)
  }

  override def latestOffset(): Offset = IcebergStreamOffset(
    IcebergRead.snapshotManifests(spark, opts.path).size - 1L)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IcebergStreamOffset].ordinal
    val e = end.asInstanceOf[IcebergStreamOffset].ordinal
    if (e <= s) return Array.empty
    val snaps = IcebergRead.snapshotManifests(spark, opts.path)
    val slice = snaps.slice(s.toInt + 1, e.toInt + 1)
    val props = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(kv => (kv.getKey, kv.getValue)).toArray
    IcebergRead.appendedBySnapshots(spark, slice).map { case (sid, path) =>
      // Iceberg data files carry their partition columns IN-FILE — no
      // value merge needed; the change class is always an insert
      ChangeFilePartition(path, Map.empty, Some("insert"), sid, props)
        : InputPartition
    }.toArray
  }

  override def commit(end: Offset): Unit = ()
  override def deserializeOffset(json: String): Offset =
    IcebergStreamOffset(json.trim.toLong)
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFileReaderFactory
  override def stop(): Unit = ()
}
