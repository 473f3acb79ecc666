package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.sources.{DeltaRead, IcebergRead}

/** ZERO-COPY table-format conversion (the idea behind Delta UniForm /
  * Apache XTable): the parquet data files stay byte-identical in place;
  * only a new METADATA chain is written next to them, after which the
  * same data is readable through the other format's reader. At 100 TB
  * this is the only conversion that makes sense — rewriting data to
  * switch formats is a non-starter.
  *
  *  - [[deltaToIceberg]]: commits the Delta snapshot's live files into
  *    an Iceberg metadata chain at the same location. Gated LOUDLY on:
  *    partitioned tables (Delta data files do not CONTAIN their
  *    partition columns, while Iceberg readers here expect
  *    self-contained files), deletion vectors (deleted rows would
  *    resurrect), and column mapping (physical names would leak).
  *  - [[icebergToDelta]]: commits the Iceberg snapshot's data files as
  *    a fresh Delta log at the same location. Gated on delete files
  *    (position/equality deletes have no Delta file-level equivalent
  *    short of materializing) and on an existing `_delta_log`.
  *
  * Scale notes: both directions touch only metadata — the file LIST and
  * one `getFileStatus` per file on the Iceberg→Delta side (Delta adds
  * need true sizes); no data bytes move.
  */
object LakeConvert {

  /** Spark type → Iceberg primitive type name (schema for the Iceberg
    * metadata). Anything unrepresentable fails loudly by name. */
  private def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case ShortType | ByteType => "int"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no Iceberg mapping for Spark type $other")
  }

  /** PARTITIONED tables convert too: each live file's Delta
    * `partitionValues` land in the Iceberg manifest's `partition`
    * tuple (identity transform — Delta partitioning IS identity), so
    * the Iceberg reader serves the partition columns from the
    * manifests exactly like the directory-name layout they came from.
    * Long/int/string partition columns only (the tuple's value
    * vocabulary); anything else fails loudly by name. */
  def deltaToIceberg(spark: SparkSession, table: String,
                     snapshotId: Long = 1L): Unit = {
    val state = DeltaRead.tableState(spark, table,
      DeltaRead.latestVersion(spark, table))
    require(state.live.forall(_.dv.isEmpty),
      "deltaToIceberg: the table carries deletion vectors — converting " +
        "without materializing them would resurrect deleted rows")
    require(!state.configuration.get("delta.columnMapping.mode")
        .exists(_ != "none"),
      "deltaToIceberg: column-mapped Delta tables are not convertible " +
        "(data files carry physical column names)")
    val schema = state.schemaString
      .map(DataType.fromJson(_).asInstanceOf[StructType])
      .getOrElse(throw new IllegalArgumentException(
        "Delta log has no schemaString to derive the Iceberg schema from"))
    val schemaFields = schema.fields.zipWithIndex.map { case (f, i) =>
      (i + 1, f.name, icebergType(f.dataType))
    }.toSeq
    def typedPartitionValue(name: String, raw: String): Any = {
      val f = schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"deltaToIceberg: partition column $name missing from the schema"))
      if (raw == null) null
      else f.dataType match {
        case LongType => raw.toLong
        case IntegerType | ShortType | ByteType => raw.toInt
        case StringType => raw
        case other => throw new IllegalArgumentException(
          s"deltaToIceberg: partition column $name of type $other has no " +
            "Iceberg partition-tuple representation (long/int/string)")
      }
    }
    val entries = state.live.map { f =>
      IcebergWrite.FileEntry(
        DeltaRead.resolvePath(table, f.path).toString, 0, snapshotId,
        partition = state.partitionCols.map(c =>
          c -> typedPartitionValue(c, f.partitionValues.get(c).orNull)),
        sizeInBytes = math.max(1L, f.size))
    }
    IcebergWrite.commitEntries(spark, table, entries,
      schemaFields = schemaFields, snapshotId = snapshotId)
  }

  def icebergToDelta(spark: SparkSession, table: String): Unit = {
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(logDir),
      s"icebergToDelta: $table already has a _delta_log")
    val meta = IcebergRead.readMetadata(spark, table)
    val current = Option(meta.get("current-snapshot-id")).map(_.asLong())
      .getOrElse(throw new IllegalArgumentException(
        "Iceberg metadata has no current-snapshot-id"))
    import scala.jdk.CollectionConverters._
    val manifestList = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .find(_.get("snapshot-id").asLong() == current)
      .map(_.get("manifest-list").asText())
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $current not present in metadata"))
    val (files, posDeletes, eqGroups) =
      IcebergRead.snapshotFiles(spark, manifestList, maxFiles = 1000000)
    require(posDeletes.isEmpty && eqGroups.isEmpty,
      "icebergToDelta: the snapshot carries v2 delete files — they have " +
        "no Delta file-level equivalent without materializing the merge")
    require(files.nonEmpty, "icebergToDelta: empty snapshot")
    val schemaJson = spark.read.parquet(files.map(_.path): _*).schema.json
    val metaAction =
      s"""{"metaData":{"id":"graft-conv-${math.abs(table.hashCode)}",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.sources.DocPushdown.jsonMapper
          .writeValueAsString(schemaJson)},""" +
        """"partitionColumns":[],"configuration":{}}}"""
    val adds = files.map { t =>
      val p = new Path(t.path)
      val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p)
      DeltaWrite.addAction(Option(p.toUri.getPath).getOrElse(t.path),
        Map.empty, st.getLen, st.getModificationTime)
    }
    DeltaWrite.writeVersion(spark, table, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaAction) ++ adds, operation = "CONVERT")
  }
}
