package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{GroupType, PrimitiveType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{DeltaRead, DocPushdown}

/** STREAMING tail of a Delta table's CHANGE DATA FEED:
  * `spark.readStream.format("graft-delta").option("path", table)` — the
  * lakehouse analog of the binlog/walsender CDC sources, emitting the
  * same doc-style contract as `graft-mongo`/`graft-es`:
  * `(version LONG, change_type STRING, row STRING json)`.
  *
  * Offsets ARE log versions (the natural CDC cursor of the format):
  * `latestOffset` is one `_delta_log` listing, each micro-batch plans
  * `(start, end]` through [[DeltaRead.changeFiles]] — one input
  * partition per CHANGED FILE, so a backlog of versions drains in
  * parallel and a restart replays exactly the uncommitted versions
  * (at-least-once; compose with the idempotent keyed sinks for
  * exactly-once, as the CDC demux does). All the CDF gates apply:
  * vacuumed versions and DV-without-cdc commits fail loudly rather than
  * fabricating changes.
  *
  * Partition readers decode parquet on EXECUTORS via parquet-hadoop's
  * example Group API (Spark's own classpath) — no session, no driver
  * round-trip; rows surface as JSON objects with the action's partition
  * values merged in as strings. A cdc file's own `_change_type` column
  * rides in the emitted `change_type` field (and is dropped from the
  * row json).
  *
  * Planning cost: each batch replays the log's METADATA to its end
  * version (checkpoint-accelerated — the newest checkpoint ≤ V short-
  * circuits history, so a long-lived tail pays O(versions since last
  * checkpoint) JSON reads per batch, not O(table history)).
  *
  * ADMISSION CONTROL: `maxFilesPerTrigger` (default 1000, `none` =
  * unbounded — the same knob and default as Delta's own source) caps
  * how many changed files one micro-batch plans. Versions are admitted
  * WHOLE, oldest-first, until the budget is spent (always at least one,
  * so a single commit bigger than the cap still makes progress) — a
  * fresh tail of a 10⁶-file table drains its history in bounded batches
  * instead of planning everything in micro-batch 0. The admission walk
  * reads only the candidate versions' commit JSONs (one read per
  * ADMITTED version, no replay). `Trigger.AvailableNow` composes: the
  * tip is pinned at query start and the backlog drains to exactly that
  * point in capped batches, then the query finishes — the production
  * backfill shape.
  *
  * Options: `path` (required), `startingVersion` (default 0; `latest`
  * starts after the current tip), `maxFilesPerTrigger`. */
class DeltaStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-delta"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DeltaStreamSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new DeltaStreamTable(DeltaStreamOptions(properties.asScala.toMap))
}

object DeltaStreamSource {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("change_type", StringType, nullable = false),
    StructField("row", StringType, nullable = false)))
}

final case class DeltaStreamOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  val path: String = ci("path").getOrElse(
    throw new IllegalArgumentException("graft-delta requires option path"))
  /** first version to EMIT (offset starts one before it). */
  val startingVersion: Option[Long] = ci("startingVersion") match {
    case Some(s) if s.equalsIgnoreCase("latest") => None // resolved at start
    case Some(s) => Some(s.trim.toLong)
    case None => Some(0L)
  }
  /** start from the earliest commit AT OR AFTER this epoch-millis
    * timestamp (Delta's `startingTimestamp` contract); mutually
    * exclusive with an explicit `startingVersion`. */
  val startingTimestamp: Option[Long] = ci("startingTimestamp").map(_.trim.toLong)
  require(startingTimestamp.isEmpty || ci("startingVersion").isEmpty,
    "startingTimestamp and startingVersion are mutually exclusive")
  /** changed-file budget per micro-batch; None = unbounded. */
  val maxFilesPerTrigger: Option[Int] =
    LakeTailOptions.maxFilesPerTrigger(ci("maxFilesPerTrigger"))
  /** changed-BYTES budget per micro-batch; None = unbounded (Delta's
    * own source pairs this knob with maxFilesPerTrigger). */
  val maxBytesPerTrigger: Option[Long] = ci("maxBytesPerTrigger").map { v =>
    val n = v.trim.toLong
    require(n > 0, s"maxBytesPerTrigger must be > 0, got $n")
    n
  }
}

/** Shared option parsing for the three lake tails' admission control. */
private[streaming] object LakeTailOptions {
  /** Default 1000 (Delta's own source default); `none`/`0` = unbounded. */
  def maxFilesPerTrigger(raw: Option[String]): Option[Int] = raw match {
    case None => Some(1000)
    case Some(s) if s.equalsIgnoreCase("none") => None
    case Some(s) =>
      val n = s.trim.toInt
      require(n >= 0, s"maxFilesPerTrigger must be >= 0, got $n")
      if (n == 0) None else Some(n)
  }

  /** Budget carried by Spark's ReadLimit, if any. */
  def budgetOf(limit: ReadLimit): Option[Int] = limit match {
    case m: ReadMaxFiles => Some(m.maxFiles())
    case _ => None
  }
}

class DeltaStreamTable(opts: DeltaStreamOptions) extends Table with SupportsRead {
  override def name(): String = s"graft-delta(${opts.path})"
  override def schema(): StructType = DeltaStreamSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = DeltaStreamSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new DeltaMicroBatchStream(opts)
    }
}

/** Offset = highest PROCESSED version (−1 = nothing yet). */
final case class DeltaStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

class DeltaMicroBatchStream(opts: DeltaStreamOptions)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def spark = org.apache.spark.sql.SparkSession.active

  /** Trigger.AvailableNow pins the tip at query start: batches drain to
    * exactly this version (in capped steps), then the query finishes. */
  @volatile private var availableNowTip: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTip = Some(DeltaRead.latestVersion(spark, opts.path))

  private def tipVersion: Long =
    availableNowTip.getOrElse(DeltaRead.latestVersion(spark, opts.path))

  override def initialOffset(): Offset = DeltaStreamOffset(
    opts.startingTimestamp match {
      case Some(ts) =>
        // earliest commit at-or-after ts; all-older history = start at tip
        DeltaRead.versionAtOrAfterTimestamp(spark, opts.path, ts)
          .map(_ - 1)
          .getOrElse(DeltaRead.latestVersion(spark, opts.path))
      case None =>
        opts.startingVersion.map(_ - 1).getOrElse(
          DeltaRead.latestVersion(spark, opts.path))
    })

  override def getDefaultReadLimit: ReadLimit =
    opts.maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  /** Admit whole versions oldest-first until the FILE or BYTE budget
    * is spent — whichever closes first (always at least one version —
    * a commit bigger than either cap still makes progress). Cost: one
    * commit-JSON read per admitted version. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DeltaStreamOffset].version
    val tip = tipVersion
    if (tip <= s) return DeltaStreamOffset(s)
    val fileBudget = LakeTailOptions.budgetOf(limit)
    val byteBudget = opts.maxBytesPerTrigger
    if (fileBudget.isEmpty && byteBudget.isEmpty)
      return DeltaStreamOffset(tip)
    var v = s
    var usedFiles = 0
    var usedBytes = 0L
    var stop = false
    while (!stop && v < tip) {
      val (c, b) = DeltaRead.changedFileStats(spark, opts.path, v + 1)
      val over = fileBudget.exists(usedFiles + c > _) ||
        byteBudget.exists(usedBytes + b > _)
      if (v > s && over) stop = true
      else {
        v += 1
        usedFiles += c
        usedBytes += b
        if (fileBudget.exists(usedFiles >= _) ||
            byteBudget.exists(usedBytes >= _)) stop = true
      }
    }
    DeltaStreamOffset(v)
  }

  override def reportLatestOffset(): Offset = DeltaStreamOffset(tipVersion)

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DeltaStreamOffset].version
    val e = end.asInstanceOf[DeltaStreamOffset].version
    if (e <= s) return Array.empty
    val plan = DeltaRead.changeFiles(spark, opts.path, s + 1, e)
    // COLUMN MAPPING: files carry PHYSICAL names — ship the top-level
    // physical→logical map so the emitted json keeps logical keys;
    // nested mapped fields would need a path-wise rewrite of the json
    // tree and gate loudly (read those feeds with DeltaRead.changes)
    val renames: Map[String, String] = plan.mappingMode match {
      case None => Map.empty
      case Some(_) =>
        val declared = plan.declared.getOrElse(
          throw new IllegalStateException(
            "column-mapped Delta table has no schemaString"))
        declared.fields.foreach { f =>
          require(DeltaRead.toPhysicalType(f.dataType) == f.dataType,
            s"graft-delta: column ${f.name} maps NESTED physical names — " +
              "not supported by the json change tail; read the feed with " +
              "DeltaRead.changes instead")
        }
        declared.fields.map(f => DeltaRead.physicalFieldName(f) -> f.name)
          .filter { case (p, l) => p != l }.toMap
    }
    val props = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(kv => (kv.getKey, kv.getValue)).toArray
    plan.files.map { f =>
      // partition values are keyed physically in the log under mapping
      val pv = f.partitionValues.map { case (k, v) =>
        renames.getOrElse(k, k) -> v
      }
      ChangeFilePartition(
        DeltaRead.resolvePath(opts.path, f.path).toString,
        pv, f.changeType, f.version, props,
        renames = renames): InputPartition
    }.toArray
  }

  override def commit(end: Offset): Unit = ()
  override def deserializeOffset(json: String): Offset =
    DeltaStreamOffset(json.trim.toLong)
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFileReaderFactory
  override def stop(): Unit = ()
}

final case class ChangeFilePartition(absolutePath: String,
                                      partitionValues: Map[String, String],
                                      changeType: Option[String], version: Long,
                                      confProps: Array[(String, String)],
                                      /** keep only rows whose string
                                        * `field` is in `(min, max]` —
                                        * the COW incremental row filter
                                        * (carried-over rows keep their
                                        * original commit time). */
                                      rowFilter: Option[(String, String, String)] = None,
                                      /** emit the FILTER FIELD's value
                                        * as the row's `version` (a COW
                                        * file carries rows of several
                                        * commits — the row's own commit
                                        * time is its version, not the
                                        * file's). */
                                      versionFromFilterField: Boolean = false,
                                      /** physical→logical TOP-LEVEL
                                        * column renames (Delta column
                                        * mapping) applied to the emitted
                                        * json keys. */
                                      renames: Map[String, String] = Map.empty,
                                      /** parquet FIELD-ID → current
                                        * logical name (Iceberg schema
                                        * evolution): a field whose
                                        * footer id is mapped emits under
                                        * the mapped name at ANY nesting
                                        * level (Iceberg ids are globally
                                        * unique per schema); id-less
                                        * fields keep their file name. */
                                      idRenames: Map[Int, String] = Map.empty)
  extends InputPartition

class ChangeFileReaderFactory extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ChangeFilePartition]
    val conf = new Configuration(false)
    part.confProps.foreach { case (k, v) => conf.set(k, v) }
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(part.absolutePath))
      .withConf(conf).build()
    new PartitionReader[InternalRow] {
      private var current: Group = _
      private def passes(g: Group): Boolean = part.rowFilter.forall {
        case (field, min, max) =>
          val idx = g.getType.getFieldIndex(field)
          require(g.getFieldRepetitionCount(idx) > 0,
            s"row filter field $field is null in ${part.absolutePath}")
          // Hudi commit instants compare on the padded timeline key
          // (mixed 14/17/18-digit widths — HudiRead.instantKey)
          val v = graft.sources.HudiRead.instantKey(g.getString(idx, 0))
          v > graft.sources.HudiRead.instantKey(min) &&
            v <= graft.sources.HudiRead.instantKey(max)
      }
      override def next(): Boolean = {
        current = reader.read()
        while (current != null && !passes(current)) current = reader.read()
        current != null
      }
      override def get(): InternalRow = {
        val (json, fileChangeType) =
          ChangeFileReaderFactory.groupToJson(current, part.partitionValues,
            part.renames, part.idRenames)
        val ct = part.changeType.orElse(fileChangeType).getOrElse(
          throw new IllegalStateException(
            s"cdc file ${part.absolutePath} row without _change_type"))
        val version =
          if (part.versionFromFilterField) {
            val field = part.rowFilter.getOrElse(throw new IllegalStateException(
              "versionFromFilterField needs a rowFilter"))._1
            current.getString(current.getType.getFieldIndex(field), 0).toLong
          } else part.version
        new GenericInternalRow(Array[Any](version,
          UTF8String.fromString(ct), UTF8String.fromString(json)))
      }
      override def close(): Unit = reader.close()
    }
  }
}

object ChangeFileReaderFactory {

  private def mapper = DocPushdown.jsonMapper

  /** One parquet Group → a JSON object node (recursive; repeated fields
    * become arrays), with `extra` merged in as string fields, any
    * `_change_type` column extracted instead of emitted, and TOP-LEVEL
    * keys renamed through `renames` (column mapping's physical→logical
    * restore — `_change_type` is never mapped). */
  private[streaming] def groupToJson(g: Group,
                                     extra: Map[String, String],
                                     renames: Map[String, String] = Map.empty,
                                     idRenames: Map[Int, String] = Map.empty): (String, Option[String]) = {
    var changeType: Option[String] = None
    // Iceberg schema evolution: a field's footer id resolves to its
    // CURRENT schema name; id-less fields (or unmapped ids) keep the
    // file spelling. Ids are globally unique per Iceberg schema, so one
    // flat map is safe at every nesting level.
    def emittedName(field: Type): String =
      Option(field.getId).map(_.intValue).flatMap(idRenames.get)
        .getOrElse(field.getName)
    def convert(group: Group): com.fasterxml.jackson.databind.node.ObjectNode = {
      val node = mapper.createObjectNode()
      val schema: GroupType = group.getType
      schema.getFields.asScala.zipWithIndex.foreach { case (field, i) =>
        val reps = group.getFieldRepetitionCount(i)
        def one(r: Int): Unit = field match {
          case pt: PrimitiveType =>
            import org.apache.parquet.schema.LogicalTypeAnnotation
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
            // DECIMAL bytes and INT96 timestamps have no faithful plain
            // rendering here — emitting them as UTF-8 text would be
            // silently wrong, so they are LOUD. (DATE int32 surfaces as
            // raw epoch days, TIMESTAMP int64 as raw micros — numeric
            // and lossless, documented contract of the json tail.)
            pt.getLogicalTypeAnnotation match {
              case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                throw new IllegalArgumentException(
                  s"column ${field.getName} is DECIMAL — not supported by " +
                    "the json change tail (read the table with the batch reader)")
              case _ => ()
            }
            pt.getPrimitiveTypeName match {
              case INT32 => node.put(emittedName(field), group.getInteger(i, r))
              case INT64 => node.put(emittedName(field), group.getLong(i, r))
              case FLOAT => node.put(emittedName(field), group.getFloat(i, r))
              case DOUBLE => node.put(emittedName(field), group.getDouble(i, r))
              case BOOLEAN => node.put(emittedName(field), group.getBoolean(i, r))
              case BINARY | FIXED_LEN_BYTE_ARRAY =>
                node.put(emittedName(field), group.getBinary(i, r).toStringUsingUTF8)
              case INT96 => throw new IllegalArgumentException(
                s"column ${field.getName} is INT96 — legacy timestamps are " +
                  "not supported by the json change tail")
            }
          case _: GroupType =>
            node.set(emittedName(field), convert(group.getGroup(i, r))): Unit
        }
        if (reps == 0) { /* absent (null) — omit */ }
        else if (field.getRepetition == Type.Repetition.REPEATED) {
          val arr = mapper.createArrayNode()
          (0 until reps).foreach { r =>
            field match {
              case _: PrimitiveType => arr.add(group.getValueToString(i, r))
              case _: GroupType => arr.add(convert(group.getGroup(i, r)))
            }
          }
          node.set(emittedName(field), arr): Unit
        } else one(0)
      }
      node
    }
    val node = convert(g)
    Option(node.get("_change_type")).foreach { ct =>
      changeType = Some(ct.asText())
      node.remove("_change_type"): Unit
    }
    renames.foreach { case (phys, logical) =>
      Option(node.remove(phys)).foreach { v =>
        node.set[com.fasterxml.jackson.databind.JsonNode](logical, v)
      }
    }
    extra.foreach { case (k, v) =>
      if (v == null) node.putNull(k) else node.put(k, v): Unit
    }
    (mapper.writeValueAsString(node), changeType)
  }
}
