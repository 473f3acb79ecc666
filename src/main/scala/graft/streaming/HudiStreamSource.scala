package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.HudiRead

/** STREAMING tail of a Hudi COW table's commit timeline:
  * `spark.readStream.format("graft-hudi").option("path", table)` — the
  * third lake-format tail next to `graft-delta` / `graft-iceberg`, same
  * `(version LONG, change_type STRING, row STRING json)` contract with
  * `version` = the commit instant and `change_type` = `"upsert"`
  * (Hudi's COW incremental view is latest-wins upserts; physical
  * deletes are invisible to it, exactly as in Hudi's own incremental
  * query).
  *
  * Offsets are COMPLETED INSTANTS (the timeline cursor — sortable
  * numeric strings). Each micro-batch plans the newest visible base
  * file per file group pruned to instants in `(start, end]`, one input
  * partition per file, and the shared [[ChangeFileReaderFactory]]
  * row-filters on `_hoodie_commit_time` (a COW rewrite carries old rows
  * with their ORIGINAL commit time, so the filter drops exactly the
  * carried-overs). MOR tables gate loudly to the batch
  * `HudiRead.incremental` — their merge is not per-file-expressible.
  *
  * ADMISSION CONTROL: `maxFilesPerTrigger` (default 1000, `none` =
  * unbounded) caps how many base files one micro-batch plans — instants
  * are admitted WHOLE, oldest-first, until the budget is spent (always
  * at least one). Counting is ONE executor-parallel listing per trigger
  * over RAW base files per instant, conservative under later rewrites
  * ([[HudiRead.baseFileCountsByInstant]]). `Trigger.AvailableNow` pins
  * the tip instant at query start and drains to exactly it, then
  * finishes.
  *
  * Options: `path` (required), `startingInstant` (default: everything;
  * `latest` starts after the current tip), `maxFilesPerTrigger`. */
class HudiStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-hudi"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DeltaStreamSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new HudiStreamTable(HudiStreamOptions(properties.asScala.toMap))
}

final case class HudiStreamOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  val path: String = ci("path").getOrElse(
    throw new IllegalArgumentException("graft-hudi requires option path"))
  val startingInstant: Option[String] = ci("startingInstant")
  /** base-file budget per micro-batch; None = unbounded. */
  val maxFilesPerTrigger: Option[Int] =
    LakeTailOptions.maxFilesPerTrigger(ci("maxFilesPerTrigger"))
}

class HudiStreamTable(opts: HudiStreamOptions) extends Table with SupportsRead {
  override def name(): String = s"graft-hudi(${opts.path})"
  override def schema(): StructType = DeltaStreamSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = DeltaStreamSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new HudiMicroBatchStream(opts)
    }
}

/** Offset = highest PROCESSED instant ("" = nothing yet). Instants are
  * fixed-width numeric strings, so string order IS timeline order. */
final case class HudiStreamOffset(instant: String) extends Offset {
  override def json(): String = instant
}

class HudiMicroBatchStream(opts: HudiStreamOptions)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def spark = org.apache.spark.sql.SparkSession.active

  /** Trigger.AvailableNow pins the tip instant at query start. */
  @volatile private var availableNowTip: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTip = Some(
      HudiRead.completedInstants(spark, opts.path).lastOption.getOrElse(""))

  private def tipInstant: String = availableNowTip.getOrElse(
    HudiRead.completedInstants(spark, opts.path).lastOption.getOrElse(""))

  override def initialOffset(): Offset = {
    val start = opts.startingInstant match {
      case None => ""
      case Some(s) if s.equalsIgnoreCase("latest") =>
        HudiRead.completedInstants(spark, opts.path).lastOption.getOrElse("")
      case Some(s) => s.trim
    }
    HudiStreamOffset(start)
  }

  override def getDefaultReadLimit: ReadLimit =
    opts.maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  /** Admit whole instants oldest-first until the base-file budget is
    * spent (always at least one; instants with no base files in the
    * count — replacecommits, rewritten-away groups — ride along with the
    * next counted instant, and an empty range jumps straight to tip). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // instant ordering via the padded timeline key (mixed-width
    // instants: HudiRead.instantKey)
    def key(i: String) = HudiRead.instantKey(i)
    val s = start.asInstanceOf[HudiStreamOffset].instant
    val tip = tipInstant
    if (key(tip) <= key(s)) return HudiStreamOffset(s)
    LakeTailOptions.budgetOf(limit) match {
      case None => HudiStreamOffset(tip)
      case Some(budget) =>
        val counts = HudiRead.baseFileCountsByInstant(spark, opts.path)
          .filter { case (i, _) => key(i) > key(s) && key(i) <= key(tip) }
        if (counts.isEmpty) return HudiStreamOffset(tip)
        var admitted = s
        var used = 0
        var stop = false
        counts.foreach { case (instant, c) =>
          if (!stop) {
            if (key(admitted) > key(s) && used + c > budget) stop = true
            else {
              admitted = instant
              used += c
              if (used >= budget) stop = true
            }
          }
        }
        // everything counted was admitted: close the batch at the tip so
        // trailing no-base instants don't stall the cursor
        HudiStreamOffset(if (!stop) tip else admitted)
    }
  }

  override def reportLatestOffset(): Offset = HudiStreamOffset(tipInstant)

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HudiStreamOffset].instant
    val e = end.asInstanceOf[HudiStreamOffset].instant
    if (HudiRead.instantKey(e) <= HudiRead.instantKey(s)) return Array.empty
    val files = HudiRead.incrementalBaseFiles(spark, opts.path, s, e)
    val props = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(kv => (kv.getKey, kv.getValue)).toArray
    files.map { f =>
      ChangeFilePartition(f.path, Map.empty, Some("upsert"),
        f.instant.toLong, props,
        rowFilter = Some(("_hoodie_commit_time", s, e)),
        versionFromFilterField = true): InputPartition
    }.toArray
  }

  override def commit(end: Offset): Unit = ()
  override def deserializeOffset(json: String): Offset = HudiStreamOffset(json)
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFileReaderFactory
  override def stop(): Unit = ()
}
