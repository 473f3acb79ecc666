package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.graftshim.ParquetReadShim
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{BucketedLake, GraftBucketPartition, GraftBucketReaderFactory}

/** STREAMING tail of a bucketed graft-lake table:
  * `spark.readStream.format("graft-bucketed").option("path", t)` — the
  * lake's own MVCC versions ARE the offsets, so the stream is the
  * exactly-replayable composition layer: lake → IVM marts
  * ([[IncrementalAgg]]), lake → lake replication (pair with
  * [[BucketedLake.streamInto]]'s transactional watermarks for
  * exactly-once end-to-end), lake → any sink.
  *
  * Emits the table's OWN schema (typed rows, not a json envelope — the
  * table's spec is the contract). Version-by-version, on the commit's
  * op tag:
  *
  *  - `append` — the added files' rows (exactly the appended rows; a
  *    file-level manifest diff, reads only the new files);
  *  - `compact`/`create` — no logical change: skipped;
  *  - `replace`/`truncate`/`merge` — NOT expressible as append-only
  *    rows: FAIL LOUDLY (Delta's own source contract), unless
  *    `ignoreChanges=true`, which re-emits the version's ADDED files'
  *    rows (rewritten rows surface again; deletes never surface —
  *    Delta's ignoreChanges semantics, for idempotent keyed sinks).
  *
  * ADMISSION CONTROL: `maxFilesPerTrigger` (default 1000; `none`/`0` =
  * unbounded) admits whole versions oldest-first until the budget is
  * spent (always ≥ 1 version, so an oversized commit still makes
  * progress); cost is one manifest read per admitted version.
  * `Trigger.AvailableNow` pins the tip at query start — the backfill
  * shape. A restart replays exactly the uncheckpointed versions
  * (offsets are versions; manifests are immutable); versions vacuumed
  * past the checkpoint fail loudly rather than fabricating changes.
  *
  * Options: `path` (required), `startingVersion` (default 0 = full
  * history; `latest` = only commits after query start),
  * `maxFilesPerTrigger`, `ignoreChanges`. */
class BucketedStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-bucketed"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-bucketed requires option path"))
    BucketedLake.readSpec(SparkSession.active, path).getOrElse(
      throw new IllegalArgumentException(
        s"no bucketed table at $path")).schema
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    import scala.jdk.CollectionConverters._
    new BucketedStreamTable(
      BucketedStreamOptions(properties.asScala.toMap), schema)
  }
}

final case class BucketedStreamOptions(raw: Map[String, String]) {
  private def ci(key: String): Option[String] =
    raw.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  val path: String = ci("path").getOrElse(
    throw new IllegalArgumentException("graft-bucketed requires option path"))
  /** `None` = resolve "latest" at query start. */
  val startingVersion: Option[Long] = ci("startingVersion") match {
    case Some(s) if s.equalsIgnoreCase("latest") => None
    case Some(s) => Some(s.trim.toLong)
    case None => Some(0L)
  }
  val maxFilesPerTrigger: Option[Int] =
    LakeTailOptions.maxFilesPerTrigger(ci("maxFilesPerTrigger"))
  val ignoreChanges: Boolean =
    ci("ignoreChanges").exists(_.trim.toBoolean)
}

class BucketedStreamTable(opts: BucketedStreamOptions, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-bucketed(${opts.path})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = schema0
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new BucketedMicroBatchStream(opts, schema0)
    }
}

/** Offset = highest PROCESSED manifest version (0 = nothing yet — the
  * table's versions start at 1). */
final case class BucketedStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

class BucketedMicroBatchStream(opts: BucketedStreamOptions,
                               schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def spark = SparkSession.active

  @volatile private var availableNowTip: Option[Long] = None

  /** The COMMIT POINTER is the tip — a crashed committer's orphan
    * manifest above the pointer is not a commit and must never stream. */
  private def currentTip: Long =
    BucketedLake.currentVersion(spark, opts.path).getOrElse(0L)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTip = Some(currentTip)

  private def tipVersion: Long = availableNowTip.getOrElse(currentTip)

  override def initialOffset(): Offset = BucketedStreamOffset(
    opts.startingVersion.map(v => math.max(0L, v - 1L))
      .getOrElse(currentTip))

  override def getDefaultReadLimit: ReadLimit =
    opts.maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  /** The (op, added-file list) of one version. FAST PATH: a version
    * that committed as a DELTA fragment carries its own diff — the
    * adds are ONE O(changed)-byte fragment read
    * ([[BucketedLake.deltaDiffOf]]), no chain resolution, no
    * predecessor slurp (at 10^6 files the fallback is two checkpoint
    * resolutions per microbatch step). Full/torn/legacy fragments fall
    * back to resolve-and-diff with identical results. */
  private def addedOf(v: Long)
      : (String, Seq[graft.sources.BucketedLake.ManifestEntry]) = {
    val (op, added) = BucketedLake.deltaDiffOf(spark, opts.path, v) match {
      case Some((o, _, adds)) => (o, adds)
      case None => resolvedDiffOf(v)
    }
    op match {
      case "append" => (op, added)
      case "compact" | "create" => (op, Nil)
      case other =>
        if (opts.ignoreChanges) (other, added)
        else throw new IllegalStateException(
          s"version $v at ${opts.path} is a '$other' commit — not " +
            "expressible as an append-only stream; set " +
            "ignoreChanges=true to re-emit rewritten rows (deletes " +
            "never surface), or read the feed with BucketedLake.changes")
    }
  }

  /** Fallback diff: resolve the version AND its predecessor, subtract. */
  private def resolvedDiffOf(v: Long)
      : (String, Seq[graft.sources.BucketedLake.ManifestEntry]) = {
    val cur = BucketedLake.readManifestFull(spark, opts.path, Some(v))
      .getOrElse(throw new IllegalStateException(
        s"manifest version $v at ${opts.path} disappeared mid-stream"))
    val op = cur.op.getOrElse(throw new IllegalStateException(
      s"manifest version $v at ${opts.path} carries no operation tag — " +
        "the stream cannot classify it"))
    val prevRels: Set[String] =
      if (v <= 1L) Set.empty
      else BucketedLake.readManifestFull(spark, opts.path, Some(v - 1L))
        .getOrElse(throw new IllegalStateException(
          s"manifest version ${v - 1L} at ${opts.path} was vacuumed — " +
            "the stream tail cannot diff against it; advance " +
            "startingVersion or re-checkpoint"))
        .entries.map(_.rel).toSet
    (op, cur.entries.filterNot(e => prevRels.contains(e.rel)))
  }

  /** Admit whole versions oldest-first until the file budget closes
    * (always at least one). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BucketedStreamOffset].version
    val tip = tipVersion
    if (tip <= s) return BucketedStreamOffset(s)
    val budget = LakeTailOptions.budgetOf(limit)
    if (budget.isEmpty) return BucketedStreamOffset(tip)
    var v = s
    var used = 0
    var stop = false
    while (!stop && v < tip) {
      val c = addedOf(v + 1)._2.size
      if (v > s && budget.exists(used + c > _)) stop = true
      else {
        v += 1
        used += c
        if (budget.exists(used >= _)) stop = true
      }
    }
    BucketedStreamOffset(v)
  }

  override def reportLatestOffset(): Offset = BucketedStreamOffset(tipVersion)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BucketedStreamOffset].version
    val e = end.asInstanceOf[BucketedStreamOffset].version
    if (e <= s) return Array.empty
    ((s + 1L) to e).flatMap { v =>
      addedOf(v)._2.map(entry =>
        GraftBucketPartition(entry.bucket,
          Array((s"${opts.path}/${entry.rel}", entry.size)))
          : InputPartition)
    }.toArray
  }

  override def commit(end: Offset): Unit = ()
  override def deserializeOffset(json: String): Offset =
    BucketedStreamOffset(json.trim.toLong)
  override def createReaderFactory(): PartitionReaderFactory = {
    // the table's CURRENT schema reads every generation (old files
    // null-fill evolved columns by name) — same contract as the scan
    val readerFn = ParquetReadShim.readerFor(spark, schema, schema, Nil)
    new GraftBucketReaderFactory(readerFn, None)
  }
  override def stop(): Unit = ()
}
