package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL MAINTENANCE PROCEDURES for the bucketed lake — Spark 4's
  * `ProcedureCatalog` + `CALL` surface, the idiomatic spelling every
  * catalog-backed lake exposes for table services (Iceberg's
  * `CALL cat.system.rewrite_data_files`, Delta's `OPTIMIZE`/`VACUUM`
  * commands; the reference drives its table services from CLI
  * properties — `hoodie.*` keys in `hudi_mongodb_batch.properties` —
  * re-expressed here as the engine-native SQL):
  *
  * {{{
  *   CALL cat.system.compact('/p')
  *   CALL cat.system.cluster('/p', 'price,dt')          -- Z-order
  *   CALL cat.system.build_bloom_index('/p', 'uid')
  *   CALL cat.system.vacuum('/p')                       -- 7-day guard
  *   CALL cat.system.vacuum('/p', 0, true)              -- dry run
  * }}}
  *
  * Each returns a ONE-ROW report (the committed version / the vacuum
  * counts), so operators script maintenance in pure SQL and inspect
  * what happened. Procedures are non-deterministic by contract (they
  * commit); Spark invokes `call` exactly once per CALL statement. */
object BucketedProcedures {

  private val Namespace = Array("system")

  def namespaceOk(ns: Array[String]): Boolean = ns.sameElements(Namespace)

  val names: Seq[String] = Seq("compact", "cluster", "build_bloom_index",
    "vacuum", "repair", "analyze")

  def load(name: String): Option[UnboundProcedure] = name match {
    case "compact" => Some(CompactProc)
    case "cluster" => Some(ClusterProc)
    case "build_bloom_index" => Some(BloomProc)
    case "vacuum" => Some(VacuumProc)
    case "repair" => Some(RepairProc)
    case "analyze" => Some(AnalyzeProc)
    case _ => None
  }

  // ------------------------------------------------------- plumbing

  private def in(name: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String,
                        dt: org.apache.spark.sql.types.DataType,
                        default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One-row result scan (the CALL output relation) — Spark's
    * procedure invocation accepts only [[LocalScan]] outputs. */
  private final class ResultScan(schema: StructType,
                                 resultRows: Array[InternalRow])
      extends org.apache.spark.sql.connector.read.LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = resultRows
  }

  private abstract class MaintenanceProc(procName: String,
                                         params: Array[ProcedureParameter],
                                         out: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    protected def run(spark: SparkSession, input: InternalRow)
        : Array[InternalRow]
    override def call(input: InternalRow)
        : java.util.Iterator[org.apache.spark.sql.connector.read.Scan] =
      java.util.List.of[Scan](
        new ResultScan(out, run(SparkSession.active, input))).iterator()
  }

  private def str(r: InternalRow, i: Int): String =
    r.get(i, StringType).asInstanceOf[UTF8String].toString

  /** 'dt=2024-01-02,region=eu' → scope map (shared by compact/cluster). */
  private def parseScope(raw: String): Map[String, String] =
    Option(raw).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"partition_filter entry '$kv' is not col=value")
        kv.substring(0, i).trim -> kv.substring(i + 1).trim
      }.toMap

  // ------------------------------------------------------ procedures

  private object CompactProc extends MaintenanceProc("compact",
    Array(in("table", StringType),
      inDefault("partition_filter", StringType, "''")),
    new StructType().add("version", LongType, nullable = false)
      .add("files", IntegerType, nullable = false)) {
    override def description(): String =
      "Fold multi-file (partition, bucket) groups to one key-sorted " +
        "file each; `partition_filter` ('dt=2024-01-02,region=eu') " +
        "scopes the fold to matching partition dirs — the " +
        "OPTIMIZE-one-partition shape. Returns the committed version " +
        "and live file count"
    override protected def run(spark: SparkSession, input: InternalRow)
        : Array[InternalRow] = {
      val path = str(input, 0)
      val scope = parseScope(str(input, 1))
      BucketedLake.compact(spark, path, scope)
      val m = BucketedLake.readManifestFull(spark, path)
      Array(InternalRow(
        BucketedLake.currentVersion(spark, path).getOrElse(0L),
        m.map(_.entries.length).getOrElse(0)))
    }
  }

  private object ClusterProc extends MaintenanceProc("cluster",
    Array(in("table", StringType), in("columns", StringType),
      inDefault("max_rows_per_file", LongType, (1L << 20).toString),
      inDefault("partition_filter", StringType, "''")),
    new StructType().add("version", LongType, nullable = false)
      .add("files", IntegerType, nullable = false)) {
    override def description(): String =
      "Rewrite (partition, bucket) groups ordered/Z-ordered by the " +
        "given columns, split into bounded files — tight min/max " +
        "windows for data skipping. `partition_filter` " +
        "('dt=2024-01-02,region=eu') scopes the rewrite to matching " +
        "partition dirs — the OPTIMIZE-one-partition shape"
    override protected def run(spark: SparkSession, input: InternalRow)
        : Array[InternalRow] = {
      val path = str(input, 0)
      val cols = str(input, 1).split(",").map(_.trim).filter(_.nonEmpty)
      val scope = parseScope(str(input, 3))
      BucketedLake.cluster(spark, path, cols.toSeq, input.getLong(2), scope)
      val m = BucketedLake.readManifestFull(spark, path)
      Array(InternalRow(
        BucketedLake.currentVersion(spark, path).getOrElse(0L),
        m.map(_.entries.length).getOrElse(0)))
    }
  }

  private object BloomProc extends MaintenanceProc("build_bloom_index",
    Array(in("table", StringType), in("columns", StringType),
      inDefault("fpp", DoubleType, "0.01")),
    new StructType().add("version", LongType, nullable = false)
      .add("sidecar", StringType, nullable = true)) {
    override def description(): String =
      "Build per-file bloom filters for equality skipping on the " +
        "given columns; returns the committed version and sidecar path"
    override protected def run(spark: SparkSession, input: InternalRow)
        : Array[InternalRow] = {
      val path = str(input, 0)
      val cols = str(input, 1).split(",").map(_.trim).filter(_.nonEmpty)
      BucketedLake.buildBloomIndex(spark, path, cols.toSeq,
        input.getDouble(2))
      val m = BucketedLake.readManifestFull(spark, path)
      Array(InternalRow(
        BucketedLake.currentVersion(spark, path).getOrElse(0L),
        m.flatMap(_.bloom).map(UTF8String.fromString).orNull))
    }
  }

  private object RepairProc extends MaintenanceProc("repair",
    Array(in("table", StringType)),
    new StructType().add("version", LongType, nullable = false)) {
    override def description(): String =
      "Restore a lost/corrupt commit pointer to the highest complete " +
        "manifest version on disk (precise — never a data-dir guess)"
    override protected def run(spark: SparkSession, input: InternalRow)
        : Array[InternalRow] =
      Array(InternalRow(BucketedLake.repair(spark, str(input, 0))))
  }

  private object AnalyzeProc extends MaintenanceProc("analyze",
    Array(in("table", StringType),
      inDefault("columns", StringType, "''")),
    new StructType().add("column", StringType, nullable = false)
      .add("ndv", LongType, nullable = false)) {
    override def description(): String =
      "(Re)build the NDV statistics header from the current snapshot — " +
        "the bucket key always, plus any comma-separated `columns` " +
        "(non-key join/grouping attributes then broadcast on " +
        "cardinality too). Bootstraps pre-header tables; tightens " +
        "estimates back to exact-live after heavy deletes"
    override protected def run(spark: SparkSession, input: InternalRow)
        : Array[InternalRow] = {
      val cols = Option(str(input, 1)).getOrElse("")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      BucketedLake.analyzeNdv(spark, str(input, 0), cols)
        .toSeq.sortBy(_._1)
        .map { case (c, n) => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(c), n) }
        .toArray
    }
  }

  private object VacuumProc extends MaintenanceProc("vacuum",
    Array(in("table", StringType),
      inDefault("min_age_ms", LongType,
        BucketedLake.DefaultRetentionMs.toString),
      inDefault("dry_run", BooleanType, "false")),
    new StructType().add("files", IntegerType, nullable = false)
      .add("bytes", LongType, nullable = false)
      .add("manifests", IntegerType, nullable = false)
      .add("staging_dirs", IntegerType, nullable = false)
      .add("index_dirs", IntegerType, nullable = false)) {
    override def description(): String =
      "Reclaim files no retained manifest references (retention-" +
        "guarded; dry_run reports without deleting)"
    override protected def run(spark: SparkSession, input: InternalRow)
        : Array[InternalRow] = {
      val rep = BucketedLake.vacuum(spark, str(input, 0),
        minAgeMs = input.getLong(1), dryRun = input.getBoolean(2))
      Array(InternalRow(rep.files, rep.bytes, rep.manifests,
        rep.stagingDirs, rep.indexDirs))
    }
  }
}
