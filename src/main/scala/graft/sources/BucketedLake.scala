package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ParquetReadShim
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bucketed graft-lake tables + STORAGE-PARTITIONED JOINS (SPJ): two
  * tables hash-bucketed on their join key by the SAME function join with
  * ZERO shuffle — at 100 TB the exchange under a fact-fact join is
  * usually THE dominant cost, and pre-bucketed layouts delete it.
  *
  * Write side ([[BucketedLake.write]]): rows route to
  * `bucket = pmod(xxhash64(key), n)` directories in one shuffled job.
  * Read side: a DataSource V2 catalog (`spark.sql.catalog.<name> =
  * graft.sources.GraftBucketCatalog`, tables addressed as
  * ``<name>.`/path` ``) whose scan reports
  * [[KeyGroupedPartitioning]]`(bucket(n, key), n)` with one input
  * partition per bucket ([[HasPartitionKey]] = the bucket ordinal, ALL
  * n buckets always reported so two tables' partition values align
  * even when buckets are empty). The catalog doubles as a
  * [[FunctionCatalog]] serving the `bucket` function — Catalyst resolves
  * the transform against it, and `EnsureRequirements` then recognizes
  * both sides as co-partitioned (same canonical function, same bucket
  * count, same partition values) and plans the join WITHOUT exchanges
  * (requires `spark.sql.sources.v2.bucketing.enabled=true`; pinned by
  * BucketedLakeSpec's plan contract).
  *
  * Parquet decode rides Spark's own reader via
  * [[org.apache.spark.sql.graftshim.ParquetReadShim]] (vectorized,
  * footer-pruned), with column pruning pushed through
  * [[SupportsPushDownRequiredColumns]]. Mismatched bucket counts are
  * still CORRECT — Spark simply falls back to a shuffled join. */
object BucketedLake {

  private val SpecFile = "_bucket_spec.txt"
  private val BucketDir = "__bucket"

  /** Table layout metadata: key column, bucket count, schema (json),
    * and whether bucket files are key-sorted (written that way by
    * [[write]] — lets the scan report its ordering so co-located SMJs
    * skip their sorts too). */
  final case class Spec(keyCol: String, buckets: Int, schema: StructType,
                        sorted: Boolean)

  /** The write-side routing expression — MUST stay in lockstep with
    * [[GraftBucketFunction.produceResult]] (read-side identity). */
  def bucketExpr(keyCol: String, buckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(buckets)).cast("int")

  /** Write `df` hash-bucketed by `keyCol` into `path`: one shuffled job,
    * rows clustered per bucket directory. */
  def write(df: DataFrame, path: String, keyCol: String, buckets: Int): Unit = {
    require(df.columns.contains(keyCol), s"no column '$keyCol' to bucket by")
    require(buckets >= 1, "buckets must be >= 1")
    val spark = df.sparkSession
    // every bucket lands in exactly ONE task (repartition on the bucket
    // value), key-sorted within it -> one key-sorted file per bucket
    df.withColumn(BucketDir, bucketExpr(keyCol, buckets))
      .repartition(buckets, col(BucketDir))
      .sortWithinPartitions(col(BucketDir), col(keyCol))
      .write.mode("overwrite").partitionBy(BucketDir).parquet(s"$path/data")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path, SpecFile)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(
      s"$keyCol\n$buckets\n${df.schema.json}\nsorted=true\n".getBytes(UTF_8))
    finally out.close()
  }

  private[sources] def readSpec(spark: SparkSession, path: String): Option[Spec] = {
    val p = new Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      new String(buf.toByteArray, UTF_8)
    } finally in.close()
    val lines = text.split("\n").map(_.trim)
    val Array(key, n, schemaJson) = lines.take(3)
    val sorted = lines.drop(3).contains("sorted=true")
    Some(Spec(key, n.toInt,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], sorted))
  }

  /** Fold multi-file buckets (appends) back to ONE key-sorted file each,
    * restoring the scan's sort-free-join claim. Reads ONLY the multi-file
    * buckets (one job), stages their replacements, then swaps per bucket
    * directory (rename-out, rename-in — the layout carries no manifest,
    * so a reader racing the swap can see a bucket mid-replacement; run
    * compaction in a maintenance window, like any manifest-less layout). */
  def compact(spark: SparkSession, path: String): Unit = {
    val spec = readSpec(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no bucketed table at $path"))
    val multi = (0 until spec.buckets)
      .map(b => b -> bucketFiles(spark, path, b)).filter(_._2.length > 1)
    if (multi.isEmpty) return
    val staging = s"$path/.compact-${java.util.UUID.randomUUID()}"
    spark.read.schema(spec.schema).parquet(multi.flatMap(_._2.map(_._1)): _*)
      .withColumn(BucketDir, bucketExpr(spec.keyCol, spec.buckets))
      .repartition(multi.length, col(BucketDir))
      .sortWithinPartitions(col(BucketDir), col(spec.keyCol))
      .write.mode("overwrite").partitionBy(BucketDir).parquet(staging)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    multi.foreach { case (b, _) =>
      val live = new Path(s"$path/data/$BucketDir=$b")
      val staged = new Path(s"$staging/$BucketDir=$b")
      val trash = new Path(s"$staging/.old-$b")
      if (!fs.rename(live, trash) || !fs.rename(staged, live))
        throw new java.io.IOException(s"compaction swap failed for bucket $b")
    }
    fs.delete(new Path(staging), true): Unit
  }

  /** `(path, length)` of every parquet file in bucket `b` (possibly none). */
  private[sources] def bucketFiles(spark: SparkSession, path: String,
                                   b: Int): Array[(String, Long)] = {
    val dir = new Path(s"$path/data/$BucketDir=$b")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.toString, f.getLen))
  }
}

/** `TableCatalog` + `FunctionCatalog` plugin: path-addressed bucketed
  * tables plus the `bucket` V2 function the SPJ transform resolves to. */
class GraftBucketCatalog extends TableCatalog with FunctionCatalog {
  private var catName: String = "graft_bucketed"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def loadTable(ident: Identifier): Table = {
    val spark = SparkSession.active
    val path = (ident.namespace() :+ ident.name()).mkString("/")
    BucketedLake.readSpec(spark, path) match {
      case Some(spec) => new GraftBucketedTable(spark, path, spec)
      case None => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "create via BucketedLake.write(df, path, keyCol, buckets)")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("bucketed tables are immutable")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("bucketed tables are immutable")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") new GraftBucketFunction.Unbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}

/** The `bucket(n, key)` V2 function — read-side identity of
  * [[BucketedLake.bucketExpr]]: `floorMod(xxhash64(key), n)` with
  * Spark's xxhash64 seed (42). */
object GraftBucketFunction {
  final class Unbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "graft bucket routing: pmod(xxhash64(key), n)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket(numBuckets, key) expects 2 args, got ${inputType.length}")
      new Bound(inputType.fields(1).dataType)
    }
  }

  /** `ReducibleFunction`: `floorMod(h, kn) = b` implies
    * `floorMod(h, n) = b mod n`, so a `kn`-bucket side REDUCES onto an
    * `n`-bucket side by `b mod n` — Spark's compatible-transform SPJ
    * (`spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled`)
    * then joins divisible bucket counts WITHOUT shuffling either side. */
  final class Bound(keyType: DataType) extends ScalarFunction[Integer]
      with org.apache.spark.sql.connector.catalog.functions
        .ReducibleFunction[Integer, Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${keyType.catalogString})"
    override def reducer(thisNumBuckets: Int,
                         otherFn: org.apache.spark.sql.connector.catalog
                           .functions.ReducibleFunction[_, _],
                         otherNumBuckets: Int)
        : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] =
      otherFn match {
        case _: Bound if otherNumBuckets < thisNumBuckets &&
            thisNumBuckets % otherNumBuckets == 0 =>
          new BucketReducer(otherNumBuckets)
        case _ => null // equal counts or non-divisible: no reduction
      }
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.get(1, keyType)
      if (v == null) return null // pmod(null) is null; null keys bucket nowhere
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, keyType, 42L)
      Integer.valueOf(java.lang.Math.floorMod(h, n.toLong).toInt)
    }
  }
}

/** Fold a finer bucket ordinal onto an `n`-bucket layout. */
private[sources] final class BucketReducer(n: Int)
    extends org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer]
    with Serializable {
  override def reduce(bucket: Integer): Integer =
    Integer.valueOf(bucket.intValue() % n)
}

private[sources] class GraftBucketedTable(spark: SparkSession, path: String,
                                          spec: BucketedLake.Spec)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = path
  override def schema(): StructType = spec.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(spec.buckets, spec.keyCol))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftBucketScanBuilder(spark, path, spec)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val in = info.schema().fields.map(f => (f.name, f.dataType)).toSeq
    val declared = spec.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(in == declared,
      s"bucketed table $path expects schema ${spec.schema.simpleString}, " +
        s"got ${info.schema().simpleString}")
    new GraftBucketWriteBuilder(spark, path, spec)
  }
}

/** V2 write path: `df.writeTo("cat.`/path`").append()` and SQL
  * `INSERT INTO` / `INSERT OVERWRITE`. The write REQUIRES a clustered
  * distribution on `bucket(n, key)` with a `(bucket, key)` in-partition
  * order — Spark plans the shuffle+sort itself, each bucket lands
  * wholly in one task as one key-sorted run, and the writer just cuts a
  * new file at each bucket transition. Files stage under a
  * write-unique directory and move into the layout on driver commit
  * (truncate swaps the whole data dir). Appends may give a bucket a
  * second file — the scan's ordering claim then withdraws itself
  * (single-file guard), correctness unaffected. */
private[sources] class GraftBucketWriteBuilder(spark: SparkSession,
                                               path: String,
                                               spec: BucketedLake.Spec)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new GraftBucketWrite(spark, path, spec, doTruncate)
}

private[sources] class GraftBucketWrite(spark: SparkSession, path: String,
                                        spec: BucketedLake.Spec,
                                        truncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.expressions.{SortDirection => SD}

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.bucket(spec.buckets, spec.keyCol)))
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(
      Expressions.sort(Expressions.bucket(spec.buckets, spec.keyCol),
        SD.ASCENDING),
      Expressions.sort(Expressions.column(spec.keyCol), SD.ASCENDING))

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new GraftBucketBatchWrite(spark, path, spec, truncate,
      s"$path/.stage-${java.util.UUID.randomUUID()}")
}

private[sources] final case class GraftBucketCommit(files: Seq[(Int, String)])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class GraftBucketBatchWrite(spark: SparkSession, path: String,
                                             spec: BucketedLake.Spec,
                                             truncate: Boolean, staging: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    val handle = org.apache.spark.sql.graftshim.ParquetWriteShim
      .prepare(spark, spec.schema)
    val keyIdx = spec.schema.fieldIndex(spec.keyCol)
    new GraftBucketWriterFactory(handle, staging, keyIdx,
      spec.schema.fields(keyIdx).dataType, spec.buckets)
  }

  override def commit(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dataDir = new Path(s"$path/data")
    val f = fs(dataDir)
    if (truncate && f.exists(dataDir)) f.delete(dataDir, true)
    messages.foreach {
      case GraftBucketCommit(files) => files.foreach { case (b, staged) =>
        val dir = new Path(s"$path/data/__bucket=$b")
        f.mkdirs(dir)
        val src = new Path(staged)
        if (!f.rename(src, new Path(dir, src.getName)))
          throw new java.io.IOException(s"commit failed moving $staged")
      }
      case other => throw new IllegalStateException(s"foreign message $other")
    }
    f.delete(new Path(staging), true): Unit
  }

  override def abort(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    fs(new Path(staging)).delete(new Path(staging), true): Unit
}

private[sources] class GraftBucketWriterFactory(
    handle: org.apache.spark.sql.graftshim.ParquetWriteShim.WriterHandle,
    staging: String, keyIdx: Int, keyType: DataType, buckets: Int)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private var bucket = -1
      private var sink: org.apache.spark.sql.graftshim.ParquetWriteShim.RowSink = _
      private val written = Seq.newBuilder[(Int, String)]

      override def write(row: InternalRow): Unit = {
        val v = row.get(keyIdx, keyType)
        require(v != null,
          "bucketed write: null bucket key (null keys have no bucket)")
        val b = java.lang.Math.floorMod(
          org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(v, keyType, 42L), buckets.toLong).toInt
        if (b != bucket) { // rows arrive (bucket, key)-sorted: transitions
          if (sink != null) sink.close()
          sink = org.apache.spark.sql.graftshim.ParquetWriteShim
            .open(handle, s"$staging/$b", partitionId)
          written += ((b, sink.path()))
          bucket = b
        }
        sink.write(row)
      }
      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage = {
        if (sink != null) sink.close()
        GraftBucketCommit(written.result())
      }
      override def abort(): Unit = if (sink != null) sink.close()
      override def close(): Unit = ()
    }
}

private[sources] class GraftBucketScanBuilder(spark: SparkSession, path: String,
                                              spec: BucketedLake.Spec)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = spec.schema
  private var countStar = false
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `COUNT(*)` with no grouping answers from parquet FOOTERS — a
    * metadata read bounded by file count, no row ever decoded (the
    * 100 TB `SELECT count(*)` is free). Everything else stays un-pushed. */
  private def isBareCountStar(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions().head
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = isBareCountStar(agg)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    countStar = isBareCountStar(agg)
    countStar
  }

  override def build(): Scan =
    if (countStar) new GraftBucketCountScan(spark, path, spec)
    else new GraftBucketScan(spark, path, spec, required)
}

/** Footer-only COUNT(*): one input partition carrying the summed
  * parquet record counts (computed on the driver from file footers —
  * O(files) metadata reads, zero data pages). */
private[sources] class GraftBucketCountScan(spark: SparkSession, path: String,
                                            spec: BucketedLake.Spec)
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("count_star",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-bucketed $path [PushedAggregates: COUNT(*) from footers]"
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val total = (0 until spec.buckets).iterator
      .flatMap(b => BucketedLake.bucketFiles(spark, path, b).iterator)
      .map { case (f, _) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    Array(GraftBucketCountPartition(total))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var served = false
          private val total = p.asInstanceOf[GraftBucketCountPartition].total
          override def next(): Boolean = !served && { served = true; true }
          override def get(): InternalRow = InternalRow(total)
          override def close(): Unit = ()
        }
    }
}

private[sources] final case class GraftBucketCountPartition(total: Long)
    extends InputPartition

private[sources] class GraftBucketScan(spark: SparkSession, path: String,
                                       spec: BucketedLake.Spec,
                                       required: StructType)
    extends Scan with Batch with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-bucketed $path (buckets=${spec.buckets}, key=${spec.keyCol})"

  /** ALL n buckets, every scan — empty ones included, so two tables'
    * partition-value sets are always identical and SPJ never needs
    * partition-value push-down/padding. */
  private lazy val partitions: Array[InputPartition] =
    (0 until spec.buckets).map { b =>
      GraftBucketPartition(b, BucketedLake.bucketFiles(spark, path, b))
    }.toArray

  override def planInputPartitions(): Array[InputPartition] = partitions

  /** Key-sorted buckets report their ordering, so a co-located SMJ skips
    * its SortExecs too — guarded on the writer's sorted flag, on every
    * bucket still being a SINGLE file (a multi-file bucket has no global
    * order), and on the key surviving column pruning.
    *
    * CORRECTNESS GATE: the claim holds PER INPUT PARTITION, but Spark's
    * partition-GROUPING SPJ modes (compatible-transform bucket
    * coalescing, partially-clustered distribution) may concatenate two
    * sorted buckets into one task — the concatenation is NOT sorted, and
    * a stale ordering claim there silently drops join matches. When
    * either grouping mode is on in the session, the scan withholds its
    * ordering (sorts come back; results stay right). */
  override def outputOrdering(): Array[org.apache.spark.sql.connector
      .expressions.SortOrder] = {
    def off(key: String): Boolean =
      !spark.conf.get(key, "false").toBoolean
    val groupingSafe =
      off("spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled") &&
        off("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
    if (groupingSafe && spec.sorted &&
        required.fieldNames.contains(spec.keyCol) &&
        partitions.forall(
          _.asInstanceOf[GraftBucketPartition].files.length <= 1))
      Array(Expressions.sort(Expressions.column(spec.keyCol),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    else Array.empty
  }

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(spec.buckets, spec.keyCol)), spec.buckets)

  override def createReaderFactory(): PartitionReaderFactory = {
    // driver-side: broadcasts a fresh per-scan conf; serializable fn
    val readerFn = ParquetReadShim.readerFor(spark, spec.schema, required)
    new GraftBucketReaderFactory(readerFn)
  }
}

private[sources] final case class GraftBucketPartition(
    bucket: Int, files: Array[(String, Long)])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

private[sources] class GraftBucketReaderFactory(
    readerFn: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBucketPartition]
    new PartitionReader[InternalRow] {
      private val it = p.files.iterator.flatMap { case (f, len) =>
        ParquetReadShim.rows(readerFn(ParquetReadShim.partitionedFile(f, len)))
      }
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
