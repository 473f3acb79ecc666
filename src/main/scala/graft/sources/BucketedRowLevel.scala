package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{InputPartition, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL row-level DML (`MERGE INTO` / `UPDATE` / row-level `DELETE`) on
  * the bucketed lake — the GROUP-BASED COPY-ON-WRITE connector
  * (group = file), the same DSv2 contract Iceberg's copy-on-write mode
  * speaks. The division of labor is deliberately Spark-first: Spark's
  * own rewrite rules (`RewriteMergeIntoTable` / `RewriteUpdateTable` /
  * `RewriteDeleteFromTable`) derive the replacement rows — arbitrary
  * matched/not-matched actions, assignment expressions, subqueries all
  * come for free — while this connector decides only WHICH files those
  * rows replace and commits the swap atomically:
  *
  *  - the SCAN reads candidate files, pruned statically on all four
  *    axes (bucket / partition / min-max / bloom — a `MERGE ... ON
  *    t.k = s.k AND t.dt = X` prunes like any other scan), then
  *    narrowed AT RUNTIME by Spark's group-filter IN-subquery on the
  *    [[BucketedLake.FileMetaCol `_file`]] metadata column
  *    (`RowLevelOperationRuntimeGroupFiltering`): only files that
  *    actually HOLD matching rows are read — a 2-key MERGE into a
  *    100 TB table rewrites ≤2 files' groups, never the table;
  *  - the WRITE lands replacement rows through the SAME clustered
  *    distribution + `(partition, bucket, key)` ordering as every
  *    other write (files stay key-sorted, stats windows stay tight);
  *  - the COMMIT is one OCC-gated manifest flip: scanned files out,
  *    new files in, gated on the version the scan pinned
  *    ([[BucketedLake.ConcurrentCommitException]] on any racing
  *    commit — rewrites don't commute, no silent retry), op-tagged
  *    for the change feed ([[BucketedLake.changes]] renders the
  *    rewrite as file-diff deletes+inserts).
  *
  * Partition-axis `DELETE`s never reach this path: Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` prefers the table's
  * `SupportsDelete` metadata delete (zero data IO) whenever
  * `canDeleteWhere` accepts the predicate.
  *
  * Reference scope note: the reference tool's row-level mutation is the
  * keyed upsert path (`hudi-spark-utilities-plus` `write.operation`
  * upsert/delete, reference `README.md:24-31`); SQL DML on the lake is
  * this repo's beyond-reference surface, expressed through Spark's own
  * row-level planning instead of a bespoke SQL front-end. */
private[sources] final class GraftRowLevelOperation(
    spark: SparkSession, path: String, spec: BucketedLake.Spec,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** ONE pinned version serves the whole statement: the candidate
    * scan, the group-filter subquery, and the commit's OCC gate all
    * derive from it — a concurrent commit between read and write fails
    * the statement loudly instead of silently dropping its files. */
  private[sources] val baseVersion: Long =
    BucketedLake.currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$cmd on $path requires an MVCC manifest — run compact() once " +
          "to upgrade a legacy table"))
  private[sources] val pinned: BucketedLake.ManifestData =
    BucketedLake.readManifestFull(spark, path, Some(baseVersion)).get

  @volatile private[sources] var configuredScan: GraftRowLevelScan = _

  override def command: RowLevelOperation.Command = cmd
  override def description: String =
    s"graft-bucketed $cmd $path @v$baseVersion"

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftRowLevelScanBuilder(spark, path, spec, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema().fields.map(f => (f.name, f.dataType)).toSeq
    val declared = spec.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(in == declared,
      s"row-level $cmd on $path writes the table schema " +
        s"${spec.schema.simpleString}, got ${info.schema().simpleString}")
    new WriteBuilder {
      override def build(): Write =
        new GraftRowLevelWrite(spark, path, spec,
          GraftRowLevelOperation.this)
    }
  }

  /** `_file` rides the rewrite read — the group identity the runtime
    * group filter keys on. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(BucketedLake.FileMetaCol))

  /** The files the rewrite actually READ (post static pruning AND
    * runtime group filtering) — exactly the groups the commit must
    * swap out. */
  private[sources] def replacedRels: Set[String] = {
    val s = configuredScan
    require(s != null,
      s"row-level $cmd on $path committed before its scan was built")
    s.finalRels
  }

  private[sources] def opTag: String = cmd match {
    case RowLevelOperation.Command.DELETE => "delete"
    case RowLevelOperation.Command.UPDATE => "update"
    case _ => "merge"
  }
}

/** Builder variant that pins the operation's snapshot and hands the
  * built scan back to the operation (the commit needs its final file
  * set). Inherits the full static-pruning pushdown surface — Spark's
  * `GroupBasedRowLevelOperationScanPlanning` pushes the command's
  * condition here, so candidate files prune on all four axes before
  * any row is read. */
private[sources] class GraftRowLevelScanBuilder(
    spark: SparkSession, path: String, spec: BucketedLake.Spec,
    op: GraftRowLevelOperation)
    extends GraftBucketScanBuilder(spark, path, spec,
      Some(op.baseVersion)) {
  override def build(): Scan = {
    val s = new GraftRowLevelScan(spark, path, spec, required, pruned,
      accepted, op)
    op.configuredScan = s
    s
  }
}

/** The rewrite's candidate scan: a normal bucketed scan (all pruning
  * axes, `_file` projection) whose RUNTIME filter is keyed on `_file`
  * alone — Spark's group-filter subquery computes `DISTINCT _file` of
  * the rows matching the command condition and this scan keeps exactly
  * those files; everything it ultimately reads is what the commit
  * replaces. */
private[sources] class GraftRowLevelScan(
    spark: SparkSession, path: String, spec: BucketedLake.Spec,
    required: org.apache.spark.sql.types.StructType,
    pruned: Option[Set[Int]], accepted: Array[Filter],
    op: GraftRowLevelOperation)
    extends GraftBucketScan(spark, path, spec, required, pruned, accepted,
      asOf = Some(op.baseVersion), prePinned = Some(Some(op.pinned))) {

  @volatile private var fileKeep: Option[Set[String]] = None
  @volatile private var planned: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(BucketedLake.FileMetaCol))

  override def filter(filters: Array[Filter]): Unit = {
    val (fileF, rest) = filters.partition(
      _.references.contains(BucketedLake.FileMetaCol))
    fileF.foreach {
      case In(c, vs) if c == BucketedLake.FileMetaCol && vs != null =>
        val set = vs.iterator.filter(_ != null).map(String.valueOf).toSet
        fileKeep = Some(fileKeep.fold(set)(_ intersect set))
      case EqualTo(c, v) if c == BucketedLake.FileMetaCol && v != null =>
        val set = Set(String.valueOf(v))
        fileKeep = Some(fileKeep.fold(set)(_ intersect set))
      case _ => () // unrecognized shape: no narrowing — a WIDER rewrite
                   // is correct (unmatched rows round-trip verbatim)
    }
    // `_file` never reaches the parquet layer; everything else flows
    // through the normal runtime pruning (bucket / partition / stats)
    super.filter(rest)
  }

  private def relOf(abs: String): String = {
    val prefix = s"$path/"
    if (abs.startsWith(prefix)) abs.substring(prefix.length) else abs
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val base = super.planInputPartitions()
    val out = fileKeep match {
      case None => base
      case Some(keep) => base.map { case p: GraftBucketPartition =>
        val kept = p.files.filter { case (abs, _) =>
          keep.contains(relOf(abs)) }
        (if (kept.length == p.files.length) p
         else p.copy(files = kept)): InputPartition
      }
    }
    // the LAST planning (Spark re-plans after runtime filters land) is
    // what the job reads — and therefore what the commit replaces
    planned = Some(out.iterator.flatMap {
      case p: GraftBucketPartition => p.files.iterator.map(f => relOf(f._1))
    }.toSet)
    out
  }

  /** Final file set this scan reads; before any planning, the static
    * candidates (a conservative superset — correct, coarser). */
  private[sources] def finalRels: Set[String] =
    planned.getOrElse(keptFiles.map(_.rel).toSet)
}

/** Same required distribution/ordering as every bucketed write —
  * replacement files land per `(partition, bucket)` group, key-sorted —
  * with the commit swapped for the group-replace manifest flip. */
private[sources] class GraftRowLevelWrite(
    spark: SparkSession, path: String, spec: BucketedLake.Spec,
    op: GraftRowLevelOperation)
    extends GraftBucketWrite(spark, path, spec, ReplaceScope.Append) {
  override def toBatch: BatchWrite =
    new GraftRowLevelBatchWrite(spark, path, spec, op,
      s"$path/.rowlevel-${java.util.UUID.randomUUID()}")
}

private[sources] class GraftRowLevelBatchWrite(
    spark: SparkSession, path: String, spec: BucketedLake.Spec,
    op: GraftRowLevelOperation, staging: String)
    extends GraftBucketBatchWrite(spark, path, spec, ReplaceScope.Append,
      staging) {

  /** scanned files out, replacement files in, ONE manifest flip —
    * OCC-gated on the version the whole statement pinned. The bloom
    * sidecar header carries forward: replaced rels simply die with
    * their entries (file names are write-once, so surviving sidecar
    * rows can never mismatch), and the new files just don't skip until
    * the next build. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = BucketedLake.adoptStaged(f, path, messages)
    val replaced = op.replacedRels
    val kept = op.pinned.entries.filterNot(e => replaced.contains(e.rel))
    // NDV: union the replacement tasks' key sketches in (a MERGE's
    // inserts may add unseen keys; deletes leave an over-estimate —
    // HLL cannot subtract, and over is the safe broadcast direction)
    val taskSketches = messages.toSeq.collect {
      case GraftBucketCommit(_, Some(b)) => b }
    // publish only when coverage holds (prior header, or the whole
    // table was rewritten): a tasks-only sketch atop unsketched kept
    // files would UNDER-estimate, the unsafe broadcast direction
    val covered = kept.isEmpty || op.pinned.ndv.contains(spec.keyCol)
    val ndvHeader =
      if (!covered) Map.empty[String, String]
      else NdvSketch.unionAll(
        op.pinned.ndv.get(spec.keyCol).toSeq, taskSketches)
        .map(b => spec.keyCol -> b).toMap
    BucketedLake.writeManifest(spark, path, kept ++ fresh,
      base = Some(op.baseVersion), txns = op.pinned.txns,
      layout = Some((spec.keyCol, spec.buckets, spec.partCols)),
      op = op.opTag, bloom = op.pinned.bloom,
      ndv = if (ndvHeader.nonEmpty) ndvHeader else op.pinned.ndv,
      sortedClaim = op.pinned.sortedClaim, prior = Some(op.pinned)): Unit
    f.delete(new org.apache.hadoop.fs.Path(staging), true): Unit
  }
}
