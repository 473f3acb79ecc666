package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** SQL-native lakehouse reads — TABLE-VALUED FUNCTIONS over the three
  * format readers, so plain `spark.sql` users query any lake table
  * without touching the programmatic APIs:
  *
  * {{{
  * SELECT * FROM graft_delta('/lake/t')            -- latest snapshot
  * SELECT * FROM graft_delta('/lake/t', 3)         -- versionAsOf
  * SELECT * FROM graft_delta('/lake/t', '2024-01-02 00:00:00') -- ts AS OF
  * SELECT * FROM graft_iceberg('/lake/i')          -- current snapshot
  * SELECT * FROM graft_iceberg('/lake/i', 22)      -- snapshot id
  * SELECT * FROM graft_iceberg('/lake/i', 'v1.0')  -- ref (tag/branch)
  * SELECT * FROM graft_hudi('/lake/h')             -- latest commit
  * SELECT * FROM graft_hudi('/lake/h', '2024..')   -- time travel
  * SELECT * FROM graft_iceberg_changelog('/lake/i')        -- full history
  * SELECT * FROM graft_iceberg_changelog('/lake/i', 2, 5)  -- (from, to]
  * SELECT * FROM graft_delta_cdf('/lake/t', 1)             -- CDF from v1
  * SELECT * FROM graft_hudi_incremental('/lake/h', '2024..') -- (begin, tip]
  * SELECT * FROM graft_delta_history('/lake/t')       -- DESCRIBE HISTORY
  * SELECT * FROM graft_iceberg_snapshots('/lake/i')   -- snapshots meta
  * SELECT * FROM graft_hudi_timeline('/lake/h')       -- .hoodie timeline
  * }}}
  *
  * Each TVF resolves to the reader's ANALYZED plan, so everything the
  * programmatic path earned — one-scan snapshots, partition pruning,
  * DV/delete merges, column mapping, field-id resolution — applies
  * verbatim to the SQL spelling. Registered by [[graft.GraftExtensions]]
  * (`spark.sql.extensions`) or [[ensureRegistered]]. */
object LakeTableFunctions {

  private def str(e: Expression): String = e.eval() match {
    case s: UTF8String => s.toString
    case other => String.valueOf(other)
  }
  private def num(e: Expression): Long =
    e.eval().asInstanceOf[Number].longValue

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    // second arg: a numeric version, or a STRING timestamp —
    // `FROM graft_delta('/t', '2024-01-02 00:00:00')` (TIMESTAMP AS OF)
    (FunctionIdentifier("graft_delta"),
      new ExpressionInfo(getClass.getName, "graft_delta"),
      (args: Seq[Expression]) => plan(args.lift(1) match {
        case Some(a) if a.dataType.isInstanceOf[
            org.apache.spark.sql.types.StringType] =>
          graft.sources.DeltaRead.snapshotAt(
            SparkSession.active, str(args.head),
            java.sql.Timestamp.valueOf(str(a)).getTime)
        case other => graft.sources.DeltaRead.snapshot(
          SparkSession.active, str(args.head),
          versionAsOf = other.map(num))
      })),
    // second arg: a numeric snapshot id, or a STRING ref name (tag /
    // branch) — `FROM graft_iceberg('/t', 'v1.0')`
    (FunctionIdentifier("graft_iceberg"),
      new ExpressionInfo(getClass.getName, "graft_iceberg"),
      (args: Seq[Expression]) => plan(args.lift(1) match {
        case Some(a) if a.dataType.isInstanceOf[
            org.apache.spark.sql.types.StringType] =>
          graft.sources.IcebergRead.snapshotAtRef(
            SparkSession.active, str(args.head), str(a))
        case other => graft.sources.IcebergRead.snapshot(
          SparkSession.active, str(args.head), snapshotId = other.map(num))
      })),
    (FunctionIdentifier("graft_hudi"),
      new ExpressionInfo(getClass.getName, "graft_hudi"),
      (args: Seq[Expression]) => plan(graft.sources.HudiRead.snapshot(
        SparkSession.active, str(args.head),
        asOf = args.lift(1).map(str)))),
    // Arrow IPC files (dir / glob / file): SELECT * FROM graft_arrow('/p')
    (FunctionIdentifier("graft_arrow"),
      new ExpressionInfo(getClass.getName, "graft_arrow"),
      (args: Seq[Expression]) => plan(SparkSession.active.read
        .format("arrow").load(str(args.head)))),
    // bucketed graft-lake tables WITHOUT configuring a catalog:
    // SELECT * FROM graft_bucketed('/p'[, version]) — resolves to the
    // same V2 relation the catalog serves, so SPJ / bucket pruning /
    // manifest COUNT(*) / runtime filtering all apply to the SQL
    // spelling; the optional second argument pins a retained manifest
    // version (time travel over the MVCC history)
    (FunctionIdentifier("graft_bucketed"),
      new ExpressionInfo(getClass.getName, "graft_bucketed"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          .create(graft.sources.BucketedLake.tableFor(
            SparkSession.active, str(args.head),
            asOf = args.lift(1).map(a => num(a))), None, None)),
    // ONE-ROW table summary (DESCRIBE DETAIL shape): layout, live
    // totals, key-NDV estimate, bloom coverage — pure metadata
    (FunctionIdentifier("graft_bucketed_stats"),
      new ExpressionInfo(getClass.getName, "graft_bucketed_stats"),
      (args: Seq[Expression]) => plan(graft.sources.BucketedLake
        .stats(SparkSession.active, str(args.head),
          args.lift(1).map(num)))),
    // bucketed-lake retained history: one row per manifest version
    // (version, operation, files, rows, bytes, txn_watermarks) —
    // inspect the MVCC timeline before vacuuming or time-traveling
    (FunctionIdentifier("graft_bucketed_history"),
      new ExpressionInfo(getClass.getName, "graft_bucketed_history"),
      (args: Seq[Expression]) => plan(graft.sources.BucketedLake
        .history(SparkSession.active, str(args.head)))),
    // FILE-LEVEL metadata of a bucketed-lake snapshot (Iceberg `files`
    // shape): SELECT * FROM graft_bucketed_files('/p'[, version]) —
    // (file, bucket, partition, rows, bytes, has_stats, bloom_cols),
    // one manifest read, zero data IO
    (FunctionIdentifier("graft_bucketed_files"),
      new ExpressionInfo(getClass.getName, "graft_bucketed_files"),
      (args: Seq[Expression]) => plan(graft.sources.BucketedLake
        .files(SparkSession.active, str(args.head),
          args.lift(1).map(num)))),
    // fragment-level manifest observability (incremental-delta layer):
    // SELECT * FROM graft_bucketed_fragments('/p') — one row per
    // retained manifest FILE: full/delta kind, chain depth, base,
    // add/remove counts, resolved live-file count (null = torn chain:
    // run repair()), on-disk bytes
    (FunctionIdentifier("graft_bucketed_fragments"),
      new ExpressionInfo(getClass.getName, "graft_bucketed_fragments"),
      (args: Seq[Expression]) => plan(graft.sources.BucketedLake
        .fragments(SparkSession.active, str(args.head)))),
    // bucketed-lake CHANGE DATA FEED between retained MVCC versions
    // (from EXCLUSIVE, to inclusive; `to` defaults to the current tip):
    // SELECT * FROM graft_bucketed_changes('/p', 1[, 3]) — table columns
    // + _change_type + _commit_version, merge commits served from their
    // precise row-level change files
    (FunctionIdentifier("graft_bucketed_changes"),
      new ExpressionInfo(getClass.getName, "graft_bucketed_changes"),
      (args: Seq[Expression]) => plan {
        val s = SparkSession.active
        val path = str(args.head)
        // default tip = the COMMIT POINTER (never an orphan manifest a
        // crashed committer left above it)
        val to = args.lift(2).map(num).getOrElse(
          graft.sources.BucketedLake.currentVersion(s, path).getOrElse(0L))
        graft.sources.BucketedLake.changes(s, path, num(args(1)), to)
      }),
    // live incremental aggregate views: SELECT * FROM graft_ivm('/view')
    // (tombstones filtered, avg_<c> derived — the persisted spec drives it)
    (FunctionIdentifier("graft_ivm"),
      new ExpressionInfo(getClass.getName, "graft_ivm"),
      (args: Seq[Expression]) => plan(graft.streaming.IncrementalAgg
        .readByPath(SparkSession.active, str(args.head)))),
    // row-level change history of an Iceberg table, upsert/delete
    // snapshots included: graft_iceberg_changelog(path[, fromSnapshotId
    // [, toSnapshotId]]) → (version, change_type, data columns)
    (FunctionIdentifier("graft_iceberg_changelog"),
      new ExpressionInfo(getClass.getName, "graft_iceberg_changelog"),
      (args: Seq[Expression]) => plan(graft.sources.IcebergRead.changelog(
        SparkSession.active, str(args.head),
        fromSnapshotId = args.lift(1).map(num),
        toSnapshotId = args.lift(2).map(num)))),
    // Delta CHANGE DATA FEED: graft_delta_cdf(path, fromVersion
    // [, toVersion]) → data columns + (_change_type, _commit_version),
    // real cdc pre/postimages included
    (FunctionIdentifier("graft_delta_cdf"),
      new ExpressionInfo(getClass.getName, "graft_delta_cdf"),
      (args: Seq[Expression]) => plan(graft.sources.DeltaRead.changes(
        SparkSession.active, str(args.head), num(args(1)),
        args.lift(2).map(num).getOrElse(graft.sources.DeltaRead
          .latestVersion(SparkSession.active, str(args.head)))))),
    // Hudi INCREMENTAL pull: graft_hudi_incremental(path, beginInstant
    // [, endInstant]) → rows committed in (begin, end]
    (FunctionIdentifier("graft_hudi_incremental"),
      new ExpressionInfo(getClass.getName, "graft_hudi_incremental"),
      (args: Seq[Expression]) => plan(graft.sources.HudiRead.incremental(
        SparkSession.active, str(args.head), str(args(1)),
        endInstant = args.lift(2).map(str)))),
    // DESCRIBE HISTORY: graft_delta_history(path) → (version, operation,
    // num_added_files, num_removed_files, num_cdc_files, data_change)
    (FunctionIdentifier("graft_delta_history"),
      new ExpressionInfo(getClass.getName, "graft_delta_history"),
      (args: Seq[Expression]) => plan(graft.sources.DeltaRead.history(
        SparkSession.active, str(args.head)))),
    // Iceberg `snapshots` metadata table: graft_iceberg_snapshots(path)
    // → (snapshot_id, timestamp_ms, operation, data_files, delete_files)
    (FunctionIdentifier("graft_iceberg_snapshots"),
      new ExpressionInfo(getClass.getName, "graft_iceberg_snapshots"),
      (args: Seq[Expression]) => plan(graft.sources.IcebergRead.snapshotsMeta(
        SparkSession.active, str(args.head)))),
    // Hudi timeline: graft_hudi_timeline(path) → (instant, action, state)
    (FunctionIdentifier("graft_hudi_timeline"),
      new ExpressionInfo(getClass.getName, "graft_hudi_timeline"),
      (args: Seq[Expression]) => plan(graft.sources.HudiRead.timeline(
        SparkSession.active, str(args.head)))))

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.tableFunctionRegistry
    registrations.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }
}
