package graft.sink

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{DeletionVectors, HudiRead}

/** Apache Hudi COPY-ON-WRITE upsert committer — Hudi as a CDC TARGET,
  * completing the write-side trifecta next to [[DeltaWrite.appendTxn]]
  * and [[IcebergWrite.upsert]]: batches land in the REAL Hudi layout
  * (timeline instants, `<fileId>_<token>_<instant>.parquet` bases, meta
  * columns) with Hudi's own upsert shape — only the file groups holding
  * updated keys are rewritten, carried-over rows keep their ORIGINAL
  * `_hoodie_commit_time` (so incremental pulls see exactly the changed
  * rows), and new keys open a fresh file group per partition.
  *
  * Exactly-once: an already-completed instant is SKIPPED before any
  * byte is written (Hudi's instant-uniqueness contract — the timeline
  * is the watermark), so checkpointed at-least-once replay composes
  * into exactly-once like the Delta txn and Iceberg snapshot-id paths.
  *
  * Scale shape (the same plan Hudi's own write client runs):
  *  1. TAG — batch rows find their target file group via a DISTRIBUTED
  *     join against the key→file index (one column-pruned scan of the
  *     touched partitions' bases); unmatched keys open the fresh group.
  *  2. CARRY — surviving rows of every affected group come from ONE
  *     multi-file scan anti-joined to the batch's keys (no per-group
  *     read loop).
  *  3. WRITE — carried ∪ tagged rows land in ONE job shuffled by file
  *     group (`repartition(group)` + `partitionBy`), then each group's
  *     single output file is RENAMED into the Hudi base-file name —
  *     driver work is O(#groups) metadata renames, never row data.
  * Driver state is bounded by GROUP/FILE counts (the planning unit),
  * never by key or row counts; job count is CONSTANT in the number of
  * affected groups (plan-contract-pinned in HudiCowWriteSpec, probed
  * flat over 128 groups in [[graft.ScaleProbe]]).
  *
  * Partitioning: [[upsert]]/[[deleteKeys]] take one literal partition
  * directory (the unpartitioned / fixture shape); [[upsertPartitioned]]
  * / [[deleteKeysPartitioned]] route rows by a PARTITION COLUMN into
  * hive-style `field=value` directories inside the same single commit —
  * the reference's normal write mode
  * (`hoodie.datasource.write.partitionpath.field`). Keys are scoped
  * per-partition (Hudi's default non-global index): the same key in two
  * partitions is two records. */
object HudiCowWrite {

  /** Internal column names — stripped before any byte hits parquet. */
  private val PartCol = "__graft_part"
  private val FileIdCol = "__graft_file_id"
  private val GidCol = "__graft_gid"

  /** Upsert `batch` (must carry the payload columns; meta columns are
    * stamped here) keyed by `keyCol` into the single named `partition`
    * directory. Returns false when `instant` is already on the timeline
    * (replayed batch). */
  def upsert(batch: DataFrame, table: String, keyCol: String,
             instant: String, partition: String = "part=0",
             maxFiles: Int = 1000000): Boolean = {
    require(partition.nonEmpty, "partition directory name required")
    upsertCore(batch.withColumn(PartCol, lit(partition)), table, keyCol,
      instant, maxFiles)
  }

  /** Upsert with rows ROUTED BY `partitionField`'s value into hive-style
    * `field=value` partition directories — one commit spanning every
    * touched partition. The partition column itself is NOT stored in
    * the data files (the directory name carries it; [[HudiRead]]'s
    * partition-pruned scan restores it as a typed column), matching the
    * hive-style layout `lake_hudi_partitioned` reads. A null partition
    * value fails loudly. */
  def upsertPartitioned(batch: DataFrame, table: String, keyCol: String,
                        partitionField: String, instant: String,
                        maxFiles: Int = 1000000): Boolean = {
    require(batch.columns.contains(partitionField),
      s"batch has no partition column '$partitionField'")
    val routed = batch
      .withColumn(PartCol, concat(lit(s"$partitionField="),
        partitionValueOrError(partitionField, col(partitionField))))
      .drop(partitionField)
    upsertCore(routed, table, keyCol, instant, maxFiles)
  }

  /** Hive-style partition path segment from a value: null and
    * path-breaking characters (`/`, `=`) fail LOUDLY — silently nesting
    * a `a/b` value as two directory levels would corrupt the layout. */
  private def partitionValueOrError(field: String,
                                    v: org.apache.spark.sql.Column) = {
    val s = v.cast("string")
    when(v.isNull, raise_error(lit(
      s"partitioned Hudi write: null $field value — hive-style " +
        "partition paths cannot encode null")))
      .when(s.contains("/") || s.contains("="), raise_error(concat(
        lit(s"partitioned Hudi write: $field value "), s,
        lit(" contains a path-breaking character (/ or =)"))))
      .otherwise(s)
  }

  /** Hard-DELETE `keys` (one row per key value in `keyCol`) from the
    * single named `partition`: every file group holding a deleted key is
    * rewritten WITHOUT those rows (an emptied group persists as a
    * zero-row base — correct, if inelegant, COW semantics). Same
    * instant-uniqueness idempotence as [[upsert]]. */
  def deleteKeys(keys: DataFrame, table: String, keyCol: String,
                 instant: String, partition: String = "part=0",
                 maxFiles: Int = 1000000): Boolean = {
    require(partition.nonEmpty, "partition directory name required")
    deleteCore(keys.withColumn(PartCol, lit(partition)), table, keyCol,
      instant, maxFiles)
  }

  /** [[deleteKeys]] routed by `partitionField` (the key frame must carry
    * the partition column — Hudi's non-global index deletes within a
    * partition). */
  def deleteKeysPartitioned(keys: DataFrame, table: String, keyCol: String,
                            partitionField: String, instant: String,
                            maxFiles: Int = 1000000): Boolean = {
    require(keys.columns.contains(partitionField),
      s"key frame has no partition column '$partitionField'")
    val routed = keys
      .withColumn(PartCol, concat(lit(s"$partitionField="),
        partitionValueOrError(partitionField, col(partitionField))))
      .drop(partitionField)
    deleteCore(routed, table, keyCol, instant, maxFiles)
  }

  // ------------------------------------------------------------------
  // core
  // ------------------------------------------------------------------

  private def ensureTable(spark: SparkSession, table: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val hoodieDir = new Path(table, ".hoodie")
    val f = hoodieDir.getFileSystem(conf)
    if (!f.exists(hoodieDir)) {
      f.mkdirs(hoodieDir)
      val out = f.create(new Path(hoodieDir, "hoodie.properties"), true)
      try out.write(
        "hoodie.table.name=graft\nhoodie.table.type=COPY_ON_WRITE\n"
          .getBytes(UTF_8))
      finally out.close()
    }
  }

  private def qualified(conf: org.apache.hadoop.conf.Configuration,
                        p: String): String =
    DeletionVectors.sparkPathString(
      new Path(p).getFileSystem(conf).makeQualified(new Path(p)))

  /** `(qualified path → (partition, fileId))` lookup frame over the
    * visible bases — bounded by FILE count (planning metadata). */
  private def fileLookup(spark: SparkSession,
                         visible: Seq[HudiRead.BaseFile]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    visible.map(b => (qualified(conf, b.path), b.partition, b.fileId))
      .toDF("__graft_file", PartCol, FileIdCol)
  }

  /** The visible bases of the touched partitions, joined back to their
    * (partition, fileId) identity — ONE multi-file scan. */
  private def scanVisible(spark: SparkSession,
                          visible: Seq[HudiRead.BaseFile]): DataFrame =
    spark.read.parquet(visible.map(_.path): _*)
      .withColumn("__graft_file", col("_metadata.file_path"))
      .join(broadcast(fileLookup(spark, visible)), Seq("__graft_file"))
      .drop("__graft_file")

  private def upsertCore(batch: DataFrame, table: String, keyCol: String,
                         instant: String, maxFiles: Int): Boolean = {
    val spark = batch.sparkSession
    require(instant.nonEmpty && instant.forall(_.isDigit),
      s"instant must be a numeric timeline string, got '$instant'")
    ensureTable(spark, table)
    if (HudiRead.completedInstants(spark, table).contains(instant))
      return false // replayed batch: the timeline is the watermark

    val keyed = batch
      .withColumn("_hoodie_record_key", col(keyCol).cast("string"))
      .withColumn("_hoodie_commit_time", lit(instant))
      .localCheckpoint(false)
    // touched partitions: the planning unit (metadata-scale collect)
    val parts = keyed.select(PartCol).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val freshId = s"fg-$instant"
    val partsSet = parts.toSet
    val visible = HudiRead.visibleBaseFiles(spark, table, maxFiles)
      .filter(b => partsSet.contains(b.partition))

    if (visible.isEmpty) {
      // all-new table/partitions: one fresh group per partition, ONE job
      val written = writeGroups(keyed, table, instant,
        parts.map(p => (p, freshId)))
      HudiMorWrite.completeInstant(spark, table, instant, "commit",
        written.map(baseStat(_, instant)))
      return true
    }

    val old = scanVisible(spark, visible)
    val updateKeys = keyed.select(col("_hoodie_record_key"), col(PartCol))
      .distinct().localCheckpoint(false)
    // affected groups: DISTRIBUTED semi join, driver sees only the
    // (partition, fileId) list — bounded by group count, like the file
    // assignments Hudi's write client plans over
    val affected = old.select(col("_hoodie_record_key"), col(PartCol), col(FileIdCol))
      .join(updateKeys, Seq("_hoodie_record_key", PartCol), "left_semi")
      .select(PartCol, FileIdCol).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val affectedDf = {
      import spark.implicits._
      broadcast(affected.toDF(PartCol, FileIdCol))
    }
    // CARRY: one scan of the affected groups, anti-joined to the batch
    val carried =
      if (affected.isEmpty) None
      else Some(old
        .join(affectedDf, Seq(PartCol, FileIdCol), "left_semi")
        .join(updateKeys, Seq("_hoodie_record_key", PartCol), "left_anti"))
    // TAG: existing keys inherit their group, new keys open the fresh one
    val keyIndex = old.select(col("_hoodie_record_key"), col(PartCol),
      col(FileIdCol))
    val tagged = keyed
      .join(keyIndex, Seq("_hoodie_record_key", PartCol), "left")
      .withColumn(FileIdCol, coalesce(col(FileIdCol), lit(freshId)))
    val out = carried.fold(tagged)(c => c.unionByName(tagged.select(c.columns
      .map(col).toSeq: _*)))
    val groups = (affected ++ parts.map(p => (p, freshId))).distinct.sorted
    val written = writeTagged(out, table, instant, groups)
    HudiMorWrite.completeInstant(spark, table, instant, "commit",
      written.map(baseStat(_, instant)))
    true
  }

  private def deleteCore(keys: DataFrame, table: String, keyCol: String,
                         instant: String, maxFiles: Int): Boolean = {
    val spark = keys.sparkSession
    require(instant.nonEmpty && instant.forall(_.isDigit),
      s"instant must be a numeric timeline string, got '$instant'")
    if (HudiRead.completedInstants(spark, table).contains(instant))
      return false
    val delKeys = keys
      .select(col(keyCol).cast("string").as("_hoodie_record_key"), col(PartCol))
      .distinct().localCheckpoint(false)
    val parts = delKeys.select(PartCol).distinct()
      .collect().map(_.getString(0)).toSet
    val visible = HudiRead.visibleBaseFiles(spark, table, maxFiles)
      .filter(b => parts.contains(b.partition))
    if (visible.isEmpty) return true // nothing to delete from
    val old = scanVisible(spark, visible)
    val affected = old.select(col("_hoodie_record_key"), col(PartCol), col(FileIdCol))
      .join(delKeys, Seq("_hoodie_record_key", PartCol), "left_semi")
      .select(PartCol, FileIdCol).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    if (affected.isEmpty) return true
    val affectedDf = {
      import spark.implicits._
      broadcast(affected.toDF(PartCol, FileIdCol))
    }
    val carried = old
      .join(affectedDf, Seq(PartCol, FileIdCol), "left_semi")
      .join(delKeys, Seq("_hoodie_record_key", PartCol), "left_anti")
    val written = writeTagged(carried, table, instant, affected)
    // a fully-deleted group persists as a ZERO-ROW base (COW semantics):
    // one empty template file, copied per emptied group — metadata only
    val writtenGroups = written.map(w => (w._1, w._2)).toSet
    val emptied = affected.filterNot(writtenGroups.contains)
    val emptyStats =
      if (emptied.isEmpty) Nil
      else writeEmptyBases(spark, visible.head.path, table, instant, emptied)
    HudiMorWrite.completeInstant(spark, table, instant, "commit",
      (written ++ emptyStats).map(baseStat(_, instant)))
    true
  }

  // ------------------------------------------------------------------
  // one-job group writer
  // ------------------------------------------------------------------

  /** Commit write stat for one written base `(partition, fileId, size)`. */
  private def baseStat(w: (String, String, Long),
                       instant: String): HudiMorWrite.WriteStat = {
    val (partition, fileId, size) = w
    val name = s"${fileId}_0-1-2_$instant.parquet"
    HudiMorWrite.WriteStat(partition, fileId,
      if (partition.isEmpty) name else s"$partition/$name", size)
  }

  /** Write every (partition, fileId) group of `out` (rows tagged with
    * [[PartCol]]/[[FileIdCol]]) as ONE Hudi base file each, in ONE
    * shuffled Spark job: groups map to a dense integer gid (safe as a
    * `partitionBy` directory name — partition strings may carry any
    * characters), rows shuffle by gid so each group lands in exactly one
    * task, and the driver renames each group's single output file into
    * `<partition>/<fileId>_0-1-2_<instant>.parquet`. Returns the groups
    * that produced output. */
  private def writeTagged(out: DataFrame, table: String, instant: String,
                          groups: Seq[(String, String)])
      : Seq[(String, String, Long)] = {
    val spark = out.sparkSession
    val gidOf = groups.zipWithIndex.toMap
    val gidDf = {
      import spark.implicits._
      broadcast(groups.zipWithIndex
        .map { case ((p, f), g) => (p, f, g) }.toDF(PartCol, FileIdCol, GidCol))
    }
    val withGid = out.join(gidDf, Seq(PartCol, FileIdCol))
      .drop(PartCol, FileIdCol)
    writeGidFiles(withGid, table, instant,
      gidOf.map { case (pf, g) => g -> pf })
  }

  /** [[writeTagged]] for the all-new case: every row of one partition
    * goes to that partition's single fresh group. */
  private def writeGroups(keyed: DataFrame, table: String, instant: String,
                          groups: Seq[(String, String)])
      : Seq[(String, String, Long)] = {
    val spark = keyed.sparkSession
    val gidDf = {
      import spark.implicits._
      broadcast(groups.zipWithIndex
        .map { case ((p, _), g) => (p, g) }.toDF(PartCol, GidCol))
    }
    val withGid = keyed.join(gidDf, Seq(PartCol)).drop(PartCol)
    writeGidFiles(withGid, table, instant,
      groups.zipWithIndex.map { case (pf, g) => g -> pf }.toMap)
  }

  private def writeGidFiles(withGid: DataFrame, table: String, instant: String,
                            targets: Map[Int, (String, String)])
      : Seq[(String, String, Long)] = {
    val spark = withGid.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(table, s".multi-tmp-$instant")
    withGid.repartition(col(GidCol))
      .write.mode("overwrite").partitionBy(GidCol).parquet(tmp.toString)
    val f = tmp.getFileSystem(conf)
    val written = f.listStatus(tmp).toSeq
      .filter(_.getPath.getName.startsWith(s"$GidCol="))
      .map { dir =>
        val gid = dir.getPath.getName.stripPrefix(s"$GidCol=").toInt
        val (partition, fileId) = targets.getOrElse(gid,
          throw new IllegalStateException(s"unplanned group id $gid"))
        val parquets = f.listStatus(dir.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
        require(parquets.length == 1, s"group $gid produced " +
          s"${parquets.length} files — expected exactly one per file group")
        val partDir = new Path(table, partition)
        f.mkdirs(partDir)
        f.rename(parquets.head.getPath,
          new Path(partDir, s"${fileId}_0-1-2_$instant.parquet"))
        (partition, fileId, parquets.head.getLen)
      }
    f.delete(tmp, true)
    written
  }

  /** Zero-row base files for fully-deleted groups: ONE empty template
    * write (schema from a driver footer read), then a byte copy per
    * emptied group — O(#emptied) metadata work, no extra Spark jobs per
    * group. */
  private def writeEmptyBases(spark: SparkSession, schemaFile: String,
                              table: String, instant: String,
                              emptied: Seq[(String, String)])
      : Seq[(String, String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = spark.read.parquet(schemaFile).schema
    val tmp = new Path(table, s".empty-tmp-$instant")
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val f = tmp.getFileSystem(conf)
    val template = f.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        "empty base write produced no parquet"))
    val size = f.getFileStatus(template).getLen
    val out = emptied.map { case (partition, fileId) =>
      val partDir = new Path(table, partition)
      f.mkdirs(partDir)
      org.apache.hadoop.fs.FileUtil.copy(f, template, f,
        new Path(partDir, s"${fileId}_0-1-2_$instant.parquet"),
        false, conf)
      (partition, fileId, size)
    }
    f.delete(tmp, true)
    out
  }
}
