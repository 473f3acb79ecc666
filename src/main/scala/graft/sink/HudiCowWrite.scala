package graft.sink

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DeletionVectors, HudiRead}

/** Apache Hudi COPY-ON-WRITE upsert committer — Hudi as a CDC TARGET,
  * completing the write-side trifecta next to [[DeltaWrite.appendTxn]]
  * and [[IcebergWrite.upsert]]: batches land in the REAL Hudi layout
  * (timeline instants, `<fileId>_<token>_<instant>.parquet` bases, meta
  * columns) with Hudi's own upsert shape — only the file groups holding
  * updated keys are rewritten, carried-over rows keep their ORIGINAL
  * `_hoodie_commit_time` (so incremental pulls see exactly the changed
  * rows), and new keys open a fresh file group.
  *
  * Exactly-once: an already-completed instant is SKIPPED before any
  * byte is written (Hudi's instant-uniqueness contract — the timeline
  * is the watermark), so checkpointed at-least-once replay composes
  * into exactly-once like the Delta txn and Iceberg snapshot-id paths.
  *
  * Scale shape: the key→file-group map is one column-pruned scan of
  * the affected partition's bases joined to the batch's keys (driver
  * state = the UPDATED keys' file assignments, bounded by batch size —
  * the same planning state Hudi's own write client collects from its
  * index); each rewritten group is one carried-rows anti-join ∪ batch
  * semi-join. Single named partition per call (the fixture-writer
  * scope; fan out partitions upstream like `MultiTableSink` does). */
object HudiCowWrite {

  /** Upsert `batch` (must carry the payload columns; meta columns are
    * stamped here) keyed by `keyCol`. Returns false when `instant` is
    * already on the timeline (replayed batch). */
  def upsert(batch: DataFrame, table: String, keyCol: String,
             instant: String, partition: String = "part=0",
             maxFiles: Int = 1000000): Boolean = {
    val spark = batch.sparkSession
    require(instant.nonEmpty && instant.forall(_.isDigit),
      s"instant must be a numeric timeline string, got '$instant'")
    require(partition.nonEmpty, "partition directory name required")
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
    } else if (HudiRead.completedInstants(spark, table).contains(instant))
      return false // replayed batch: the timeline is the watermark

    val keyed = batch
      .withColumn("_hoodie_record_key", col(keyCol).cast("string"))
      .withColumn("_hoodie_commit_time", lit(instant))
      .localCheckpoint(false)
    val visible = HudiRead.visibleBaseFiles(spark, table, maxFiles)
      .filter(_.partition == partition)
    if (visible.isEmpty) {
      HudiMorWrite.writeBaseFile(keyed, table, partition,
        s"fg-$instant", instant)
      HudiMorWrite.completeInstant(spark, table, instant, "commit")
      return true
    }
    def qualified(p: String): String =
      DeletionVectors.sparkPathString(
        new Path(p).getFileSystem(conf).makeQualified(new Path(p)))
    val byQualified = visible.map(b => qualified(b.path) -> b).toMap
    val old = spark.read.parquet(visible.map(_.path): _*)
    val updateKeys = keyed.select(col("_hoodie_record_key")).distinct()
      .localCheckpoint(false)
    // UPDATED keys' current file assignment — bounded by batch size
    val keyFile = old
      .select(col("_hoodie_record_key"),
        col("_metadata.file_path").as("__f"))
      .join(updateKeys, Seq("_hoodie_record_key"), "left_semi")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val keysPerFile: Map[String, Seq[String]] =
      keyFile.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    import spark.implicits._
    keysPerFile.toSeq.sortBy(_._1).foreach { case (q, keys) =>
      val bf = byQualified.getOrElse(q, throw new IllegalStateException(
        s"file $q unknown to the visible base set"))
      // carried rows keep their ORIGINAL commit time; batch rows for
      // this group's keys come in stamped with the new instant
      val carried = spark.read.parquet(bf.path)
        .join(updateKeys, Seq("_hoodie_record_key"), "left_anti")
      val fresh = keyed.join(keys.toDF("_hoodie_record_key"),
        Seq("_hoodie_record_key"), "left_semi")
      HudiMorWrite.writeBaseFile(carried.unionByName(fresh),
        table, partition, bf.fileId, instant)
    }
    // brand-new keys open a fresh file group
    val existingKeys = old.select(col("_hoodie_record_key"))
    val newRows = keyed.join(existingKeys, Seq("_hoodie_record_key"), "left_anti")
    if (!newRows.isEmpty)
      HudiMorWrite.writeBaseFile(newRows, table, partition,
        s"fg-$instant", instant)
    HudiMorWrite.completeInstant(spark, table, instant, "commit")
    true
  }

  /** Hard-DELETE `keys` (one row per key value in `keyCol`): every file
    * group holding a deleted key is rewritten WITHOUT those rows (an
    * emptied group persists as a zero-row base — correct, if inelegant,
    * COW semantics). Same instant-uniqueness idempotence as [[upsert]]. */
  def deleteKeys(keys: DataFrame, table: String, keyCol: String,
                 instant: String, partition: String = "part=0",
                 maxFiles: Int = 1000000): Boolean = {
    val spark = keys.sparkSession
    require(instant.nonEmpty && instant.forall(_.isDigit),
      s"instant must be a numeric timeline string, got '$instant'")
    if (HudiRead.completedInstants(spark, table).contains(instant))
      return false
    val conf = spark.sparkContext.hadoopConfiguration
    val visible = HudiRead.visibleBaseFiles(spark, table, maxFiles)
      .filter(_.partition == partition)
    if (visible.isEmpty) return true // nothing to delete from
    def qualified(p: String): String =
      DeletionVectors.sparkPathString(
        new Path(p).getFileSystem(conf).makeQualified(new Path(p)))
    val byQualified = visible.map(b => qualified(b.path) -> b).toMap
    val delKeys = keys.select(col(keyCol).cast("string")
      .as("_hoodie_record_key")).distinct().localCheckpoint(false)
    val affected = spark.read.parquet(visible.map(_.path): _*)
      .select(col("_hoodie_record_key"), col("_metadata.file_path").as("__f"))
      .join(delKeys, Seq("_hoodie_record_key"), "left_semi")
      .select("__f").distinct().collect().map(_.getString(0)).toSeq.sorted
    if (affected.isEmpty) return true
    affected.foreach { q =>
      val bf = byQualified.getOrElse(q, throw new IllegalStateException(
        s"file $q unknown to the visible base set"))
      val carried = spark.read.parquet(bf.path)
        .join(delKeys, Seq("_hoodie_record_key"), "left_anti")
      HudiMorWrite.writeBaseFile(carried, table, partition, bf.fileId, instant)
    }
    HudiMorWrite.completeInstant(spark, table, instant, "commit")
    true
  }
}
