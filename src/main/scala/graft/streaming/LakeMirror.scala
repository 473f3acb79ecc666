package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sink.{LakeTable, MergeWriter}

/** Continuous lake-to-lake replication: any table this library can tail
  * (`graft-delta` / `graft-iceberg` / `graft-hudi`) mirrored into a
  * graft lake table over its streaming change feed.
  *
  * Per micro-batch: change rows `(version, change_type, row-json)` are
  * parsed against the user schema, split into upserts (`insert` /
  * `upsert` / `update_postimage` — the three tails' row classes) and
  * `delete`s, and applied through [[MergeWriter]]'s idempotent keyed
  * merges with the source VERSION as the precombine — so checkpointed
  * at-least-once replay composes into an exactly-once replica across a
  * kill/restart (proven per format by `DeltaTailReplicationSpec` /
  * `LakeTailReplicationSpec`). A delete whose key is also upserted in
  * the same batch is dropped (a rewrite emits delete+insert for the
  * same key; the upsert's version wins), deletes apply first.
  *
  * Scale shape: everything is per-batch DataFrame work — json parse is
  * a codegen projection, the upsert/delete merges touch only affected
  * partitions, and the tails' `maxFilesPerTrigger` bounds a batch, so a
  * backfill of a 10⁶-file history streams through bounded increments. */
object LakeMirror {

  /** change classes admitted as upserts across the three tails. */
  private val UpsertTypes = Seq("insert", "upsert", "update_postimage")

  /** Apply one micro-batch of change rows to the replica. */
  def applyBatch(spark: SparkSession, batch: DataFrame, lake: LakeTable,
                 rowSchema: StructType): Unit = {
    val keys = lake.recordKeyFields
    val parsed = batch
      .select(col("version"), col("change_type"),
        from_json(col("row"), rowSchema).as("r"))
      .select(Seq(col("version"), col("change_type")) ++
        rowSchema.fieldNames.toSeq.map(n => col(s"r.`$n`")): _*)
    val ups = parsed.where(col("change_type").isin(UpsertTypes: _*))
      .drop("change_type")
    val dels = parsed.where(col("change_type") === "delete")
      .drop("change_type")
      .join(ups.select(keys.map(col): _*).distinct(), keys, "left_anti")
    if (!dels.isEmpty) MergeWriter.delete(spark, dels, lake)
    if (!ups.isEmpty) MergeWriter.upsert(spark, ups, lake)
  }

  /** Apply one micro-batch INTO AN ICEBERG TABLE — continuous
    * format-to-format replication (the XTable idea as a live stream):
    * changes are elected latest-per-key by source version, upserts land
    * through [[IcebergWrite.upsert]] (equality-delete + data at one
    * sequence number) and hard deletes through
    * [[IcebergWrite.deleteKeys]]. Exactly-once across replays comes
    * from snapshot-id idempotence: each epoch commits deterministic
    * snapshot ids, and a replayed epoch's duplicate id is refused by
    * the committer and SKIPPED here — the Iceberg-side analog of the
    * SetTransaction watermark. */
  def applyBatchIceberg(spark: SparkSession, batch: DataFrame, target: String,
                        keyNames: Seq[String],
                        fields: Seq[(Int, String, String)],
                        rowSchema: StructType, epochId: Long): Unit = {
    import graft.sink.IcebergWrite
    val parsed = batch
      .select(col("version"), col("change_type"),
        from_json(col("row"), rowSchema).as("r"))
      .select(Seq(col("version"), col("change_type")) ++
        rowSchema.fieldNames.toSeq.map(n => col(s"r.`$n`")): _*)
    // latest change per key wins; within one version a rewrite emits
    // delete+insert and a CDF update emits pre+postimage for the SAME
    // key — rank the classes so the post-state wins the tie
    val rank = when(col("change_type") === "update_preimage", 0)
      .when(col("change_type") === "delete", 1)
      .otherwise(2) // insert / upsert / update_postimage
    val payload = Seq("version", "change_type") ++
      rowSchema.fieldNames.toSeq.filterNot(keyNames.contains)
    val latest = parsed.groupBy(keyNames.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(col("version"), rank)).as("_w"))
      .select(keyNames.map(col) ++ Seq(col("_w.*")): _*)
    val ups = latest.where(col("change_type").isin(UpsertTypes: _*))
      .drop("version", "change_type")
      .select(rowSchema.fieldNames.toSeq.map(col): _*)
    val dels = latest.where(col("change_type") === "delete")
      .select(keyNames.map(col): _*)
    // upsert/deleteKeys skip replayed snapshot ids BEFORE writing bytes
    val upsertSnap = 1000000L + epochId * 2
    if (!ups.isEmpty)
      IcebergWrite.upsert(ups, target, keyNames, fields,
        snapshotId = upsertSnap, sequenceNumber = upsertSnap): Unit
    if (!dels.isEmpty)
      IcebergWrite.deleteKeys(dels, target, keyNames, fields,
        snapshotId = upsertSnap + 1, sequenceNumber = upsertSnap + 1): Unit
  }

  /** Apply one micro-batch INTO A REAL-LAYOUT HUDI COW TABLE — the
    * third target next to the graft lake and Iceberg: latest-per-key
    * election like [[applyBatchIceberg]], upserts through
    * [[graft.sink.HudiCowWrite.upsert]] and hard deletes through
    * [[graft.sink.HudiCowWrite.deleteKeys]]; exactly-once from the
    * timeline's instant-uniqueness (deterministic per-epoch instants,
    * replays skipped before any byte is written). */
  def applyBatchHudi(spark: SparkSession, batch: DataFrame, target: String,
                     keyCol: String, rowSchema: StructType,
                     epochId: Long, partition: String = "part=0"): Unit = {
    import graft.sink.HudiCowWrite
    val parsed = batch
      .select(col("version"), col("change_type"),
        from_json(col("row"), rowSchema).as("r"))
      .select(Seq(col("version"), col("change_type")) ++
        rowSchema.fieldNames.toSeq.map(n => col(s"r.`$n`")): _*)
    val rank = when(col("change_type") === "update_preimage", 0)
      .when(col("change_type") === "delete", 1)
      .otherwise(2)
    val payload = Seq("version", "change_type") ++
      rowSchema.fieldNames.toSeq.filterNot(_ == keyCol)
    val latest = parsed.groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col): _*),
        struct(col("version"), rank)).as("_w"))
      .select(Seq(col(keyCol)) ++ Seq(col("_w.*")): _*)
    val ups = latest.where(col("change_type").isin(UpsertTypes: _*))
      .select(rowSchema.fieldNames.toSeq.map(col): _*)
    val dels = latest.where(col("change_type") === "delete").select(col(keyCol))
    // deterministic, digits-only, monotone-in-epoch instants
    val upsertInstant = (900000000000000000L + epochId * 2).toString
    if (!ups.isEmpty)
      HudiCowWrite.upsert(ups, target, keyCol, upsertInstant, partition): Unit
    if (!dels.isEmpty)
      HudiCowWrite.deleteKeys(dels, target, keyCol,
        (900000000000000000L + epochId * 2 + 1).toString, partition): Unit
  }

  /** Start the mirror stream. `format` is `delta`/`iceberg`/`hudi`;
    * `sourceOptions` pass through to the tail (`maxFilesPerTrigger`,
    * `startingVersion`, ...). `availableNow` drains the backlog to the
    * pinned tip and finishes (backfill); otherwise a processing-time
    * trigger keeps following the source. */
  def start(spark: SparkSession, format: String, source: String,
            lake: LakeTable, rowSchema: StructType, checkpoint: String,
            sourceOptions: Map[String, String] = Map.empty,
            availableNow: Boolean = false,
            triggerSeconds: Int = 60): StreamingQuery = {
    require(Seq("delta", "iceberg", "hudi").contains(format),
      s"unsupported mirror format '$format' (delta|iceberg|hudi)")
    val stream = spark.readStream.format(s"graft-$format")
      .option("path", source).options(sourceOptions).load()
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        applyBatch(spark, b, lake, rowSchema)
      }
      .start()
  }
}
