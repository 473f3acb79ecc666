package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite
import graft.sources.HudiRead

/** Continuous DELTA → HUDI replication: graft-delta tail →
  * [[LakeMirror.applyBatchHudi]] (real-layout COW upserts + hard
  * deletes, timeline-instant idempotence for exactly-once replays).
  * With `IcebergMirrorSpec` this closes any→any: every format this
  * library tails can be mirrored into every format it writes. */
class HudiMirrorSpec extends SparkSuite {

  import spark.implicits._

  test("delta tail mirrors into a Hudi COW table; replays are no-ops") {
    val source = Files.createTempDirectory("d2h-src").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
        .toDF("id", "item", "par"), source, Seq("par"))
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a"), (4L, "gear", "a")).toDF("id", "item", "par"),
      source, "par", "a")

    val target = Files.createTempDirectory("d2h-dst").resolve("t").toString
    val ckpt = Files.createTempDirectory("d2h-ckpt").toString
    val rowSchema = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType), StructField("par", StringType)))
    val epochs = scala.collection.mutable.ArrayBuffer.empty[(Long, DataFrame)]
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta").option("path", source).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, epoch: Long) =>
          epochs.synchronized { epochs += ((epoch, b.localCheckpoint(true))) }
          LakeMirror.applyBatchHudi(spark, b, target, "id", rowSchema, epoch)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    def replica(): Seq[(Long, String)] = HudiRead.snapshot(spark, target)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    val expected = Seq((1L, "widget-v2"), (3L, "nut"), (4L, "gear"))
    assert(replica() === expected, "id 2 deleted, id 1 updated, id 4 added")

    // replay the last epoch verbatim (foreachBatch's at-least-once
    // shape): completed instants are skipped
    val (lastEpoch, lastBatch) = epochs.synchronized(epochs.last)
    LakeMirror.applyBatchHudi(spark, lastBatch, target, "id", rowSchema,
      lastEpoch)
    assert(replica() === expected, "replayed epochs must be no-ops")

    // the source grows; the tail resumes and the mirror follows
    graft.sink.DeltaWrite.append(
      Seq((5L, "cog", "b")).toDF("id", "item", "par").coalesce(1),
      source, Seq("par"))
    run()
    assert(replica() === expected :+ ((5L, "cog")))

    // a RESET checkpoint (epoch behind what this stream already
    // mirrored) fails loudly instead of silently dropping the batch
    val (e0, b0) = epochs.synchronized(epochs.head)
    val err = intercept[IllegalStateException] {
      LakeMirror.applyBatchHudi(spark, b0, target, "id", rowSchema, e0)
    }
    assert(err.getMessage.contains("behind already-mirrored epoch"))

    // a DIFFERENT stream id is a different commit namespace: no
    // collision, no false replay-skip — the two-sources-one-target shape
    LakeMirror.applyBatchHudi(spark,
      Seq((0L, "insert", """{"id":9,"item":"other","par":"c"}"""))
        .toDF("version", "change_type", "row"),
      target, "id", rowSchema, 0L, streamId = "second-stream")
    assert(replica() === expected ++ Seq((5L, "cog"), (9L, "other")))
  }

  test("MOR mirror leg: deltacommit log appends, tombstones, compaction folds") {
    val target = Files.createTempDirectory("d2hmor").resolve("t").toString
    val rowSchema = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType), StructField("par", StringType)))
    def batch(rows: Seq[(Long, String, String)]): org.apache.spark.sql.DataFrame =
      rows.toDF("version", "change_type", "row")
    // epoch 0: inserts across two partitions — LOG-ONLY groups (no base)
    LakeMirror.applyBatchHudiMor(spark, batch(Seq(
      (0L, "insert", """{"id":1,"item":"widget","par":"a"}"""),
      (0L, "insert", """{"id":2,"item":"bolt","par":"a"}"""),
      (0L, "insert", """{"id":3,"item":"nut","par":"b"}"""))),
      target, "id", rowSchema, 0L, streamId = "mor",
      partitionField = Some("par"))
    def snap(): Seq[(Long, String, String)] = HudiRead.snapshot(spark, target)
      .selectExpr("id", "item", "par").as[(Long, String, String)]
      .collect().toSeq.sorted
    assert(snap() === Seq((1L, "widget", "a"), (2L, "bolt", "a"),
      (3L, "nut", "b")))
    // epoch 1: update id 1, TOMBSTONE id 2, new id 4 in a new partition
    val e1 = batch(Seq(
      (1L, "upsert", """{"id":1,"item":"widget-v2","par":"a"}"""),
      (1L, "delete", """{"id":2,"item":null,"par":"a"}"""),
      (1L, "insert", """{"id":4,"item":"gear","par":"c"}""")))
    LakeMirror.applyBatchHudiMor(spark, e1, target, "id", rowSchema, 1L,
      streamId = "mor", partitionField = Some("par"))
    val expected = Seq((1L, "widget-v2", "a"), (3L, "nut", "b"),
      (4L, "gear", "c"))
    assert(snap() === expected, "log merge: latest wins, tombstone drops id 2")
    // the timeline carries deltacommits only (no base rewrites happened)
    val instants = HudiRead.completedInstants(spark, target)
    assert(instants.size === 2)
    // replay of the LAST epoch is a no-op (instant on the timeline)
    LakeMirror.applyBatchHudiMor(spark, e1, target, "id", rowSchema, 1L,
      streamId = "mor", partitionField = Some("par"))
    assert(snap() === expected)
    // a reset checkpoint (earlier epoch) fails loudly
    val err = intercept[IllegalStateException] {
      LakeMirror.applyBatchHudiMor(spark, batch(Seq(
        (0L, "insert", """{"id":9,"item":"x","par":"a"}"""))),
        target, "id", rowSchema, 0L, streamId = "mor",
        partitionField = Some("par"))
    }
    assert(err.getMessage.contains("behind already-mirrored epoch"))
    // compaction folds the logs into bases; the snapshot is unchanged
    graft.sink.HudiCompact.compact(spark, target, "999999999999999990")
    assert(snap() === expected)
  }

  test("partition-field mirroring routes rows into hive-style partitions") {
    val target = Files.createTempDirectory("d2h-part").resolve("t").toString
    val rowSchema = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType), StructField("par", StringType)))
    def batch(rows: Seq[(Long, String, String)]): DataFrame =
      rows.map { case (v, ct, row) => (v, ct, row) }
        .toDF("version", "change_type", "row")
    // epoch 0: inserts across two partitions
    LakeMirror.applyBatchHudi(spark, batch(Seq(
      (0L, "insert", """{"id":1,"item":"widget","par":"a"}"""),
      (0L, "insert", """{"id":2,"item":"bolt","par":"a"}"""),
      (0L, "insert", """{"id":3,"item":"nut","par":"b"}"""))),
      target, "id", rowSchema, 0L, streamId = "pf",
      partitionField = Some("par"))
    // epoch 1: update id 1 (partition a), delete id 3 (partition b),
    // new id 4 in a NEW partition c
    LakeMirror.applyBatchHudi(spark, batch(Seq(
      (1L, "upsert", """{"id":1,"item":"widget-v2","par":"a"}"""),
      (1L, "delete", """{"id":3,"item":null,"par":"b"}"""),
      (1L, "insert", """{"id":4,"item":"gear","par":"c"}"""))),
      target, "id", rowSchema, 1L, streamId = "pf",
      partitionField = Some("par"))
    val rows = HudiRead.snapshot(spark, target)
      .selectExpr("id", "item", "par").as[(Long, String, String)]
      .collect().toSeq.sorted
    assert(rows === Seq((1L, "widget-v2", "a"), (2L, "bolt", "a"),
      (4L, "gear", "c")),
      "partition column restored from the hive-style directory names")
  }
}
