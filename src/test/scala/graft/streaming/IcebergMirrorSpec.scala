package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite
import graft.sources.IcebergRead

/** Continuous DELTA → ICEBERG replication over the change-feed tail —
  * the XTable idea as a live stream: graft-delta tail →
  * [[LakeMirror.applyBatchIceberg]] (equality-delete upserts + delete
  * commits, snapshot-id idempotence for exactly-once across replays). */
class IcebergMirrorSpec extends SparkSuite {

  import spark.implicits._

  test("delta tail mirrors into an Iceberg table; replays are no-ops") {
    val source = Files.createTempDirectory("d2i-src").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
        .toDF("id", "item", "par"), source, Seq("par"))
    // v1: rewrite partition a — update id 1, drop id 2, add id 4
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a"), (4L, "gear", "a")).toDF("id", "item", "par"),
      source, "par", "a")

    val target = Files.createTempDirectory("d2i-dst").resolve("t").toString
    val ckpt = Files.createTempDirectory("d2i-ckpt").toString
    val rowSchema = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType), StructField("par", StringType)))
    val fields = Seq((1, "id", "long"), (2, "item", "string"),
      (3, "par", "string"))
    val epochs = scala.collection.mutable.ArrayBuffer.empty[(Long, DataFrame)]
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta").option("path", source).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, epoch: Long) =>
          epochs.synchronized { epochs += ((epoch, b.localCheckpoint(true))) }
          LakeMirror.applyBatchIceberg(spark, b, target, Seq("id"),
            fields, rowSchema, epoch)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    def replica(): Seq[(Long, String, String)] = IcebergRead.snapshot(spark, target)
      .select("id", "item", "par").as[(Long, String, String)]
      .collect().toSeq.sorted
    val expected = Seq((1L, "widget-v2", "a"), (3L, "nut", "b"), (4L, "gear", "a"))
    assert(replica() === expected, "id 2 deleted, id 1 updated, id 4 added")

    // replay the last epoch verbatim (foreachBatch's at-least-once
    // shape): duplicate snapshot ids are skipped
    val (lastEpoch, lastBatch) = epochs.synchronized(epochs.last)
    LakeMirror.applyBatchIceberg(spark, lastBatch, target, Seq("id"),
      fields, rowSchema, lastEpoch)
    assert(replica() === expected, "replayed epochs must be no-ops")

    // the source grows; the tail resumes and the mirror follows
    graft.sink.DeltaWrite.append(
      Seq((5L, "cog", "b")).toDF("id", "item", "par").coalesce(1),
      source, Seq("par"))
    run()
    assert(replica() === expected :+ ((5L, "cog", "b")))

    // a RESET checkpoint (epoch behind what this stream already
    // mirrored) fails loudly instead of silently dropping the batch
    val (e0, b0) = epochs.synchronized(epochs.head)
    val err = intercept[IllegalStateException] {
      LakeMirror.applyBatchIceberg(spark, b0, target, Seq("id"),
        fields, rowSchema, e0)
    }
    assert(err.getMessage.contains("behind already-mirrored epoch"))

    // a DIFFERENT stream id is a different snapshot-id namespace: no
    // collision, no false replay-skip — two sources into one target
    LakeMirror.applyBatchIceberg(spark,
      Seq((0L, "insert", """{"id":9,"item":"other","par":"c"}"""))
        .toDF("version", "change_type", "row"),
      target, Seq("id"), fields, rowSchema, 0L, streamId = "second-stream")
    assert(replica() === expected ++ Seq((5L, "cog", "b"), (9L, "other", "c")))
  }

  test("mirror chains compose through an Iceberg middle (A -> B -> C)") {
    // A: a Delta table with an update + a delete in its history
    val a = Files.createTempDirectory("chain-a").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
        .toDF("id", "item", "par"), a, Seq("par"))
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a"), (4L, "gear", "a")).toDF("id", "item", "par"),
      a, "par", "a")
    val rowSchema = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType), StructField("par", StringType)))
    val fields = Seq((1, "id", "long"), (2, "item", "string"),
      (3, "par", "string"))
    // A -> B: delta tail into a REAL Iceberg table
    val b = Files.createTempDirectory("chain-b").resolve("t").toString
    val ckptAB = Files.createTempDirectory("chain-ab-ckpt").toString
    val qab = spark.readStream.format("graft-delta").option("path", a).load()
      .writeStream.option("checkpointLocation", ckptAB)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        LakeMirror.applyBatchIceberg(spark, batch, b, Seq("id"),
          fields, rowSchema, epoch, streamId = ckptAB)
      }
      .start()
    try qab.processAllAvailable() finally qab.stop()
    // B -> C: the ICEBERG CHANGELOG tail (upsert/delete snapshots emit
    // change rows) into a graft lake replica
    val c = graft.sink.LakeTable(
      path = Files.createTempDirectory("chain-c").resolve("t").toString,
      tableName = "chain_c", recordKeyFields = Seq("id"),
      precombineField = "version")
    val ckptBC = Files.createTempDirectory("chain-bc-ckpt").toString
    val qbc = spark.readStream.format("graft-iceberg").option("path", b).load()
      .writeStream.option("checkpointLocation", ckptBC)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LakeMirror.applyBatch(spark, batch, c, rowSchema)
      }
      .start()
    try qbc.processAllAvailable() finally qbc.stop()
    val endState = graft.sink.MergeWriter.readView(spark, c)
      .select("id", "item", "par").as[(Long, String, String)]
      .collect().toSeq.sorted
    assert(endState === Seq((1L, "widget-v2", "a"), (3L, "nut", "b"),
      (4L, "gear", "a")),
      "C must equal A's end state after two mirror hops")
  }
}
