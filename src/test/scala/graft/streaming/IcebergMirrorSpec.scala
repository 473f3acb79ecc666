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

    // replay every epoch verbatim: duplicate snapshot ids are skipped
    epochs.synchronized(epochs.toSeq).foreach { case (epoch, b) =>
      LakeMirror.applyBatchIceberg(spark, b, target, Seq("id"),
        fields, rowSchema, epoch)
    }
    assert(replica() === expected, "replayed epochs must be no-ops")

    // the source grows; the tail resumes and the mirror follows
    graft.sink.DeltaWrite.append(
      Seq((5L, "cog", "b")).toDF("id", "item", "par").coalesce(1),
      source, Seq("par"))
    run()
    assert(replica() === expected :+ ((5L, "cog", "b")))
  }
}
