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

    // replay every epoch verbatim: completed instants are skipped
    epochs.synchronized(epochs.toSeq).foreach { case (epoch, b) =>
      LakeMirror.applyBatchHudi(spark, b, target, "id", rowSchema, epoch)
    }
    assert(replica() === expected, "replayed epochs must be no-ops")

    // the source grows; the tail resumes and the mirror follows
    graft.sink.DeltaWrite.append(
      Seq((5L, "cog", "b")).toDF("id", "item", "par").coalesce(1),
      source, Seq("par"))
    run()
    assert(replica() === expected :+ ((5L, "cog")))
  }
}
