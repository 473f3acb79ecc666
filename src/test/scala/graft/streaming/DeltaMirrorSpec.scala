package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite
import graft.sources.DeltaRead

/** Continuous replication INTO a real-layout Delta table —
  * [[LakeMirror.applyBatchDelta]] (keyed MERGE commits with cdc
  * emission, SetTransaction exactly-once). With the graft-lake,
  * Iceberg, and Hudi legs this closes any→any across all four
  * layouts, and the Delta replica is itself CDF-tailable (chains
  * compose through a Delta middle). */
class DeltaMirrorSpec extends SparkSuite {

  import spark.implicits._

  test("iceberg tail mirrors into a REAL Delta table; replica is CDF-tailable") {
    // A: an Iceberg table with an upsert + delete history
    val a = Files.createTempDirectory("i2d-src").toString
    val fields = Seq((1, "id", "long"), (2, "item", "string"))
    graft.sink.IcebergWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")).toDF("id", "item"),
      a, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    graft.sink.IcebergWrite.upsert(
      Seq((1L, "widget-v2"), (4L, "gear")).toDF("id", "item"),
      a, Seq("id"), fields, snapshotId = 2L, sequenceNumber = 2L)
    graft.sink.IcebergWrite.deleteKeys(Seq(Tuple1(2L)).toDF("id"),
      a, Seq("id"), fields, snapshotId = 3L, sequenceNumber = 3L)

    val rowSchema = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType)))
    // A -> B: iceberg changelog tail into a REAL Delta table
    val b = Files.createTempDirectory("i2d-dst").resolve("t").toString
    val ckpt = Files.createTempDirectory("i2d-ckpt").toString
    val epochs = scala.collection.mutable.ArrayBuffer.empty[(Long, DataFrame)]
    val q = spark.readStream.format("graft-iceberg").option("path", a).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        epochs.synchronized { epochs += ((epoch, batch.localCheckpoint(true))) }
        LakeMirror.applyBatchDelta(spark, batch, b, Seq("id"),
          rowSchema, epoch, streamId = ckpt)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    def replica(): Seq[(Long, String)] = DeltaRead.snapshot(spark, b)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    val expected = Seq((1L, "widget-v2"), (3L, "nut"), (4L, "gear"))
    assert(replica() === expected, "id 2 deleted, id 1 updated, id 4 added")

    // replayed last epoch: skipped on the txn watermark
    val (lastEpoch, lastBatch) = epochs.synchronized(epochs.last)
    LakeMirror.applyBatchDelta(spark, lastBatch, b, Seq("id"),
      rowSchema, lastEpoch, streamId = ckpt)
    assert(replica() === expected, "replayed epoch must be a no-op")

    // the REPLICA is itself tailable: B -> C through graft-delta + the
    // graft lake reproduces the same end state (Delta-middle chain)
    val c = graft.sink.LakeTable(
      path = Files.createTempDirectory("i2d-c").resolve("t").toString,
      tableName = "i2d_c", recordKeyFields = Seq("id"),
      precombineField = "version")
    val ckptBC = Files.createTempDirectory("i2d-bc-ckpt").toString
    val qbc = spark.readStream.format("graft-delta").option("path", b).load()
      .writeStream.option("checkpointLocation", ckptBC)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LakeMirror.applyBatch(spark, batch, c, rowSchema)
      }
      .start()
    try qbc.processAllAvailable() finally qbc.stop()
    val endState = graft.sink.MergeWriter.readView(spark, c)
      .select("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(endState === expected, "C must equal A's end state after two hops")
  }

  test("mirror restarted with a WIDENED source schema evolves the Delta replica") {
    import org.apache.spark.sql.types.LongType
    val b = Files.createTempDirectory("evo-dst").resolve("t").toString
    val narrow = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType)))
    def changeBatch(rows: (Long, String, String)*): DataFrame =
      rows.toSeq.toDF("version", "change_type", "row")
    // epoch 0 under the original schema
    LakeMirror.applyBatchDelta(spark,
      changeBatch((1L, "insert", """{"id":1,"item":"widget"}"""),
        (1L, "insert", """{"id":2,"item":"bolt"}""")),
      b, Seq("id"), narrow, epochId = 0L, streamId = "evo")
    // the mirror restarts with a WIDENED row schema (source gained qty):
    // the next epoch's merge must evolve the replica in place
    val wide = StructType(Seq(StructField("id", LongType),
      StructField("item", StringType), StructField("qty", LongType)))
    LakeMirror.applyBatchDelta(spark,
      changeBatch((2L, "upsert", """{"id":2,"item":"bolt-v2","qty":7}"""),
        (2L, "insert", """{"id":3,"item":"nut","qty":9}""")),
      b, Seq("id"), wide, epochId = 1L, streamId = "evo")
    val rows = DeltaRead.snapshot(spark, b)
      .selectExpr("id", "item", "qty")
      .as[(Long, String, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(rows === Seq((1L, "widget", None), (2L, "bolt-v2", Some(7L)),
      (3L, "nut", Some(9L))),
      "replica evolved: carried row 1 reads NULL qty, epoch-1 rows carry it")
    // exactly-once still holds across the evolution: replayed epoch no-ops
    LakeMirror.applyBatchDelta(spark,
      changeBatch((2L, "insert", """{"id":9,"item":"stale","qty":0}""")),
      b, Seq("id"), wide, epochId = 1L, streamId = "evo")
    assert(DeltaRead.snapshot(spark, b).count() === 3L)
  }
}
