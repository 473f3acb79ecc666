package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.sink.{LakeTable, MergeWriter}
import graft.sources.DeltaRead

/** END-TO-END: continuous replication of a Delta table into the graft
  * lake over the `graft-delta` STREAMING tail — the streaming analog of
  * DeltaCdfSpec's batch replication. Change rows arrive as
  * (version, change_type, row-json); each micro-batch applies net
  * deletes then upserts through [[MergeWriter]] (idempotent keyed
  * merges), so checkpointed at-least-once replay composes into an
  * exactly-once replica across a kill/restart. */
class DeltaTailReplicationSpec extends SparkSuite {

  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("item", StringType),
    StructField("par", StringType)))

  test("streaming CDF tail + MergeWriter reproduce the source snapshot") {
    val source = Files.createTempDirectory("delta-repl").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
        .toDF("id", "item", "par"), source, Seq("par"))
    val lake = LakeTable(
      Files.createTempDirectory("delta-repl-lake").resolve("t").toString,
      "replica", Seq("id"), precombineField = "version")
    val ckpt = Files.createTempDirectory("delta-repl-ckpt").toString

    def apply(b: DataFrame): Unit = {
      val parsed = b
        .select(col("version"), col("change_type"),
          from_json(col("row"), rowSchema).as("r"))
        .select(col("version"), col("change_type"),
          col("r.id"), col("r.item"), col("r.par"))
      val ups = parsed
        .where(col("change_type").isin("insert", "update_postimage"))
        .drop("change_type")
      val dels = parsed.where(col("change_type") === "delete")
        .drop("change_type")
        .join(ups.select("id").distinct(), Seq("id"), "left_anti")
      if (!dels.isEmpty) MergeWriter.delete(spark, dels, lake)
      if (!ups.isEmpty) MergeWriter.upsert(spark, ups, lake)
    }
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta").option("path", source).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => apply(b) }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def replica(): Seq[(Long, String, String)] =
      MergeWriter.readView(spark, lake).select("id", "item", "par")
        .as[(Long, String, String)].collect().sorted.toSeq
    def sourceRows(): Seq[(Long, String, String)] =
      DeltaRead.snapshot(spark, source).select("id", "item", "par")
        .as[(Long, String, String)].collect().sorted.toSeq

    run() // v0
    assert(replica() === sourceRows())
    // v1: partition rewrite (update + insert + delete of nothing)
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a"), (4L, "gear", "a")).toDF("id", "item", "par"),
      source, "par", "a")
    run() // restart from checkpoint: only v1 arrives
    assert(replica() === sourceRows())
    // the rewrite updated id=1, inserted id=4, and dropped id=2 (bolt)
    assert(replica().exists(_._2 == "widget-v2") && replica().size === 3)
    assert(!replica().exists(_._1 == 2L), "deleted key must not survive")
    // idempotence: a third run with nothing new changes nothing
    run()
    assert(replica() === sourceRows())
  }
}
