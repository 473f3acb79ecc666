package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.sink.{HudiMorWrite, IcebergWrite, LakeTable, MergeWriter}
import graft.sink.IcebergWrite.FileEntry

/** END-TO-END: continuous replication of Iceberg and Hudi tables into
  * the graft lake over their STREAMING tails — the two missing legs next
  * to [[DeltaTailReplicationSpec]] (together: every lake format this
  * library tails can be mirrored with exactly-once results). Change rows
  * arrive as (version, change_type, row-json); each micro-batch upserts
  * through [[MergeWriter]] (idempotent keyed merges with last-writer-wins
  * precombine), so checkpointed at-least-once replay composes into an
  * exactly-once replica across a kill/restart. */
class LakeTailReplicationSpec extends SparkSuite {

  import spark.implicits._

  private def runTail(format: String, source: String, ckpt: String)
                     (apply: DataFrame => Unit): Unit = {
    val q = spark.readStream.format(format).option("path", source).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) => apply(b) }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("graft-iceberg tail + MergeWriter mirror an appending Iceberg table") {
    val schema = Seq((1, "id", "long"), (2, "item", "string"))
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("item", StringType)))
    val source = Files.createTempDirectory("ice-repl").toString
    val data = java.nio.file.Paths.get(source, "data")
    def dataFile(name: String, rows: Seq[(Long, String)]): String = {
      val tmp = Files.createTempDirectory("ice-repl-p")
      rows.toDF("id", "item").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.createDirectories(data)
      Files.copy(part, data.resolve(name))
      data.resolve(name).toString
    }
    IcebergWrite.commitEntries(spark, source,
      Seq(FileEntry(dataFile("f1.parquet",
        Seq((1L, "widget"), (2L, "bolt"))), 0, 1L)),
      schema, snapshotId = 1L)

    val lake = LakeTable(
      Files.createTempDirectory("ice-repl-lake").resolve("t").toString,
      "ice_replica", Seq("id"), precombineField = "version")
    val ckpt = Files.createTempDirectory("ice-repl-ckpt").toString
    def apply(b: DataFrame): Unit = {
      // append-only tail: every change is an insert; the keyed upsert
      // with version precombine turns appended row-versions into a
      // latest-per-key view
      val ups = b.where(col("change_type") === "insert")
        .select(col("version"), from_json(col("row"), rowSchema).as("r"))
        .select(col("version"), col("r.id"), col("r.item"))
      if (!ups.isEmpty) MergeWriter.upsert(spark, ups, lake)
    }
    def replica(): Seq[(Long, String)] =
      MergeWriter.readView(spark, lake).select("id", "item")
        .as[(Long, String)].collect().sorted.toSeq

    runTail("graft-iceberg", source, ckpt)(apply)
    assert(replica() === Seq((1L, "widget"), (2L, "bolt")))
    // snapshot 2 appends a newer row-version of id=1 and a new id=3;
    // the restart must deliver ONLY snapshot 2
    IcebergWrite.commitEntries(spark, source,
      Seq(FileEntry(dataFile("f2.parquet",
        Seq((1L, "widget-v2"), (3L, "nut"))), 0, 2L)),
      schema, snapshotId = 2L)
    runTail("graft-iceberg", source, ckpt)(apply)
    assert(replica() === Seq((1L, "widget-v2"), (2L, "bolt"), (3L, "nut")))
    // idempotence: nothing new → nothing changes
    runTail("graft-iceberg", source, ckpt)(apply)
    assert(replica() === Seq((1L, "widget-v2"), (2L, "bolt"), (3L, "nut")))
  }

  test("graft-hudi tail + MergeWriter mirror a COW Hudi table") {
    val T1 = "20240101000000000"
    val T2 = "20240102000000000"
    val T3 = "20240103000000000"
    val rowSchema = StructType(Seq(
      StructField("_hoodie_record_key", StringType),
      StructField("_hoodie_commit_time", StringType),
      StructField("id", LongType), StructField("item", StringType)))
    val source = Files.createTempDirectory("hudi-repl").toString
    def commit(instant: String, rows: Seq[(String, String, Long, String)]): Unit =
      HudiMorWrite.writeBase(
        rows.toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item"),
        source, "part=0", "fg1", instant)
    commit(T1, Seq(("1", T1, 1L, "widget"), ("2", T1, 2L, "bolt")))
    commit(T2, Seq(("1", T2, 1L, "widget-v2"), ("2", T1, 2L, "bolt")))

    val lake = LakeTable(
      Files.createTempDirectory("hudi-repl-lake").resolve("t").toString,
      "hudi_replica", Seq("rkey"), precombineField = "version")
    val ckpt = Files.createTempDirectory("hudi-repl-ckpt").toString
    def apply(b: DataFrame): Unit = {
      // the COW tail emits upserts with the ROW's commit time as the
      // version (carried-over rows are filtered at the source)
      val ups = b.where(col("change_type") === "upsert")
        .select(col("version"), from_json(col("row"), rowSchema).as("r"))
        .select(col("version"), col("r._hoodie_record_key").as("rkey"),
          col("r.id"), col("r.item"))
      if (!ups.isEmpty) MergeWriter.upsert(spark, ups, lake)
    }
    def replica(): Seq[(String, String)] =
      MergeWriter.readView(spark, lake).select("rkey", "item")
        .as[(String, String)].collect().sorted.toSeq
    def sourceRows(): Seq[(String, String)] =
      graft.sources.HudiRead.snapshot(spark, source)
        .select("_hoodie_record_key", "item")
        .as[(String, String)].collect().sorted.toSeq

    runTail("graft-hudi", source, ckpt)(apply)
    assert(replica() === sourceRows())
    assert(replica() === Seq(("1", "widget-v2"), ("2", "bolt")))
    // T3 rewrites the file group (row 2 updated, row 1 carried): the
    // restart delivers only the T3 row and the replica tracks the source
    commit(T3, Seq(("1", T2, 1L, "widget-v2"), ("2", T3, 2L, "bolt-v2")))
    runTail("graft-hudi", source, ckpt)(apply)
    assert(replica() === sourceRows())
    assert(replica() === Seq(("1", "widget-v2"), ("2", "bolt-v2")))
    // idempotence
    runTail("graft-hudi", source, ckpt)(apply)
    assert(replica() === sourceRows())
  }
}
