package graft.apps

import java.nio.file.Files

import graft.SparkSuite
import graft.sink.{LakeTable, MergeWriter}

/** The lake-mirror CLI end to end: backfill a Delta table's change feed
  * into a graft replica with `--available-now` (pinned-tip drain, app
  * exits), then a second invocation picks up only the new versions from
  * the same checkpoint. */
class LakeMirrorAppSpec extends SparkSuite {

  import spark.implicits._

  test("--available-now backfills, exits, and resumes incrementally") {
    val source = Files.createTempDirectory("mirror-src").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "b")).toDF("id", "item", "par"),
      source, Seq("par"))
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a")).toDF("id", "item", "par"), source, "par", "a")
    val target = Files.createTempDirectory("mirror-dst").resolve("t").toString
    val ckpt = Files.createTempDirectory("mirror-ckpt").toString
    def run(): Unit = LakeMirrorApp.main(Array(
      "--format", "delta", "--source", source, "--target", target,
      "--checkpoint", ckpt, "--schema", "id LONG, item STRING, par STRING",
      "--record-key", "id", "--max-files-per-trigger", "2",
      "--available-now"))
    run() // terminates: AvailableNow

    val lake = LakeTable(target, "mirror_t", Seq("id"), "version")
    def replica(): Seq[(Long, String, String)] =
      MergeWriter.readView(spark, lake).select("id", "item", "par")
        .as[(Long, String, String)].collect().sorted.toSeq
    assert(replica() === Seq((1L, "widget-v2", "a"), (2L, "bolt", "b")))

    // grow the source; the second backfill resumes from the checkpoint
    graft.sink.DeltaWrite.append(
      Seq((3L, "nut", "c")).toDF("id", "item", "par").coalesce(1),
      source, Seq("par"))
    run()
    assert(replica() === Seq((1L, "widget-v2", "a"), (2L, "bolt", "b"),
      (3L, "nut", "c")))
  }

  test("--target-format iceberg mirrors into a real Iceberg table") {
    val source = Files.createTempDirectory("mirror-ice-src").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "b")).toDF("id", "item", "par"),
      source, Seq("par"))
    val target = Files.createTempDirectory("mirror-ice-dst").resolve("t").toString
    val ckpt = Files.createTempDirectory("mirror-ice-ckpt").toString
    LakeMirrorApp.main(Array(
      "--format", "delta", "--source", source, "--target", target,
      "--checkpoint", ckpt, "--schema", "id LONG, item STRING, par STRING",
      "--record-key", "id", "--target-format", "iceberg", "--available-now"))
    val rows = graft.sources.IcebergRead.snapshot(spark, target)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(rows === Seq((1L, "widget"), (2L, "bolt")))
  }

  test("--target-format hudi mirrors into a real Hudi COW table") {
    val source = Files.createTempDirectory("mirror-hudi-src").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "b")).toDF("id", "item", "par"),
      source, Seq("par"))
    val target = Files.createTempDirectory("mirror-hudi-dst").resolve("t").toString
    val ckpt = Files.createTempDirectory("mirror-hudi-ckpt").toString
    LakeMirrorApp.main(Array(
      "--format", "delta", "--source", source, "--target", target,
      "--checkpoint", ckpt, "--schema", "id LONG, item STRING, par STRING",
      "--record-key", "id", "--target-format", "hudi", "--available-now"))
    val rows = graft.sources.HudiRead.snapshot(spark, target)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(rows === Seq((1L, "widget"), (2L, "bolt")))
  }
}
