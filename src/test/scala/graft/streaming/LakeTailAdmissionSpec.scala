package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.sink.{HudiMorWrite, IcebergWrite}
import graft.sink.IcebergWrite.FileEntry

/** Admission control on the three lake tails: `maxFilesPerTrigger` caps
  * each micro-batch's planned files (whole commits, oldest-first, at
  * least one per batch), and `Trigger.AvailableNow` pins the tip at
  * query start and drains the backlog to exactly it in capped batches —
  * the production backfill shape: a fresh tail of a long history must
  * NOT plan everything in micro-batch 0. */
class LakeTailAdmissionSpec extends SparkSuite {

  import spark.implicits._

  /** Runs the stream with Trigger.AvailableNow and records each
    * non-empty batch's (distinct versions, row count). */
  private def drain(format: String, path: String, cap: String)
      : Seq[(Set[Long], Long)] = {
    val ckpt = Files.createTempDirectory("admission-ckpt").toString
    val batches = mutable.ArrayBuffer.empty[(Set[Long], Long)]
    val q = spark.readStream.format(format).option("path", path)
      .option("maxFilesPerTrigger", cap).load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val versions = b.select("version").as[Long].collect()
        if (versions.nonEmpty) batches.synchronized {
          batches += ((versions.toSet, versions.length.toLong))
        }
        ()
      }
      .start()
    q.awaitTermination() // AvailableNow: terminates when the tip drains
    batches.synchronized(batches.toSeq)
  }

  test("graft-delta: backlog drains in capped batches; oversized commits still progress") {
    val root = Files.createTempDirectory("delta-admission").resolve("t").toString
    // v0: 3 files (one per partition) — BIGGER than the cap
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "b"), (3L, "nut", "c"))
        .toDF("id", "item", "par"), root, Seq("par"))
    // v1, v2: 1 add each (blind appends) — two SMALL commits coalesce
    graft.sink.DeltaWrite.append(
      Seq((4L, "gear", "d")).toDF("id", "item", "par").coalesce(1),
      root, Seq("par"))
    graft.sink.DeltaWrite.append(
      Seq((5L, "cog", "e")).toDF("id", "item", "par").coalesce(1),
      root, Seq("par"))

    val batches = drain("graft-delta", root, cap = "2")
    assert(batches.map(_._1) === Seq(Set(0L), Set(1L, 2L)),
      s"expected v0 alone (3 files > cap, progress guarantee) then v1+v2 " +
        s"coalesced (1+1 files = cap), got $batches")
    assert(batches.map(_._2).sum === 5L, "every row exactly once")

    // unbounded: the whole history is one batch
    val unbounded = drain("graft-delta", root, cap = "none")
    assert(unbounded.size === 1 && unbounded.head._1 === Set(0L, 1L, 2L))
  }

  test("graft-delta: maxBytesPerTrigger closes batches by changed bytes") {
    val root = Files.createTempDirectory("delta-bytes").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget")).toDF("id", "item"), root, Nil)
    graft.sink.DeltaWrite.append(
      Seq((2L, "bolt")).toDF("id", "item").coalesce(1), root)
    graft.sink.DeltaWrite.append(
      Seq((3L, "nut")).toDF("id", "item").coalesce(1), root)
    // each parquet file is ~700-900 bytes: a 1000-byte budget admits one
    // version per batch (files budget left unbounded)
    val ckpt = Files.createTempDirectory("delta-bytes-ckpt").toString
    val batches = mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-delta").option("path", root)
      .option("maxFilesPerTrigger", "none")
      .option("maxBytesPerTrigger", "1000").load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val versions = b.select("version").as[Long].collect()
        if (versions.nonEmpty) batches.synchronized {
          batches += versions.toSet
        }
        ()
      }
      .start()
    q.awaitTermination()
    assert(batches.synchronized(batches.toSeq) ===
      Seq(Set(0L), Set(1L), Set(2L)),
      "each ~800-byte commit must close its own batch under a 1000-byte cap")
  }

  test("graft-iceberg: snapshots admitted whole until the file budget is spent") {
    val root = Files.createTempDirectory("iceberg-admission").toString
    val data = java.nio.file.Paths.get(root, "data")
    val schema = Seq((1, "id", "long"), (2, "item", "string"))
    def parquetFile(name: String, rows: Seq[(Long, String)]): String = {
      val tmp = Files.createTempDirectory("ice-adm")
      rows.toDF("id", "item").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.createDirectories(data)
      Files.copy(part, data.resolve(name))
      data.resolve(name).toString
    }
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(parquetFile("f1.parquet", Seq((1L, "widget"))), 0, 1L)),
      schema, snapshotId = 11L)
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(parquetFile("f2.parquet", Seq((2L, "bolt"))), 0, 2L)),
      schema, snapshotId = 22L)
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(parquetFile("f3.parquet", Seq((3L, "nut"))), 0, 3L)),
      schema, snapshotId = 33L)

    val batches = drain("graft-iceberg", root, cap = "2")
    assert(batches.map(_._1) === Seq(Set(11L, 22L), Set(33L)),
      s"expected 1+1 files to fill the cap then the third snapshot, got $batches")
    assert(batches.map(_._2).sum === 3L)
  }

  test("graft-hudi: instants admitted whole until the base-file budget is spent") {
    val T1 = "20240101000000000"
    val T2 = "20240102000000000"
    val T3 = "20240103000000000"
    val root = Files.createTempDirectory("hudi-admission").toString
    def rows(data: Seq[(String, String, Long, String)]) =
      data.toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item")
    HudiMorWrite.writeBase(rows(Seq(("1", T1, 1L, "widget"))), root, "part=0", "fg1", T1)
    HudiMorWrite.writeBase(rows(Seq(("2", T2, 2L, "bolt"))), root, "part=0", "fg2", T2)
    HudiMorWrite.writeBase(rows(Seq(("3", T3, 3L, "nut"))), root, "part=0", "fg3", T3)

    val batches = drain("graft-hudi", root, cap = "2")
    assert(batches.map(_._1) === Seq(Set(T1.toLong, T2.toLong), Set(T3.toLong)),
      s"expected T1+T2 to fill the cap then T3, got $batches")
    assert(batches.map(_._2).sum === 3L)
  }
}
