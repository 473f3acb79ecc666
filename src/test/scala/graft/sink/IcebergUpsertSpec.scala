package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.IcebergRead

/** [[IcebergWrite.upsert]] — Iceberg v2 as a CDC TARGET: each batch is
  * new data files + an equality-delete file over the keys at one
  * sequence number, and the spec's strict `delete.seq > data.seq`
  * scoping resolves the upsert (older rows die, the batch survives). */
class IcebergUpsertSpec extends SparkSuite {

  import spark.implicits._

  private val fields = Seq((1, "id", "long"), (2, "item", "string"))

  test("successive upserts resolve latest-per-key through equality deletes") {
    val root = Files.createTempDirectory("iceberg-upsert").toString
    IcebergWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    IcebergWrite.upsert(
      Seq((2L, "bolt-v2"), (3L, "nut-v2"), (4L, "gear")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 2L, sequenceNumber = 2L)
    def rows(): Seq[(Long, String)] = IcebergRead.snapshot(spark, root)
      .as[(Long, String)].collect().toSeq.sorted
    assert(rows() === Seq((1L, "widget"), (2L, "bolt-v2"),
      (3L, "nut-v2"), (4L, "gear")))
    // a third batch updates a key updated before: still exactly once
    IcebergWrite.upsert(
      Seq((2L, "bolt-v3")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 3L, sequenceNumber = 3L)
    assert(rows() === Seq((1L, "widget"), (2L, "bolt-v3"),
      (3L, "nut-v2"), (4L, "gear")))
    // time travel still sees the intermediate state
    assert(IcebergRead.snapshot(spark, root, snapshotId = Some(2L))
      .as[(Long, String)].collect().toSeq.sorted ===
      Seq((1L, "widget"), (2L, "bolt-v2"), (3L, "nut-v2"), (4L, "gear")))
  }

  test("deleteWhere commits real position deletes; schema survives the commit") {
    val root = Files.createTempDirectory("iceberg-posdel").toString
    IcebergWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt"), (3L, "nut"), (4L, "gear"))
        .toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    assert(IcebergWrite.deleteWhere(spark, root, "id % 2 = 0",
      snapshotId = 2L, sequenceNumber = 2L))
    def rows(): Seq[(Long, String)] = IcebergRead.snapshot(spark, root)
      .as[(Long, String)].collect().toSeq.sorted
    assert(rows() === Seq((1L, "widget"), (3L, "nut")))
    // replayed snapshot id: skipped before writing anything
    assert(!IcebergWrite.deleteWhere(spark, root, "id = 1",
      snapshotId = 2L, sequenceNumber = 2L))
    assert(rows() === Seq((1L, "widget"), (3L, "nut")))
    // the schema-free commit must CARRY the table schema forward: a
    // later upsert's equality deletes still resolve their field ids
    IcebergWrite.upsert(Seq((3L, "nut-v2")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 3L, sequenceNumber = 3L)
    assert(rows() === Seq((1L, "widget"), (3L, "nut-v2")))
    // and time travel BEFORE the delete still sees all four rows
    assert(IcebergRead.snapshot(spark, root, snapshotId = Some(1L))
      .as[(Long, String)].collect().toSeq.sorted ===
      Seq((1L, "widget"), (2L, "bolt"), (3L, "nut"), (4L, "gear")))
  }

  test("in-batch duplicated keys are refused loudly; upsert history refuses append-only reads") {
    val root = Files.createTempDirectory("iceberg-upsert-dup").toString
    val e = intercept[IllegalArgumentException](IcebergWrite.upsert(
      Seq((1L, "a"), (1L, "b")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L))
    assert(e.getMessage.contains("duplicated key"))

    IcebergWrite.upsert(Seq((1L, "a")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    IcebergWrite.upsert(Seq((1L, "b")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 2L, sequenceNumber = 2L)
    val e2 = intercept[IllegalArgumentException](
      IcebergRead.incremental(spark, root, fromSnapshotId = 1L))
    assert(e2.getMessage.contains("not append-only"),
      "upsert snapshots record operation=overwrite and must refuse " +
        "append-only incremental reads")
  }
}
