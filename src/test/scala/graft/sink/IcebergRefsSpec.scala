package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.IcebergRead

/** Iceberg REFS (tags/branches): named snapshot pointers in the table
  * metadata — set/drop, carry-forward through later commits, read by
  * name, immutable tags, and retention through snapshot expiry. */
class IcebergRefsSpec extends SparkSuite {

  import spark.implicits._

  private val fields = Seq((1, "id", "long"), (2, "item", "string"))

  test("tags pin snapshots: read by name, survive commits and expiry") {
    val root = Files.createTempDirectory("iceberg-refs").toString
    IcebergWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    IcebergWrite.setRef(spark, root, "v1.0", 1L)
    // later commits must carry the ref forward
    IcebergWrite.upsert(
      Seq((1L, "widget-v2"), (3L, "nut")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 2L, sequenceNumber = 2L)
    IcebergWrite.upsert(
      Seq((4L, "gear")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 3L, sequenceNumber = 3L)

    def byRef(r: String): Seq[(Long, String)] =
      IcebergRead.snapshotAtRef(spark, root, r)
        .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(byRef("v1.0") === Seq((1L, "widget"), (2L, "bolt")),
      "the tag reads the PINNED state, not the tip")
    assert(IcebergRead.snapshot(spark, root).count() === 4L)

    // tags are immutable; branches move
    intercept[IllegalArgumentException] {
      IcebergWrite.setRef(spark, root, "v1.0", 2L)
    }
    IcebergWrite.setRef(spark, root, "dev", 2L, refType = "branch")
    IcebergWrite.setRef(spark, root, "dev", 3L, refType = "branch")
    assert(byRef("dev").size === 4)
    // unknown ref fails loudly by name
    val e = intercept[IllegalArgumentException] {
      IcebergRead.snapshotAtRef(spark, root, "nope")
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("v1.0"))

    // expiry retains the ref-pinned snapshot 1 even at retain=1
    val (expired, _) = IcebergExpire.expireSnapshots(spark, root, retain = 1)
    assert(expired === 1, s"only the unpinned snapshot 2 expires, got $expired")
    assert(byRef("v1.0") === Seq((1L, "widget"), (2L, "bolt")),
      "the tagged snapshot must survive expiry")
    assert(IcebergRead.snapshot(spark, root).count() === 4L)

    // drop + retag moves the pin
    IcebergWrite.dropRef(spark, root, "v1.0")
    IcebergWrite.setRef(spark, root, "v1.0", 3L)
    assert(byRef("v1.0").size === 4)
  }

  test("rollback moves the tip back; later snapshots stay reversible") {
    val root = Files.createTempDirectory("iceberg-rollback").toString
    IcebergWrite.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    IcebergWrite.upsert(Seq((1L, "a2"), (3L, "c")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 2L, sequenceNumber = 2L)
    IcebergWrite.rollback(spark, root, 1L)
    def state(): Seq[(Long, String)] = IcebergRead.snapshot(spark, root)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(state() === Seq((1L, "a"), (2L, "b")),
      "tip must read the rolled-back snapshot")
    // reversible: snapshot 2 is still in history
    IcebergWrite.rollback(spark, root, 2L)
    assert(state() === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    // unknown snapshot fails loudly
    intercept[IllegalArgumentException] {
      IcebergWrite.rollback(spark, root, 99L)
    }
  }
}
