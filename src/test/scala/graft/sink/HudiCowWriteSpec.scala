package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.HudiRead

/** [[HudiCowWrite.upsert]] — Hudi as a CDC target: real-layout COW
  * upserts with file-group-scoped rewrites, original commit times on
  * carried rows (incremental pulls see exactly the changes), and
  * timeline-instant idempotence. */
class HudiCowWriteSpec extends SparkSuite {

  import spark.implicits._

  private val T1 = "20240101000000000"
  private val T2 = "20240102000000000"
  private val T3 = "20240103000000000"

  test("upserts rewrite only affected groups; carried rows keep their commit time") {
    val root = Files.createTempDirectory("hudi-cow-upsert").toString
    assert(HudiCowWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt")).toDF("id", "item"), root, "id", T1))
    // second batch: update key 1, add key 3
    assert(HudiCowWrite.upsert(
      Seq((1L, "widget-v2"), (3L, "nut")).toDF("id", "item"), root, "id", T2))

    val snap = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item", "_hoodie_commit_time")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(snap === Seq((1L, "widget-v2", T2), (2L, "bolt", T1),
      (3L, "nut", T2)),
      "key 2 is CARRIED: its commit time must stay T1 through the rewrite")

    // incremental pull sees exactly the T2 changes, not carried rows
    val inc = HudiRead.incremental(spark, root, T1)
      .selectExpr("id").as[Long].collect().toSeq.sorted
    assert(inc === Seq(1L, 3L))

    // replayed instant: skipped before writing anything
    assert(!HudiCowWrite.upsert(
      Seq((9L, "stale")).toDF("id", "item"), root, "id", T2))
    assert(HudiRead.snapshot(spark, root).count() === 3L)

    // third batch touches only the NEW group (key 3) — group fg-T1
    // must not be rewritten again
    assert(HudiCowWrite.upsert(
      Seq((3L, "nut-v2")).toDF("id", "item"), root, "id", T3))
    val after = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item", "_hoodie_commit_time")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(after === Seq((1L, "widget-v2", T2), (2L, "bolt", T1),
      (3L, "nut-v2", T3)))
    // the T2 group holding keys 1 (and formerly 3) was rewritten at T3?
    // no: only key 3's group. Key 1's commit time stays T2.
  }

  test("the tables round-trip through the graft-hudi streaming tail") {
    val root = Files.createTempDirectory("hudi-cow-tail").toString
    HudiCowWrite.upsert(Seq((1L, "a")).toDF("id", "item"), root, "id", T1)
    HudiCowWrite.upsert(Seq((1L, "b"), (2L, "c")).toDF("id", "item"),
      root, "id", T2)
    val q = spark.readStream.format("graft-hudi").option("path", root).load()
      .writeStream.format("memory").queryName("cow_upsert_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("cow_upsert_tail")
      .selectExpr("version", "row").as[(Long, String)].collect().toSeq
    // the first drain spans both commits: COW incremental semantics —
    // the T2 rewrite collapsed id 1's T1 state, so exactly the LATEST
    // rows emit, both stamped T2 (id 1 updated, id 2 new)
    assert(rows.count(_._1 == T1.toLong) === 0)
    assert(rows.count(_._1 == T2.toLong) === 2)
    assert(rows.exists(_._2.contains("\"b\"")) && rows.exists(_._2.contains("\"c\"")))
  }
}
