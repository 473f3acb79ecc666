package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** W1 — Hudi-equivalent merge semantics: precombine dedup, upsert
  * replace-on-key, idempotent re-ingest, delete, partitioned COW rewrite,
  * MOR log + compaction. */
class MergeWriterSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-merge").toString

  private def batch(rows: (Long, String, Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "val", "ver", "dt")

  private def cow(path: String, partitioned: Boolean = false) = LakeTable(
    path = path, tableName = "t", recordKeyFields = Seq("id"),
    precombineField = "ver",
    partitionFields = if (partitioned) Seq("dt") else Nil)

  private def readAll(t: LakeTable): Set[(Long, String, Long, String)] =
    MergeWriter.readView(spark, t)
      .select("id", "val", "ver", "dt").as[(Long, String, Long, String)]
      .collect().toSet

  test("intra-batch duplicates resolve to max precombine") {
    val d = MergeWriter.dedupByPrecombine(
      batch((1, "old", 1, "a"), (1, "new", 5, "a"), (2, "x", 1, "a")),
      Seq("id"), "ver")
    assert(d.as[(Long, String, Long, String)].collect().toSet ===
      Set((1L, "new", 5L, "a"), (2L, "x", 1L, "a")))
  }

  test("upsert replaces stored rows by key; unmatched rows survive") {
    val t = cow(tmp())
    MergeWriter.upsert(spark, batch((1, "a", 1, "p"), (2, "b", 1, "p")), t)
    MergeWriter.upsert(spark, batch((2, "b2", 2, "p"), (3, "c", 1, "p")), t)
    assert(readAll(t) === Set((1L, "a", 1L, "p"), (2L, "b2", 2L, "p"), (3L, "c", 1L, "p")))
  }

  test("re-ingesting the same batch is idempotent") {
    val t = cow(tmp())
    val b = batch((1, "a", 1, "p"), (2, "b", 2, "p"))
    MergeWriter.upsert(spark, b, t)
    val first = readAll(t)
    MergeWriter.upsert(spark, b, t)
    assert(readAll(t) === first)
  }

  test("delete removes keys") {
    val t = cow(tmp())
    MergeWriter.upsert(spark, batch((1, "a", 1, "p"), (2, "b", 1, "p")), t)
    MergeWriter.delete(spark, Seq((1L, "x", 9L, "p")).toDF("id", "val", "ver", "dt"), t)
    assert(readAll(t) === Set((2L, "b", 1L, "p")))
  }

  test("partitioned COW only rewrites affected partitions") {
    val t = cow(tmp(), partitioned = true)
    MergeWriter.upsert(spark, batch((1, "a", 1, "p1"), (2, "b", 1, "p2")), t)
    val p2FilesBefore = new java.io.File(s"${t.path}/data/dt=p2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    Thread.sleep(1100)
    MergeWriter.upsert(spark, batch((1, "a2", 2, "p1")), t)
    val p2FilesAfter = new java.io.File(s"${t.path}/data/dt=p2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    assert(p2FilesAfter === p2FilesBefore, "untouched partition was rewritten")
    assert(readAll(t) === Set((1L, "a2", 2L, "p1"), (2L, "b", 1L, "p2")))
  }

  test("partitioned COW upsert READS only affected partitions (plan-time prune)") {
    val t = cow(tmp(), partitioned = true)
    // 64 rows over 8 partitions: an unpruned read shows up as 64 input
    // records; a plan-time-pruned one as p1's 8
    MergeWriter.upsert(spark,
      batch((1L to 64L).map(i => (i, "v", 1L, s"p${i % 8}")): _*), t)
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records.addAndGet(e.taskMetrics.inputMetrics.recordsRead): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MergeWriter.upsert(spark, batch((1L, "v2", 2L, "p1")), t)
      // task-end events post asynchronously; wait for the drain
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val now = records.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      // only p1's file may be read (8 records; tolerate a footer re-read):
      // the static partition disjunction prunes at scan PLANNING time —
      // a runtime semi join would read all 64 rows to filter them
      assert(records.get() <= 16,
        s"partitioned upsert read ${records.get()} records — " +
          "expected only the affected partition (plan-time prune lost)")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(readAll(t).contains((1L, "v2", 2L, "p1")))
  }

  test("MOR: delta commits merge at read time; compaction folds them") {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver", Nil, LakeTable.MergeOnRead)
    // base via bulk insert, then two log commits
    MergeWriter.append(batch((1, "a", 1, "p"), (2, "b", 1, "p")), t)
    MergeWriter.upsert(spark, batch((2, "b2", 2, "p")), t)
    MergeWriter.upsert(spark, batch((3, "c", 1, "p")), t)
    val expect = Set((1L, "a", 1L, "p"), (2L, "b2", 2L, "p"), (3L, "c", 1L, "p"))
    assert(readAll(t) === expect)
    MergeWriter.compact(spark, t)
    assert(readAll(t) === expect, "compaction changed the view")
    assert(!new java.io.File(s"${t.path}/_delta").exists, "log not cleared")
  }

  test("MOR delete tombstones hide rows until compaction") {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver", Nil, LakeTable.MergeOnRead)
    MergeWriter.append(batch((1, "a", 1, "p"), (2, "b", 1, "p")), t)
    MergeWriter.delete(spark, batch((1, "a", 1, "p")), t)
    assert(readAll(t) === Set((2L, "b", 1L, "p")))
    MergeWriter.compact(spark, t)
    assert(readAll(t) === Set((2L, "b", 1L, "p")))
  }

  test("later commit wins over higher precombine from an earlier commit") {
    // OverwriteWithLatestAvroPayload semantics: incoming replaces stored,
    // even if the stored precombine is higher
    val t = cow(tmp())
    MergeWriter.upsert(spark, batch((1, "high", 9, "p")), t)
    MergeWriter.upsert(spark, batch((1, "low", 1, "p")), t)
    assert(readAll(t) === Set((1L, "low", 1L, "p")))
  }

  // ---- round 2: meta fields, incremental pull, time travel, evolution ----

  test("COW meta fields stamp commit time and record key per record") {
    val t = cow(tmp()).copy(metaFields = true)
    MergeWriter.upsert(spark, batch((1, "a", 1, "p"), (2, "b", 1, "p")), t)
    MergeWriter.upsert(spark, batch((2, "b2", 2, "p")), t)
    val rows = MergeWriter.readView(spark, t)
      .select("id", MergeWriter.CommitTimeCol, MergeWriter.RecordKeyCol)
      .as[(Long, Long, String)].collect().toSet
    assert(rows === Set((1L, 1L, "1"), (2L, 2L, "2")))
  }

  test("COW incremental pull returns only records changed after a commit") {
    val t = cow(tmp()).copy(metaFields = true)
    MergeWriter.upsert(spark, batch((1, "a", 1, "p"), (2, "b", 1, "p")), t)
    MergeWriter.upsert(spark, batch((2, "b2", 2, "p"), (3, "c", 1, "p")), t)
    val inc = MergeWriter.incremental(spark, t, sinceCommit = 1)
      .select("id", "val").as[(Long, String)].collect().toSet
    assert(inc === Set((2L, "b2"), (3L, "c")))
    assert(MergeWriter.incremental(spark, t, sinceCommit = 2).isEmpty)
  }

  test("MOR incremental pull resolves the latest change per key from the log") {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver", Nil, LakeTable.MergeOnRead)
    MergeWriter.append(batch((1, "a", 1, "p"), (2, "b", 1, "p")), t) // commit 1
    MergeWriter.upsert(spark, batch((2, "b2", 2, "p")), t)           // commit 2
    MergeWriter.upsert(spark, batch((2, "b3", 3, "p"), (3, "c", 1, "p")), t) // commit 3
    MergeWriter.delete(spark, batch((1, "a", 1, "p")), t)            // commit 4
    val inc = MergeWriter.incremental(spark, t, sinceCommit = 1)
    val got = inc.select(col("id"), col("val"), col(MergeWriter.CommitTimeCol))
      .as[(Long, String, Long)].collect().toSet
    // id=2 appears once with its LATEST change; id=1's tombstone is excluded
    assert(got === Set((2L, "b3", 3L), (3L, "c", 3L)))
  }

  test("MOR time travel reads the snapshot as of an earlier commit") {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver", Nil, LakeTable.MergeOnRead)
    MergeWriter.append(batch((1, "a", 1, "p")), t)          // commit 1 (base)
    MergeWriter.upsert(spark, batch((2, "b", 1, "p")), t)   // commit 2
    MergeWriter.upsert(spark, batch((2, "b2", 2, "p")), t)  // commit 3
    def asOf(c: Long) = MergeWriter.readAsOf(spark, t, c)
      .select("id", "val").as[(Long, String)].collect().toSet
    assert(asOf(2) === Set((1L, "a"), (2L, "b")))
    assert(asOf(3) === Set((1L, "a"), (2L, "b2")))
  }

  test("commit timeline stays monotonic across MOR compaction") {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver", Nil, LakeTable.MergeOnRead)
    MergeWriter.append(batch((1, "a", 1, "p")), t)
    MergeWriter.upsert(spark, batch((2, "b", 1, "p")), t)
    assert(MergeWriter.latestCommit(spark, t) === 2L)
    MergeWriter.compact(spark, t)
    // _delta is gone but the timeline must not restart from 0
    assert(MergeWriter.latestCommit(spark, t) === 2L)
    MergeWriter.upsert(spark, batch((3, "c", 1, "p")), t)
    assert(MergeWriter.latestCommit(spark, t) === 3L)
  }

  test("schema evolution: a batch can add a column; old columns null-fill") {
    val t = cow(tmp())
    MergeWriter.upsert(spark, batch((1, "a", 1, "p"), (2, "b", 1, "p")), t)
    val evolved = Seq((2L, "b2", 2L, "p", "extra"))
      .toDF("id", "val", "ver", "dt", "note")
    MergeWriter.upsert(spark, evolved, t)
    val rows = MergeWriter.readView(spark, t)
      .select("id", "val", "note").as[(Long, String, Option[String])]
      .collect().toSet
    assert(rows === Set((1L, "a", None), (2L, "b2", Some("extra"))))
  }
}
