package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.HudiRead

/** [[HudiClean]] — KEEP_LATEST_FILE_VERSIONS retention: superseded COW
  * base versions and compaction-folded MOR logs are deleted, the tip
  * snapshot is byte-identical, inflight files survive, and the service
  * lands as a `.clean` timeline marker that never becomes a read
  * ceiling. */
class HudiCleanSpec extends SparkSuite {

  import spark.implicits._

  private val T1 = "20240101000000000"
  private val T2 = "20240102000000000"
  private val T3 = "20240103000000000"
  private val T4 = "20240104000000000"
  private val T9 = "20240109000000000"

  private def files(root: String): Seq[String] = {
    val s = Files.walk(java.nio.file.Paths.get(root))
    try s.toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") || p.contains(".log."))
      .map(_.stripPrefix(root + "/")).sorted.toSeq
    finally s.close()
  }

  test("COW: clean keeps the newest N base versions per group; snapshot unchanged") {
    val root = Files.createTempDirectory("hudi-clean-cow").toString
    // three upserts of the SAME key: three base versions of one group
    HudiCowWrite.upsert(Seq((1L, "v1")).toDF("id", "item"), root, "id", T1)
    HudiCowWrite.upsert(Seq((1L, "v2")).toDF("id", "item"), root, "id", T2)
    HudiCowWrite.upsert(Seq((1L, "v3"), (2L, "b")).toDF("id", "item"),
      root, "id", T3)
    assert(files(root).count(_.endsWith(".parquet")) >= 3)
    val before = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted

    // an INFLIGHT base (instant not on the timeline) must survive
    val inflight = "20240105000000000"
    HudiMorWrite.writeBaseFile(
      Seq((9L, "inflight")).toDF("id", "item")
        .withColumn("_hoodie_record_key",
          org.apache.spark.sql.functions.expr("cast(id as string)"))
        .withColumn("_hoodie_commit_time",
          org.apache.spark.sql.functions.lit(inflight)),
      root, "part=0", "fg-inflight", inflight)

    val deleted = HudiClean.clean(spark, root, T9, retainVersions = 1)
    assert(deleted >= 2, s"the v1/v2 bases must be cleaned, got $deleted")
    val after = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(after === before, "tip snapshot must be identical after clean")
    assert(files(root).exists(_.contains("fg-inflight")),
      "an inflight (uncommitted) base must never be cleaned")
    // second clean: nothing left to do
    assert(HudiClean.clean(spark, root, "20240110000000000") === 0)
    // the .clean marker is on the timeline but is NOT a commit ceiling
    assert(!HudiRead.completedInstants(spark, root).contains(T9))
    // time travel below the clean horizon fails LOUDLY instead of
    // silently reading a shrunken table (the T1/T2 slices are gone)
    val tt = intercept[IllegalArgumentException] {
      HudiRead.snapshot(spark, root, asOf = Some(T2)).count()
    }
    assert(tt.getMessage.contains("clean horizon"))
    val inc = intercept[IllegalArgumentException] {
      HudiRead.incremental(spark, root, T1, endInstant = Some(T2)).count()
    }
    assert(inc.getMessage.contains("clean horizon"))
    // at/above the horizon both work
    assert(HudiRead.snapshot(spark, root, asOf = Some(T3)).count() === 2L)
    assert(HudiRead.incremental(spark, root, T1).count() === 2L)
  }

  test("KEEP_LATEST_COMMITS: the commit window's snapshots stay readable") {
    val root = Files.createTempDirectory("hudi-clean-commits").toString
    // four versions of one group (T1..T4)
    Seq(T1, T2, T3, T4).zipWithIndex.foreach { case (t, i) =>
      HudiCowWrite.upsert(Seq((1L, s"v${i + 1}")).toDF("id", "item"),
        root, "id", t)
    }
    // retain the last 2 commits (T3, T4): the slice visible AT the
    // window floor (T3's) must stay too; only T1/T2's go
    val deleted = HudiClean.cleanByCommits(spark, root, T9, retainCommits = 2)
    assert(deleted === 2, s"exactly the T1/T2 slices go, got $deleted")
    def at(t: String): String = HudiRead.snapshot(spark, root, Some(t))
      .selectExpr("item").as[String].head
    assert(at(T4) === "v4")
    assert(at(T3) === "v3", "the window-floor snapshot must stay readable")
    val tt = intercept[IllegalArgumentException] { at(T2) }
    assert(tt.getMessage.contains("clean horizon"))
    // a second pass is a no-op
    assert(HudiClean.cleanByCommits(spark, root,
      "20240110000000000", retainCommits = 2) === 0)
  }

  test("MOR: clean deletes the pre-compaction base and folded logs") {
    val root = Files.createTempDirectory("hudi-clean-mor").toString
    def rows(data: Seq[(String, String, Long, String, Boolean)]) =
      data.toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item",
        "_hoodie_is_deleted")
    HudiMorWrite.writeBase(
      rows(Seq(("k1", T1, 1L, "widget", false))), root, "part=0", "fg1", T1)
    HudiMorWrite.appendLog(
      rows(Seq(("k1", T2, 1L, "gadget", false), ("k2", T2, 2L, "bolt", false))),
      root, "part=0", "fg1", T1, T2)
    HudiCompact.compact(spark, root, T4)
    val before = HudiRead.snapshot(spark, root)
      .selectExpr("_hoodie_record_key", "item").as[(String, String)]
      .collect().toSeq.sorted
    assert(before === Seq(("k1", "gadget"), ("k2", "bolt")))
    val deleted = HudiClean.clean(spark, root, T9, retainVersions = 1)
    assert(deleted >= 2, s"old base + folded log must go, got $deleted")
    assert(!files(root).exists(_.contains(".log.")),
      "compaction-folded logs must be cleaned")
    val after = HudiRead.snapshot(spark, root)
      .selectExpr("_hoodie_record_key", "item").as[(String, String)]
      .collect().toSeq.sorted
    assert(after === before)
  }

  test("a crash mid-delete is reconciled by the NEXT clean (no permanent leak)") {
    val root = Files.createTempDirectory("hudi-clean-crash").toString
    HudiCowWrite.upsert(Seq((1L, "v1")).toDF("id", "item"), root, "id", T1)
    HudiCowWrite.upsert(Seq((1L, "v2")).toDF("id", "item"), root, "id", T2)
    val deleted = HudiClean.clean(spark, root, T3)
    assert(deleted === 1)
    // simulate the crash window: the marker named a path but the delete
    // never ran — resurrect the file at exactly that marker path. The
    // metadata view already subtracts it, so no later sweep derived from
    // that view could ever find it again.
    val marker = java.nio.file.Paths.get(root, ".hoodie", s"$T3.clean")
    val json = Files.readString(marker)
    val rel = graft.sources.DocPushdown.jsonMapper.readTree(json)
      .get("deletedPaths").get(0).asText()
    val ghost = java.nio.file.Paths.get(root, rel)
    Files.createDirectories(ghost.getParent)
    Files.writeString(ghost, "not really parquet")
    assert(Files.exists(ghost))
    // the tip snapshot ignores the ghost (metadata-driven read)
    assert(HudiRead.snapshot(spark, root).selectExpr("item")
      .as[String].head === "v2")
    // the next clean has nothing NEW to retire — but reconciles the leak
    val second = HudiClean.clean(spark, root, T4)
    assert(second === 1, s"the ghost must be reclaimed, got $second")
    assert(!Files.exists(ghost), "crash-leaked file still on disk")
    // and a third pass is back to a clean no-op
    assert(HudiClean.clean(spark, root, T9) === 0)
  }

  test("clustering-replaced groups are removed entirely") {
    val root = Files.createTempDirectory("hudi-clean-cluster").toString
    HudiCowWrite.upsert(
      Seq((1L, "a"), (2L, "b")).toDF("id", "item"), root, "id", T1)
    // a clustering rewrite: new group carries everything at T2, the
    // replacecommit hides the T1 group
    HudiMorWrite.writeBase(
      Seq(("1", T2, 1L, "a"), ("2", T2, 2L, "b"))
        .toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item"),
      root, "part=0", "fgNew", T2)
    Files.writeString(
      java.nio.file.Paths.get(root, ".hoodie", s"$T3.replacecommit"),
      s"""{"partitionToReplaceFileIds": {"part=0": ["fg-$T1"]}}""")
    val before = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(before === Seq((1L, "a"), (2L, "b")))
    val deleted = HudiClean.clean(spark, root, T9)
    assert(deleted === 1, "the replaced T1 base must be cleaned")
    assert(!files(root).exists(_.contains(s"fg-${T1}_")),
      "replaced group's base file gone")
    val after = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(after === before)
  }
}
