package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SQL row-level DML (`MERGE INTO` / `UPDATE` / row-level `DELETE`)
  * on the bucketed lake — the group-based copy-on-write connector
  * ([[GraftRowLevelOperation]]): Spark's own rewrite rules derive the
  * replacement rows, the connector swaps exactly the scanned files in
  * one OCC-gated manifest flip, and the runtime group filter keeps the
  * blast radius at the files that actually hold matches. */
class BucketedRowLevelSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkr"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")
  private def rels(path: String): Set[String] =
    BucketedLake.readManifest(spark, path).get.map(_.rel).toSet

  test("_file metadata column: root-relative provenance on any scan") {
    val path = tmp("bkr-file")
    BucketedLake.write((1L to 100L).map(i => (i, i * 2)).toDF("k", "v"),
      path, "k", 4)
    val rows = table(path).select($"_file", $"k").collect()
    assert(rows.length === 100)
    val live = rels(path)
    rows.foreach { r =>
      assert(live.contains(r.getString(0)),
        s"_file must be a live manifest rel: ${r.getString(0)}")
    }
    // per-file row counts through _file agree with the manifest
    val byFile = table(path).groupBy($"_file").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    BucketedLake.readManifest(spark, path).get.foreach(e =>
      assert(byFile(e.rel) === e.rows))
  }

  test("SQL UPDATE: copy-on-write rewrite, only matching files touched") {
    val path = tmp("bkr-upd")
    BucketedLake.write((1L to 400L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 8)
    val before = rels(path)
    spark.sql(s"UPDATE $cat.`$path` SET v = v + 1000 WHERE k = 7")
    assert(table(path).where($"k" === 7).select("v").head().getLong(0)
      === 1007L)
    assert(table(path).count() === 400L)
    assert(table(path).agg(sum($"v")).head().getLong(0)
      === (1L to 400L).sum + 1000L)
    val after = rels(path)
    // blast radius: exactly the key's file replaced (1 of 8 buckets)
    assert(before.diff(after).size === 1,
      s"one file out, got removed=${before.diff(after)}")
    assert(after.diff(before).size === 1,
      s"one file in, got added=${after.diff(before)}")
    // commit is op-tagged for the change feed
    val v = BucketedLake.currentVersion(spark, path).get
    assert(BucketedLake.readManifestFull(spark, path, Some(v)).get.op
      .contains("update"))
  }

  test("SQL row-level DELETE: rewrite path for non-partition predicates") {
    val path = tmp("bkr-del")
    BucketedLake.write((1L to 300L).map(i => (i, i % 10)).toDF("k", "v"),
      path, "k", 4)
    // previously refused loudly; now a copy-on-write rewrite
    spark.sql(s"DELETE FROM $cat.`$path` WHERE v = 5")
    assert(table(path).where($"v" === 5).count() === 0L)
    assert(table(path).count() === 270L)
    val v = BucketedLake.currentVersion(spark, path).get
    assert(BucketedLake.readManifestFull(spark, path, Some(v)).get.op
      .contains("delete"))
    // the feed renders the rewrite (coarse file-diff: deletes >= real)
    val feed = BucketedLake.changes(spark, path, v - 1L, v)
    assert(feed.where($"_change_type" === "delete" && $"v" === 5)
      .count() === 30L)
  }

  test("SQL MERGE INTO: update+insert+delete actions; 2-key merge rewrites <= 2 files") {
    val path = tmp("bkr-merge")
    BucketedLake.write(
      (1L to 4000L).map(i => (i, i, "base")).toDF("k", "v", "tag"),
      path, "k", 16)
    val filesBefore = rels(path)
    assert(filesBefore.size === 16)
    spark.sql(s"""
      MERGE INTO $cat.`$path` t
      USING (SELECT * FROM VALUES (17L, 1700L, 'upd'), (99999L, 9L, 'new')
             AS s(k, v, tag)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
      WHEN NOT MATCHED THEN INSERT *
    """)
    assert(table(path).where($"k" === 17).select("v", "tag").head()
      .toSeq === Seq(1700L, "upd"))
    assert(table(path).where($"k" === 99999L).count() === 1L)
    assert(table(path).count() === 4001L)
    val filesAfter = rels(path)
    // THE blast-radius contract: a 2-key MERGE touches at most the 2
    // key-holding files (runtime group filtering; the insert may land
    // in a new or rewritten bucket file)
    assert(filesBefore.diff(filesAfter).size <= 2,
      s"2-key MERGE must rewrite <= 2 files, removed " +
        s"${filesBefore.diff(filesAfter)}")
    val v = BucketedLake.currentVersion(spark, path).get
    assert(BucketedLake.readManifestFull(spark, path, Some(v)).get.op
      .contains("merge"))
    // delete action
    spark.sql(s"""
      MERGE INTO $cat.`$path` t
      USING (SELECT 99999L AS k) s
      ON t.k = s.k
      WHEN MATCHED THEN DELETE
    """)
    assert(table(path).where($"k" === 99999L).count() === 0L)
    assert(table(path).count() === 4000L)
  }

  test("partition-axis DELETE still takes the zero-IO metadata path") {
    val path = tmp("bkr-meta")
    val d1 = Date.valueOf("2024-01-01"); val d2 = Date.valueOf("2024-01-02")
    BucketedLake.write(
      ((1L to 30L).map(i => (i, d1, i)) ++ (31L to 60L).map(i => (i, d2, i)))
        .toDF("k", "dt", "v"),
      path, "k", 4, partitionCol = Some("dt"))
    val before = rels(path)
    spark.sql(s"DELETE FROM $cat.`$path` WHERE dt = DATE'2024-01-02'")
    val after = rels(path)
    // pure manifest edit: every surviving file is an ORIGINAL file —
    // the row-level rewrite never ran
    assert(after.subsetOf(before), "metadata delete must not write files")
    assert(table(path).count() === 30L)
  }

  test("SQL UPDATE on a composite-partitioned table rewrites only the matching group") {
    val path = tmp("bkr-comp")
    val d1 = Date.valueOf("2024-01-01"); val d2 = Date.valueOf("2024-01-02")
    BucketedLake.write(
      (1L to 400L).map(i =>
        (i, Seq(d1, d2)((i % 2L).toInt), Seq("EU", "US")((i % 4L / 2L).toInt),
          i))
        .toDF("k", "dt", "region", "v"),
      path, "k", 4, partitionCols = Seq("dt", "region"))
    val before = rels(path)
    assert(before.size > 4, s"expected many groups, got ${before.size}")
    // k = 6: 6%2=0 -> d1; 6%4/2=1 -> US; one key, one (dt,region,bucket)
    spark.sql(s"UPDATE $cat.`$path` SET v = 9999 WHERE k = 6")
    assert(table(path).where($"k" === 6).select("v").head().getLong(0)
      === 9999L)
    assert(table(path).count() === 400L)
    val after = rels(path)
    val removed = before.diff(after)
    assert(removed.size === 1, s"one group out, got $removed")
    assert(removed.forall(r => r.contains("__part=2024-01-01/") &&
      r.contains("__part2=US/")),
      s"wrong group rewritten: $removed")
    val added = after.diff(before)
    assert(added.forall(r => r.contains("__part=2024-01-01/") &&
      r.contains("__part2=US/")),
      s"replacement landed outside the group: $added")
    // cross-axis row-level DELETE composes with the rewrite too
    spark.sql(
      s"DELETE FROM $cat.`$path` WHERE region = 'EU' AND v % 10 = 3")
    assert(table(path).where($"region" === "EU" && $"v" % 10 === 3)
      .count() === 0L)
    assert(table(path).where($"region" === "US").count() === 200L,
      "the US axis must be untouched")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF pin retained snapshots") {
    val path = tmp("bkr-tt")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2) // v1
    Thread.sleep(1100) // mtime resolution guard for the timestamp leg
    val betweenMicros = System.currentTimeMillis() * 1000L
    Thread.sleep(1100)
    (101L to 150L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    assert(table(path).count() === 150L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.`$path` VERSION AS OF 1")
      .head().getLong(0) === 100L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.`$path` VERSION AS OF 2")
      .head().getLong(0) === 150L)
    // timestamp between the commits resolves to v1
    val ts = java.time.Instant.ofEpochMilli(betweenMicros / 1000L)
      .toString.replace("T", " ").stripSuffix("Z")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.`$path` TIMESTAMP AS OF '$ts'")
      .head().getLong(0) === 100L)
    // a missing version fails loudly at analysis, naming the retained set
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.`$path` VERSION AS OF 99").collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("99")), msgs(e))
    // a snapshot refuses writes
    val e2 = intercept[Exception](spark.sql(
      s"DELETE FROM $cat.`$path` VERSION AS OF 1 WHERE k = 1"))
    assert(e2 != null)
  }

  test("MERGE conflicts loudly with a concurrent commit (OCC)") {
    val path = tmp("bkr-occ")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    // simulate a racing commit landing between the statement's snapshot
    // and its write: bump the version under the operation's feet
    val op = new GraftRowLevelOperation(spark, path,
      BucketedLake.readSpec(spark, path).get,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE)
    (101L to 110L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    val bw = new GraftRowLevelBatchWrite(spark, path,
      BucketedLake.readSpec(spark, path).get, op, s"$path/.rowlevel-test")
    op.configuredScan = new GraftRowLevelScan(spark, path,
      BucketedLake.readSpec(spark, path).get,
      BucketedLake.readSpec(spark, path).get.schema, None, Array.empty, op)
    intercept[BucketedLake.ConcurrentCommitException] {
      bw.commit(Array.empty)
    }
    // the table is untouched: appended rows live, no replacement landed
    assert(table(path).count() === 110L)
  }
}
