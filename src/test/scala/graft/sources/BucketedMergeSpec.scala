package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Row-level MERGE/DELETE/UPDATE on the bucketed lake
  * ([[BucketedLake.merge]]): copy-on-write at (partition, bucket) group
  * granularity — results match a recompute, untouched files survive
  * BYTE-IDENTICAL (same manifest rels), the precise change feed carries
  * Delta-CDF row classes, MVCC keeps pinned/time-travel readers on the
  * pre-merge snapshot, and every ambiguous input fails loudly. */
class BucketedMergeSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkm"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")

  private def kv(path: String): Map[Long, Long] =
    table(path).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("merge = upsert + delete; snapshot matches the recompute; stats exact") {
    val path = tmp("bkm-basic")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 8)
    val ups = Seq((10L, 1000L), (20L, 2000L), (30L, 3000L), (200L, 42L))
      .toDF("k", "v")
    val dels = (1L to 100L).filter(_ % 7 == 0).toDF("k")
    val st = BucketedLake.merge(spark, path, ups, dels)
    assert(st.updated === 3L) // 10, 20, 30 existed
    assert(st.inserted === 1L) // 200 is new
    assert(st.deleted === 14L) // 7, 14, ..., 98
    val expected = ((1L to 100L).filterNot(_ % 7 == 0)
      .map(i => i -> i).toMap ++ Map(10L -> 1000L, 20L -> 2000L,
      30L -> 3000L, 200L -> 42L))
    assert(kv(path) === expected)
    // the manifest's COUNT(*) pushdown stays exact across a merge
    assert(table(path).count() === expected.size.toLong)
  }

  test("copy-on-write blast radius: untouched buckets' files survive byte-identical") {
    val path = tmp("bkm-cow")
    BucketedLake.write((1L to 1000L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 8)
    val before = BucketedLake.readManifest(spark, path).get
      .map(e => e.rel -> e.size).toMap
    // one upserted key + one deleted key -> at most 2 buckets rewrite
    val st = BucketedLake.merge(spark, path,
      Seq((42L, -42L)).toDF("k", "v"), Seq(777L).toDF("k"))
    assert(st.rewrittenFiles <= 2,
      s"a 2-key merge rewrote ${st.rewrittenFiles} files")
    val after = BucketedLake.readManifest(spark, path).get
    // every kept entry is the SAME file (rel + size) as before
    val fresh = after.filterNot(e => before.contains(e.rel))
    val kept = after.filter(e => before.contains(e.rel))
    assert(fresh.size === st.rewrittenFiles ||
      fresh.size <= 2) // new files for the rewritten groups only
    kept.foreach(e => assert(before(e.rel) === e.size))
    assert(kept.size === before.size - st.rewrittenFiles)
    assert(kv(path).get(42L) === Some(-42L))
    assert(!kv(path).contains(777L))
  }

  test("two-axis layout: only the touched (partition, bucket) groups rewrite") {
    val path = tmp("bkm-2axis")
    val df = (1L to 400L)
      .map(i => (i, java.sql.Date.valueOf(f"2024-01-${1 + (i % 4)}%02d"), i))
      .toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 4, partitionCol = Some("dt"))
    val before = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    // upsert ONE key, keeping its partition value
    val ups = Seq((8L, java.sql.Date.valueOf("2024-01-01"), -8L))
      .toDF("k", "dt", "v")
    val st = BucketedLake.merge(spark, path, ups,
      spark.emptyDataset[Long].toDF("k"))
    // k=8 lives in exactly one (partition, bucket) group
    assert(st.rewrittenGroups === 1, s"expected 1 group, got $st")
    assert(st.rewrittenFiles === 1)
    val after = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    assert((before -- after).size === 1) // one file superseded
    assert((after -- before).size === 1) // one file written
    val got = table(path).where(col("k") === 8L).collect()
    assert(got.length === 1 && got.head.getLong(2) === -8L)
    assert(table(path).count() === 400L)
  }

  test("updateWhere can move a row across partitions; deleteWhere by predicate") {
    val path = tmp("bkm-move")
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    BucketedLake.write((1L to 100L).map(i =>
      (i, if (i <= 50) d1 else d2, i)).toDF("k", "dt", "v"),
      path, "k", 4, partitionCol = Some("dt"))
    // move k=5 from the January partition to February, doubling v
    val st = BucketedLake.updateWhere(spark, path, col("k") === 5L,
      Map("dt" -> lit(d2), "v" -> (col("v") * 2)))
    assert(st.updated === 1L && st.inserted === 0L && st.deleted === 0L)
    // both the old and new group rewrote (the row changed partition)
    assert(st.rewrittenGroups === 2)
    val moved = table(path).where(col("k") === 5L).collect()
    assert(moved.length === 1 && moved.head.getDate(1) === d2 &&
      moved.head.getLong(2) === 10L)
    assert(table(path).count() === 100L)
    // predicate delete on a NON-key column
    val st2 = BucketedLake.deleteWhere(spark, path, col("v") > 90L)
    assert(st2.deleted === 10L) // v in 91..100
    assert(table(path).count() === 90L)
    // updateWhere cannot touch the bucket key
    val e = intercept[IllegalArgumentException] {
      BucketedLake.updateWhere(spark, path, col("k") === 1L,
        Map("k" -> lit(999L)))
    }
    assert(e.getMessage.contains("bucket key"))
  }

  test("precise change feed: delete / update pre+post / insert row classes") {
    val path = tmp("bkm-cdf")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // v1
    val st = BucketedLake.merge(spark, path,
      Seq((3L, 300L), (11L, 110L)).toDF("k", "v"), Seq(7L).toDF("k")) // v2
    assert(st.version === 2L)
    val feed = BucketedLake.changes(spark, path, 1L, 2L)
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
      .toSet
    assert(feed === Set(
      ("delete", 7L, 7L),
      ("update_preimage", 3L, 3L),
      ("update_postimage", 3L, 300L),
      ("insert", 11L, 110L)))
    // time travel: the pre-merge snapshot is untouched
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    val v1 = spark.sql(
      s"SELECT count(*) AS n, sum(v) AS s FROM graft_bucketed('$path', 1)")
      .head()
    assert(v1.getLong(0) === 10L && v1.getLong(1) === (1L to 10L).sum)
  }

  test("ambiguous inputs fail loudly; schema contract enforced") {
    val path = tmp("bkm-guards")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    val dup = intercept[IllegalArgumentException] {
      BucketedLake.merge(spark, path,
        Seq((1L, 10L), (1L, 20L)).toDF("k", "v"),
        spark.emptyDataset[Long].toDF("k"))
    }
    assert(dup.getMessage.contains("duplicate upsert keys"))
    val overlap = intercept[IllegalArgumentException] {
      BucketedLake.merge(spark, path, Seq((1L, 10L)).toDF("k", "v"),
        Seq(1L).toDF("k"))
    }
    assert(overlap.getMessage.contains("ambiguous"))
    val nullKey = intercept[IllegalArgumentException] {
      BucketedLake.merge(spark, path,
        Seq((Some(1L), 10L), (None, 20L))
          .toDF("k", "v").select(col("k"), col("v")),
        spark.emptyDataset[Long].toDF("k"))
    }
    assert(nullKey.getMessage.contains("null upsert key"))
    val schema = intercept[IllegalArgumentException] {
      BucketedLake.merge(spark, path, Seq((1L, "x")).toDF("k", "v"),
        spark.emptyDataset[Long].toDF("k"))
    }
    assert(schema.getMessage.contains("schema"))
    // null delete keys match nothing (SQL semantics), never throw
    val st = BucketedLake.merge(spark, path,
      spark.emptyDataset[(Long, Long)].toDF("k", "v"),
      Seq(Some(2L), None).toDF("k"))
    assert(st.deleted === 1L)
    assert(table(path).count() === 9L)
  }

  test("merge requires an MVCC manifest (legacy tables upgrade first)") {
    val path = tmp("bkm-legacy")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    // strip the MVCC state: pointer + versioned manifests
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("_bucket_manifest"))
      .foreach(st => fs.delete(st.getPath, false))
    val e = intercept[IllegalStateException] {
      BucketedLake.merge(spark, path, Seq((1L, 10L)).toDF("k", "v"),
        spark.emptyDataset[Long].toDF("k"))
    }
    assert(e.getMessage.contains("MVCC"))
    // the documented upgrade: compact() materializes a manifest
    BucketedLake.compact(spark, path)
    val st = BucketedLake.merge(spark, path, Seq((1L, 10L)).toDF("k", "v"),
      spark.emptyDataset[Long].toDF("k"))
    assert(st.updated === 1L)
    assert(kv(path)(1L) === 10L)
  }

  test("merged buckets stay key-sorted single files: compaction not needed for the ordering claim") {
    val path = tmp("bkm-sorted")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    BucketedLake.merge(spark, path, Seq((5L, 50L)).toDF("k", "v"),
      spark.emptyDataset[Long].toDF("k")): Unit
    // the rewritten bucket still has exactly ONE file, key-sorted
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.groupBy(_.bucket).forall(_._2.size === 1),
      s"merge split a bucket into multiple files: $m")
    // within-file order: read the rewritten bucket's file raw
    val rewritten = m.filter(_.rel.contains("merge-"))
    assert(rewritten.size === 1)
    val rows = spark.read.parquet(s"$path/${rewritten.head.rel}")
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(rows === rows.sorted, "rewritten bucket file lost its key order")
  }
}
