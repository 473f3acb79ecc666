package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, LessThan}

import graft.SparkSuite

/** [[BucketedLake.cluster]]: sort / Z-order rewrites that make the
  * manifest's data-skipping axis effective INSIDE buckets — files
  * split into tight min/max windows, range/equality predicates drop
  * most of a bucket, rows and results unchanged, the commit is
  * CDF-invisible physical reorganization, and the key-order claim
  * withdraws when clustering gives it up. */
class BucketedClusterSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkc"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")

  /** Files a plan-time-pruned scan reads under `filters`. */
  private def plannedFiles(path: String, filters: Array[Filter]): Int = {
    val spec = BucketedLake.readSpec(spark, path).get
    val b = new GraftBucketScanBuilder(spark, path, spec)
    b.pushFilters(filters): Unit
    b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition].files.length).sum
  }

  /** 8000 rows whose `v` is a pseudo-random permutation — before
    * clustering every file's window spans the whole range. */
  private def shuffled(path: String): Unit = {
    val df = (1L to 8000L)
      .map(i => (i, ((i * 2654435761L) % 8000L).toInt)).toDF("k", "v")
    BucketedLake.write(df, path, "k", 4)
  }

  test("clustering turns on intra-bucket skipping; rows and results unchanged") {
    val path = tmp("bkc-basic")
    shuffled(path)
    val before = table(path).orderBy("k").collect().toSeq
    // unclustered: every file spans ~the whole v range — nothing skips
    val all0 = plannedFiles(path, Array.empty)
    assert(plannedFiles(path, Array(LessThan("v", 100))) === all0)
    BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 500L)
    val all1 = plannedFiles(path, Array.empty)
    assert(all1 > 4, s"expected split files, got $all1") // 4 buckets, ~4 files each
    val ranged = plannedFiles(path, Array(LessThan("v", 100)))
    assert(ranged * 2 < all1,
      s"range predicate kept $ranged of $all1 clustered files")
    val point = plannedFiles(path, Array(EqualTo("v", 4321)))
    assert(point <= 4, s"equality kept $point files (expected <=1 per bucket)")
    assert(table(path).orderBy("k").collect().toSeq === before)
    assert(table(path).where(col("v") < 100).count() ===
      before.count(_.getInt(1) < 100))
  }

  test("Z-order keeps EVERY clustered column skippable at once") {
    val path = tmp("bkc-zorder")
    val df = (0L until 10000L)
      .map(i => (i, (i % 100).toInt, (i / 100).toInt)).toDF("k", "x", "y")
    BucketedLake.write(df, path, "k", 2)
    BucketedLake.cluster(spark, path, Seq("x", "y"), maxRowsPerFile = 500L)
    val all = plannedFiles(path, Array.empty)
    val onX = plannedFiles(path, Array(EqualTo("x", 7)))
    val onY = plannedFiles(path, Array(EqualTo("y", 93)))
    assert(onX * 2 < all, s"x-equality kept $onX of $all")
    assert(onY * 2 < all, s"y-equality kept $onY of $all")
    assert(table(path).where(col("x") === 7).count() === 100L)
    assert(table(path).where(col("y") === 93).count() === 100L)
  }

  test("clustering is CDF-invisible and MVCC (pinned reader + vacuum lifecycle)") {
    val path = tmp("bkc-mvcc")
    shuffled(path)
    val v1 = BucketedLake.currentVersion(spark, path).get
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    val pinned = spark.sql(s"SELECT * FROM graft_bucketed('$path', $v1)")
    BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 1000L)
    val v2 = BucketedLake.currentVersion(spark, path).get
    assert(v2 === v1 + 1)
    // physical reorganization: the change feed is empty across it
    assert(BucketedLake.changes(spark, path, v1, v2).count() === 0L)
    // the pinned snapshot still reads (superseded files intact)
    assert(pinned.count() === 8000L)
    // force-vacuum reclaims the superseded files; the live table reads
    val report = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
    assert(report.files > 0)
    assert(table(path).count() === 8000L)
  }

  test("non-key clustering drops the key-order claim; key clustering keeps it") {
    val path = tmp("bkc-sorted")
    shuffled(path)
    assert(BucketedLake.readSpec(spark, path).get.sorted)
    BucketedLake.cluster(spark, path, Seq("k"), maxRowsPerFile = 1000L)
    assert(BucketedLake.readSpec(spark, path).get.sorted,
      "clustering by the bucket key preserves per-file key order")
    BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 1000L)
    assert(!BucketedLake.readSpec(spark, path).get.sorted,
      "clustering by a non-key column must withdraw the order claim")
  }

  test("the sorted claim rides the manifest: per-version, atomic with the file flip") {
    val path = tmp("bkc-claim")
    shuffled(path)
    val v1 = BucketedLake.currentVersion(spark, path).get
    assert(BucketedLake.readManifestFull(spark, path, Some(v1)).get
      .sortedClaim.contains(true))
    BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 1000L)
    val v2 = BucketedLake.currentVersion(spark, path).get
    assert(BucketedLake.readManifestFull(spark, path, Some(v2)).get
      .sortedClaim.contains(false),
      "the Z-order commit itself must withdraw the claim")
    // time travel: the pre-cluster snapshot keeps ITS OWN claim — its
    // files really are key-sorted, whatever happened at HEAD since
    assert(BucketedLake.readManifestFull(spark, path, Some(v1)).get
      .sortedClaim.contains(true))
    // clustering BY the key rewrites every file key-sorted: claim returns
    BucketedLake.cluster(spark, path, Seq("k"), maxRowsPerFile = 1000L)
    val v3 = BucketedLake.currentVersion(spark, path).get
    assert(BucketedLake.readManifestFull(spark, path, Some(v3)).get
      .sortedClaim.contains(true))
  }

  test("a lost OCC race leaves the sorted claim AND the spec flag intact") {
    val path = tmp("bkc-occ")
    shuffled(path)
    val cur = BucketedLake.currentVersion(spark, path).get
    // occupy the next version slot: the cluster commit must lose the race
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vp = new org.apache.hadoop.fs.Path(path,
      BucketedLake.versionedManifest(cur + 1))
    val out = fs.create(vp, false)
    out.write("#graft\t2\n#end\t0\n".getBytes("UTF-8")); out.close()
    intercept[BucketedLake.ConcurrentCommitException] {
      BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 1000L)
    }
    assert(BucketedLake.readSpec(spark, path).get.sorted,
      "a lost race changed no data — the claim must survive")
    assert(BucketedLake.readManifestFull(spark, path, Some(cur)).get
      .sortedClaim.contains(true))
    // clear the conflict; the retry lands and withdraws it properly
    fs.delete(vp, false): Unit
    BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 1000L)
    assert(!BucketedLake.readSpec(spark, path).get.sorted)
    assert(BucketedLake.readManifestFull(spark, path).get
      .sortedClaim.contains(false))
    assert(table(path).count() === 8000L)
  }

  test("partition-scoped compaction folds ONLY the named partition's groups") {
    val path = tmp("bkc-scoped")
    val df = (1L to 3000L).map(i => (i, s"d${i % 3}", i))
      .toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 2, partitionCols = Seq("dt"))
    // two appends: every (dt, bucket) group becomes multi-file
    (1 to 2).foreach { j =>
      (1L to 30L).map(i => (9000L * j + i, s"d${i % 3}", i))
        .toDF("k", "dt", "v").writeTo(s"$cat.`$path`").append()
    }
    def filesOf(dt: String): Int =
      BucketedLake.files(spark, path)
        .where(col("partition") === dt).count().toInt
    val before = Seq("d0", "d1", "d2").map(filesOf)
    assert(before.forall(_ > 2), s"appends must fan out files: $before")
    val total = spark.read.table(s"$cat.`$path`").count()
    // scope the fold to d1 via SQL CALL
    spark.sql(s"CALL $cat.system.compact('$path', 'dt=d1')").collect()
    val after = Seq("d0", "d1", "d2").map(filesOf)
    assert(after(1) === 2, s"d1 must fold to one file per bucket: $after")
    assert(after(0) === before(0) && after(2) === before(2),
      s"out-of-scope partitions must carry through untouched: $after")
    assert(spark.read.table(s"$cat.`$path`").count() === total)
    // loud on a non-partition column
    val e = intercept[Exception](
      BucketedLake.compact(spark, path, Map("v" -> "1")))
    assert(e.getMessage.contains("not a partition column"))
    // unscoped compact still folds the rest
    BucketedLake.compact(spark, path)
    assert(Seq("d0", "d1", "d2").map(filesOf).forall(_ === 2))
    assert(spark.read.table(s"$cat.`$path`").count() === total)
  }

  test("partition-scoped clustering rewrites ONLY the named partition; claims stay honest") {
    val path = tmp("bkc-scopedcl")
    val df = (1L to 6000L).map(i =>
      (i, s"d${i % 3}", ((i * 2654435761L) % 6000L).toInt))
      .toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 2, partitionCols = Seq("dt"))
    val before = BucketedLake.files(spark, path)
      .select("partition", "file").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val total = table(path).count()
    // scope the Z-rewrite to d1 via SQL CALL (4th positional arg)
    spark.sql(
      s"CALL $cat.system.cluster('$path', 'v', 500, 'dt=d1')").collect()
    val after = BucketedLake.files(spark, path)
      .select("partition", "file").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // out-of-scope partitions carry through FILE-IDENTICAL
    assert(after.filter(_._1 == "d0") === before.filter(_._1 == "d0"))
    assert(after.filter(_._1 == "d2") === before.filter(_._1 == "d2"))
    // in-scope partition rewrote (bounded files -> more, all fresh)
    assert(after.filter(_._1 == "d1").intersect(
      before.filter(_._1 == "d1")).isEmpty,
      "the scoped partition must be fully rewritten")
    assert(after.count(_._1 == "d1") > before.count(_._1 == "d1"))
    assert(table(path).count() === total)
    // skipping fires inside the clustered partition
    val oneDir = plannedFiles(path, Array(EqualTo("dt", "d1")))
    val ranged = plannedFiles(path,
      Array(EqualTo("dt", "d1"), LessThan("v", 300)))
    assert(ranged < oneDir, s"skipping kept $ranged of $oneDir")
    // a PARTIAL non-key cluster drops the key-order claim (fresh files
    // are v-ordered); the spec flag follows
    assert(BucketedLake.readManifestFull(spark, path).get
      .sortedClaim.contains(false))
    // a PARTIAL key-cluster must NOT upgrade the claim back to true —
    // d0/d2's v-ordered files never rewrote... (claim only returns
    // true after a FULL key rewrite)
    BucketedLake.cluster(spark, path, Seq("k"),
      partitionValues = Map("dt" -> "d1"))
    assert(!BucketedLake.readManifestFull(spark, path).get
      .sortedClaim.contains(true),
      "a partial key-cluster cannot assert table-wide key order")
    BucketedLake.cluster(spark, path, Seq("k"))
    assert(BucketedLake.readManifestFull(spark, path).get
      .sortedClaim.contains(true),
      "a FULL key-cluster restores the claim")
    // loud on a non-partition column
    val e = intercept[Exception](BucketedLake.cluster(
      spark, path, Seq("v"), partitionValues = Map("v" -> "1")))
    assert(e.getMessage.contains("not a partition column"))
    assert(table(path).orderBy("k").select("k", "dt", "v").collect().toSeq
      === df.orderBy("k").collect().toSeq)
  }

  test("clustering a partitioned table preserves partition dirs and two-axis pruning") {
    val path = tmp("bkc-part")
    val df = (1L to 6000L).map(i =>
      (i, s"d${i % 3}", ((i * 2654435761L) % 6000L).toInt))
      .toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 4, partitionCol = Some("dt"))
    BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 250L)
    val all = plannedFiles(path, Array.empty)
    val oneDir = plannedFiles(path, Array(EqualTo("dt", "d1")))
    assert(oneDir * 2 < all, s"partition pruning kept $oneDir of $all")
    val both = plannedFiles(path,
      Array(EqualTo("dt", "d1"), LessThan("v", 300)))
    assert(both < oneDir, s"two-axis + skipping kept $both of $oneDir")
    assert(table(path).where(col("dt") === "d1").count() === 2000L)
    assert(table(path).orderBy("k").select("k", "dt", "v").collect().toSeq
      === df.orderBy("k").collect().toSeq)
  }

  test("bounded files: write(maxRowsPerFile) and the V2 append option rotate within groups") {
    val path = tmp("bkc-bounded")
    BucketedLake.write((1L to 4000L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4, maxRowsPerFile = Some(300L))
    val m1 = BucketedLake.readManifestFull(spark, path).get
    assert(m1.entries.length > 8,
      s"expected rotated files, got ${m1.entries.length}")
    assert(m1.entries.forall(_.rows <= 300L))
    // each rotated file is a contiguous KEY run: a key-range predicate
    // skips most of a bucket via the stats windows
    val all = plannedFiles(path, Array.empty)
    val ranged = plannedFiles(path,
      Array(org.apache.spark.sql.sources.LessThan("k", 100L)))
    assert(ranged * 2 < all, s"key-range kept $ranged of $all")
    assert(table(path).count() === 4000L)
    assert(table(path).where(col("k") < 100L).count() === 99L)
    // V2 append rotates too
    (4001L to 5000L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`")
      .option("graft.maxRowsPerFile", "100").append()
    val m2 = BucketedLake.readManifestFull(spark, path).get
    val fresh = m2.entries.filterNot(e => m1.entries.exists(_.rel == e.rel))
    assert(fresh.nonEmpty && fresh.forall(_.rows <= 100L),
      s"appended files must respect the cap: ${fresh.map(_.rows)}")
    assert(table(path).count() === 5000L)
    // COUNT(*) still prices from the manifest at any file count
    val q = spark.sql(s"SELECT count(*) FROM $cat.`$path`")
    assert(q.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("from manifest")))
  }

  test("untrackable/missing columns and empty tables are handled loudly/quietly") {
    val path = tmp("bkc-guards")
    BucketedLake.write(
      (1L to 10L).map(i => (i, Array[Byte](i.toByte))).toDF("k", "b"),
      path, "k", 2)
    val e1 = intercept[IllegalArgumentException](
      BucketedLake.cluster(spark, path, Seq("nope")))
    assert(e1.getMessage.contains("no column"))
    val e2 = intercept[IllegalArgumentException](
      BucketedLake.cluster(spark, path, Seq("b")))
    assert(e2.getMessage.contains("window"))
    val empty = tmp("bkc-empty")
    BucketedLake.createEmpty(spark, empty, "k", 2,
      new org.apache.spark.sql.types.StructType()
        .add("k", "long", nullable = false).add("v", "int"))
    BucketedLake.cluster(spark, empty, Seq("v")) // no-op, no throw
    assert(table(empty).count() === 0L)
  }
}
