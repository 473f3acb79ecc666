package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}

import graft.SparkSuite

/** [[BucketedLake.buildBloomIndex]] — the FOURTH pruning axis:
  * per-file blooms answer equality probes on high-cardinality non-key
  * columns where min/max windows are useless. Contracts: definite
  * misses drop files (present values keep ~1), unindexed/appended
  * files and type-mismatched literals always keep, the header carries
  * forward through data-preserving commits, and vacuum reclaims only
  * unreferenced sidecars. */
class BucketedBloomSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkb"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")

  private def plannedFiles(path: String, filters: Array[Filter]): Int = {
    val spec = BucketedLake.readSpec(spark, path).get
    val b = new GraftBucketScanBuilder(spark, path, spec)
    b.pushFilters(filters): Unit
    b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition].files.length).sum
  }

  /** 4000 rows, unique uid per row, key-hash spreads uids across all
    * buckets — every file's min/max window spans ~the whole uid range,
    * so only a bloom can skip. */
  private def uidTable(path: String): Unit = {
    val df = (1L to 4000L).map(i => (i, f"uid-${i * 7919 % 4000}%06d", i))
      .toDF("k", "uid", "v")
    BucketedLake.write(df, path, "k", 4)
  }

  test("equality probes drop definite misses; present values read ~1 file") {
    val path = tmp("bkb-basic")
    uidTable(path)
    val probe = Array[Filter](EqualTo("uid", "uid-000707"))
    assert(plannedFiles(path, probe) === 4,
      "without the index every file is a candidate (windows span the range)")
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val kept = plannedFiles(path, probe)
    assert(kept <= 2, s"bloom kept $kept of 4 files for a 1-file value")
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1,
      "an absent value should be a definite miss in ~all files")
    // correctness end-to-end
    assert(table(path).where(col("uid") === "uid-000707").count() === 1L)
    assert(table(path).where(col("uid") === "uid-001234x").count() === 0L)
  }

  test("IN probes keep a file if ANY value might be present") {
    val path = tmp("bkb-in")
    uidTable(path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val twoVals = Array[Filter](In("uid",
      Array[Any]("uid-000707", "uid-001414")))
    val kept = plannedFiles(path, twoVals)
    assert(kept >= 1 && kept <= 3, s"IN probe kept $kept files")
    assert(table(path)
      .where(col("uid").isin("uid-000707", "uid-001414")).count() === 2L)
  }

  test("type-mismatched literals never probe (strict canonicalization)") {
    val path = tmp("bkb-strict")
    BucketedLake.write((1L to 100L).map(i => (i, i * 10)).toDF("k", "v"),
      path, "k", 2)
    BucketedLake.buildBloomIndex(spark, path, Seq("v"))
    // v is LongType; an Int literal must not hash (a coerced hash would
    // differ from the write side and could skip matching files)
    assert(plannedFiles(path, Array(EqualTo("v", 10.asInstanceOf[Any])))
      === 2)
    // the exact-type literal probes and drops the miss
    assert(plannedFiles(path,
      Array(EqualTo("v", java.lang.Long.valueOf(999999L)))) === 0)
  }

  test("files appended after the build keep (no skip) until a rebuild covers them") {
    val path = tmp("bkb-append")
    uidTable(path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    Seq((9001L, "uid-fresh1", 1L), (9002L, "uid-fresh2", 2L))
      .toDF("k", "uid", "v").writeTo(s"$cat.`$path`").append()
    // the header carried forward; the appended files are unindexed and
    // MUST be kept even for a definitely-absent-from-indexed-files value
    val kept = plannedFiles(path, Array(EqualTo("uid", "uid-fresh1")))
    assert(kept >= 1, "unindexed appended files must never be skipped")
    assert(table(path).where(col("uid") === "uid-fresh1").count() === 1L)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    assert(table(path).where(col("uid") === "uid-fresh1").count() === 1L)
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1)
  }

  test("compaction EXTENDS the sidecar: rewritten files skip without a rebuild; vacuum reclaims the superseded one") {
    val path = tmp("bkb-lifecycle")
    uidTable(path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val sidecar1 = BucketedLake.readManifestFull(spark, path).get.bloom.get
    Seq((9001L, "uid-fresh1", 1L)).toDF("k", "uid", "v")
      .writeTo(s"$cat.`$path`").append()
    BucketedLake.compact(spark, path)
    val afterCompact = BucketedLake.readManifestFull(spark, path).get
    // a rewrite must NOT carry the stale header: the folded file would
    // silently lose bloom coverage until a manual rebuild
    assert(afterCompact.bloom.isDefined &&
      !afterCompact.bloom.contains(sidecar1),
      "compact must commit an EXTENDED sidecar, not the stale one")
    val sidecar2 = afterCompact.bloom.get
    // the compacted file is covered: a definite miss skips EVERY file
    // with no rebuild in between
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1,
      "rewritten files must keep bloom coverage without a rebuild")
    // values that moved INTO the fresh file still probe correctly
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-fresh1"))) >= 1)
    assert(table(path).where(col("uid") === "uid-fresh1").count() === 1L)
    assert(table(path).where(col("uid") === "uid-000707").count() === 1L)
    // the superseded sidecar is unreferenced once old versions expire
    val rep = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
    assert(rep.indexDirs === 1,
      s"the reclaimed sidecar must report as indexDirs, got $rep")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, sidecar1)),
      "the superseded sidecar must be reclaimed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, sidecar2)),
      "the referenced sidecar must survive")
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1,
      "pruning must still work off the surviving sidecar")
    assert(table(path).where(col("uid") === "uid-000707").count() === 1L)
  }

  test("cluster() extends bloom coverage over every rewritten file") {
    val path = tmp("bkb-cluster")
    uidTable(path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val sidecar1 = BucketedLake.readManifestFull(spark, path).get.bloom.get
    // cluster by a non-key column: EVERY file rewrites (and the sorted
    // claim drops) — without the carry-through, skipping would go
    // completely dark
    BucketedLake.cluster(spark, path, Seq("v"), maxRowsPerFile = 600L)
    val after = BucketedLake.readManifestFull(spark, path).get
    assert(after.bloom.isDefined && !after.bloom.contains(sidecar1))
    val nFiles = after.entries.length
    assert(nFiles > 4, "maxRowsPerFile must have split the buckets")
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1,
      s"a definite miss must skip ~all $nFiles rewritten files")
    val kept = plannedFiles(path, Array(EqualTo("uid", "uid-000707")))
    assert(kept >= 1 && kept <= 2, s"present value kept $kept files")
    assert(table(path).where(col("uid") === "uid-000707").count() === 1L)
  }

  test("incremental rebuild copies covered files forward byte-identically and reads only new ones") {
    val path = tmp("bkb-incr")
    uidTable(path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val s1 = BucketedLake.readManifestFull(spark, path).get.bloom.get
    val rows1 = spark.read.parquet(s"$path/$s1")
      .select("rel", "m", "k", "bits").collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq)).toMap
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    Seq((9001L, "uid-fresh1", 1L)).toDF("k", "uid", "v")
      .writeTo(s"$cat.`$path`").append()
    BucketedLake.buildBloomIndex(spark, path, Seq("uid")) // incremental
    val s2 = BucketedLake.readManifestFull(spark, path).get.bloom.get
    assert(s2 !== s1)
    val rows2 = spark.read.parquet(s"$path/$s2")
      .select("rel", "m", "k", "bits").collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq)).toMap
    // every originally-covered file's bloom is copied forward VERBATIM
    rows1.foreach { case (rel, v) =>
      assert(rows2.get(rel).contains(v),
        s"covered file $rel was rebuilt or dropped") }
    // the appended file is now covered too, and probing works end-to-end
    assert(rows2.size === rows1.size + 1)
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1)
    assert(table(path).where(col("uid") === "uid-fresh1").count() === 1L)
    // a full rebuild still yields a correct index
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"),
      incremental = false)
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1)
    assert(table(path).where(col("uid") === "uid-000707").count() === 1L)
  }

  test("a missing sidecar (manual damage) keeps every candidate — never wrong") {
    val path = tmp("bkb-missing")
    uidTable(path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val sidecar = BucketedLake.readManifestFull(spark, path).get.bloom.get
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, sidecar), true): Unit
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) === 4)
    assert(table(path).where(col("uid") === "uid-000707").count() === 1L)
  }

  test("graft_bucketed_files: one metadata row per live file, bloom coverage visible") {
    val path = tmp("bkb-files")
    val df = (1L to 1000L).map(i =>
      (i, s"d${i % 2}", f"uid-$i%05d")).toDF("k", "dt", "uid")
    BucketedLake.write(df, path, "k", 4, partitionCol = Some("dt"))
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    Seq((9001L, "d0", "uid-fresh")).toDF("k", "dt", "uid")
      .writeTo(s"$cat.`$path`").append()
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      s"SELECT * FROM graft_bucketed_files('$path')").collect()
    val m = BucketedLake.readManifestFull(spark, path).get
    assert(rows.length === m.entries.length)
    assert(rows.map(_.getAs[Long]("rows")).sum === 1001L)
    assert(rows.map(_.getAs[String]("partition")).toSet === Set("d0", "d1"))
    assert(rows.forall(_.getAs[Boolean]("has_stats")))
    // indexed originals say 'uid'; the fresh append is uncovered
    val (covered, uncovered) =
      rows.partition(_.getAs[String]("bloom_cols") == "uid")
    assert(covered.length === m.entries.length - 1 &&
      uncovered.length === 1)
    assert(uncovered.head.getAs[Long]("rows") === 1L)
    // a pinned version shows ITS file set
    val v1 = spark.sql(
      s"SELECT count(*) AS n, sum(rows) AS r " +
        s"FROM graft_bucketed_files('$path', 1)").head()
    assert(v1.getLong(1) === 1000L)
  }

  test("empty-table build is a no-op: no sidecar, no header, later reads never brick") {
    val path = tmp("bkb-empty")
    val df = (1L to 100L).map(i => (i, s"d${i % 2}", f"uid-$i%06d"))
      .toDF("k", "dt", "uid")
    BucketedLake.write(df, path, "k", 2, partitionCols = Seq("dt"))
    // metadata DELETE-all: a live table with ZERO entries in its manifest
    spark.sql(s"DELETE FROM $cat.`$path` WHERE dt IN ('d0', 'd1')")
    assert(table(path).count() === 0L)
    val vBefore = BucketedLake.currentVersion(spark, path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val m = BucketedLake.readManifestFull(spark, path).get
    assert(m.bloom.isEmpty,
      "a zero-entries build must not commit a #bloom header")
    assert(BucketedLake.currentVersion(spark, path) === vBefore,
      "a no-op build must not burn a version")
    // the regression scenario: append AFTER the empty build, then every
    // sidecar-reading path must still work (r14 threw 'Unable to infer
    // schema' in all three)
    Seq((9001L, "d0", "uid-fresh1")).toDF("k", "dt", "uid")
      .writeTo(s"$cat.`$path`").append()
    assert(table(path).where(col("uid") === "uid-fresh1").count() === 1L)
    BucketedLake.files(spark, path).collect(): Unit
    BucketedLake.buildBloomIndex(spark, path, Seq("uid")) // incremental
    assert(BucketedLake.readManifestFull(spark, path).get.bloom.isDefined)
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-zzzzzz"))) <= 1,
      "after real data lands, a fresh build must index it")
    assert(table(path).where(col("uid") === "uid-fresh1").count() === 1L)
  }

  test("a file-less sidecar dir (pre-guard damage) degrades to no-skip everywhere and self-heals") {
    val path = tmp("bkb-fileless")
    uidTable(path)
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    val rel = BucketedLake.readManifestFull(spark, path).get.bloom.get
    // gut the sidecar to what the r14 empty build wrote: the dir with
    // only a _SUCCESS marker, while the manifest header still points at it
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scPath = new org.apache.hadoop.fs.Path(path, rel)
    fs.delete(scPath, true): Unit
    fs.mkdirs(scPath): Unit
    fs.create(new org.apache.hadoop.fs.Path(scPath, "_SUCCESS")).close()
    // scan probe: explicit schema reads the empty dir as zero rows ->
    // no drops, every candidate kept, results right
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) === 4)
    assert(table(path).where(col("uid") === "uid-000707").count() === 1L)
    // files TVF: coverage reads empty, never throws
    val cov = BucketedLake.files(spark, path)
      .select("bloom_cols").collect().map(_.getString(0))
    assert(cov.forall(_ == ""))
    // incremental rebuild self-heals: nothing covered -> full rebuild
    BucketedLake.buildBloomIndex(spark, path, Seq("uid"))
    assert(plannedFiles(path, Array(EqualTo("uid", "uid-001234x"))) <= 1,
      "the rebuilt index must skip again")
  }

  test("a numeric-looking indexed column name round-trips (partition-dir type pinning)") {
    val path = tmp("bkb-numname")
    // the sidecar stores column NAMES as partition-dir values: without
    // an explicit read schema, `col=123` re-infers as int and every
    // getString throws ClassCastException
    val df = (1L to 2000L).map(i => (i, f"uid-${i * 7919 % 2000}%06d"))
      .toDF("k", "123")
    BucketedLake.write(df, path, "k", 4)
    BucketedLake.buildBloomIndex(spark, path, Seq("123"))
    assert(plannedFiles(path, Array(EqualTo("123", "uid-zzzzzz"))) <= 1)
    assert(table(path).where(col("123") === "uid-000707").count() === 1L)
    val cov = BucketedLake.files(spark, path)
      .select("bloom_cols").collect().map(_.getString(0))
    assert(cov.forall(_ == "123"))
    // incremental maintenance over it (the covered-pairs read) works too
    Seq((9001L, "uid-fresh1")).toDF("k", "123")
      .writeTo(s"$cat.`$path`").append()
    BucketedLake.buildBloomIndex(spark, path, Seq("123"))
    assert(plannedFiles(path, Array(EqualTo("123", "uid-zzzzzz"))) <= 1)
    assert(table(path).where(col("123") === "uid-fresh1").count() === 1L)
  }

  test("guards: unknown column, un-indexable type, no manifest") {
    val path = tmp("bkb-guards")
    BucketedLake.write(
      (1L to 10L).map(i => (i, Array[Byte](i.toByte))).toDF("k", "b"),
      path, "k", 2)
    val e1 = intercept[IllegalArgumentException](
      BucketedLake.buildBloomIndex(spark, path, Seq("nope")))
    assert(e1.getMessage.contains("no column"))
    val e2 = intercept[IllegalArgumentException](
      BucketedLake.buildBloomIndex(spark, path, Seq("b")))
    assert(e2.getMessage.contains("not"))
  }
}
