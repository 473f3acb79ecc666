package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull, IsNull, LessThan}

import graft.SparkSuite

/** DATA SKIPPING on the bucketed lake ([[FileStats]] + the scan's
  * third pruning axis): per-file min/max/null windows ride every write
  * path (footer sweep on write(), inline tracker on V2 appends, exact
  * merge on compaction), and a predicate on ANY tracked column drops
  * files whose window cannot hold a match — plan-contract-pinned, with
  * the strictness rules (NaN, non-ASCII/oversized strings, type
  * mismatches never mis-prune) probed one by one. */
class BucketedStatsSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bks"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")

  /** Files a plan-time-pruned scan would read, per pushed filters. */
  private def plannedFiles(path: String, filters: Array[Filter]): Int = {
    val spec = BucketedLake.readSpec(spark, path).get
    val b = new GraftBucketScanBuilder(spark, path, spec)
    b.pushFilters(filters): Unit
    b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition].files.length).sum
  }

  /** Three appended generations with DISJOINT v ranges: the classic
    * time-ordered ingest where data skipping shines. */
  private def generations(path: String): Unit = {
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // files with v in [1, 100]
    (101L to 200L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v in [101, 200]
    (201L to 300L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v in [201, 300]
  }

  test("range predicate on a NON-key column skips non-matching generations") {
    val path = tmp("bks-range")
    generations(path)
    val total = plannedFiles(path, Array.empty)
    assert(total === 12, s"expected 3 generations x 4 buckets, got $total")
    // only the third generation's windows intersect v > 250
    assert(plannedFiles(path, Array(GreaterThan("v", 250L))) === 4)
    // two generations intersect v > 150
    assert(plannedFiles(path, Array(GreaterThan("v", 150L))) === 8)
    // nothing intersects v > 1000 — zero files read
    assert(plannedFiles(path, Array(GreaterThan("v", 1000L))) === 0)
    // point equality: one generation AND one bucket (axes compose)
    assert(plannedFiles(path,
      Array(EqualTo("k", 250L), EqualTo("v", 250L))) === 1)
    // correctness: the skipped plan returns the exact recompute
    assert(table(path).where(col("v") > 250L).count() === 50L)
    assert(table(path).where(col("v") > 250L)
      .agg(sum("v")).head().getLong(0) === (251L to 300L).sum)
  }

  test("the V2 writer's inline tracker records exact windows (zero-read commits)") {
    val path = tmp("bks-tracker")
    generations(path)
    val spec = BucketedLake.readSpec(spark, path).get
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.forall(_.stats.isDefined), "every write path must emit stats")
    val appended = m.filter(e => !e.rel.contains("write-"))
    assert(appended.nonEmpty)
    appended.foreach { e =>
      val st = FileStats.decode(e.stats.get, spec.schema)
      val v = st("v")
      assert(v.nulls === Some(0L))
      // each appended file's window sits inside its generation's range
      assert(v.lo.get.asInstanceOf[Long] >= 101L &&
        v.hi.get.asInstanceOf[Long] <= 300L)
      // the key column is tracked too (range predicates on the key
      // skip files even though bucket pruning only handles equality)
      assert(st.contains("k"))
    }
  }

  test("compaction merges windows exactly, with summed null counts") {
    val path = tmp("bks-compact")
    generations(path)
    BucketedLake.compact(spark, path)
    val spec = BucketedLake.readSpec(spark, path).get
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.size === 4, "compaction folds to one file per bucket")
    m.foreach { e =>
      val st = FileStats.decode(e.stats.get, spec.schema)
      assert(st("v").nulls === Some(0L))
      assert(st("v").lo.get.asInstanceOf[Long] >= 1L &&
        st("v").hi.get.asInstanceOf[Long] <= 300L)
    }
    // the merged windows still skip: post-compaction everything holds
    // v <= 300, so v > 1000 reads zero files
    assert(plannedFiles(path, Array(GreaterThan("v", 1000L))) === 0)
    assert(table(path).count() === 300L)
  }

  test("IS NULL / IS NOT NULL skip by null counts; all-null files have no window") {
    val path = tmp("bks-null")
    BucketedLake.write(
      (1L to 50L).map(i => (i, Option.empty[Long])).toDF("k", "v"),
      path, "k", 2) // all-null v
    (51L to 100L).map(i => (i, Some(i))).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // no nulls
    assert(plannedFiles(path, Array.empty) === 4)
    assert(plannedFiles(path, Array(IsNull("v"))) === 2)
    assert(plannedFiles(path, Array(IsNotNull("v"))) === 2)
    // equality against an all-null file skips it (no window = no value)
    assert(plannedFiles(path, Array(EqualTo("v", 60L))) === 2)
    assert(table(path).where(col("v").isNull).count() === 50L)
    assert(table(path).where(col("v") === 60L).count() === 1L)
  }

  test("NaN poisons a float column's stats: the file is kept, results exact") {
    val path = tmp("bks-nan")
    BucketedLake.write(
      Seq((1L, 1.0d), (2L, Double.NaN), (3L, 3.0d)).toDF("k", "v"),
      path, "k", 1)
    val spec = BucketedLake.readSpec(spark, path).get
    val m = BucketedLake.readManifest(spark, path).get
    // the v column must NOT carry a window (NaN breaks ordering) —
    // either absent entirely or only the null count
    m.foreach { e =>
      val st = FileStats.decode(e.stats.getOrElse("{}"), spec.schema)
      assert(st.get("v").forall(_.lo.isEmpty),
        s"NaN column must not carry a min/max window: $st")
    }
    // NaN sorts ABOVE every double in Spark: v > 2.0 matches NaN + 3.0
    assert(plannedFiles(path, Array(GreaterThan("v", 2.0d))) === 1)
    assert(table(path).where(col("v") > 2.0d).count() === 2L)
  }

  test("non-ASCII and oversized strings drop the column's window for that file") {
    val path = tmp("bks-str")
    BucketedLake.write(Seq((1L, "alpha"), (2L, "beta")).toDF("k", "s"),
      path, "k", 1) // clean ASCII: window kept
    Seq((3L, "ناروال"), (4L, "z" * 200)).toDF("k", "s")
      .writeTo(s"$cat.`$path`").append() // poisoned: window dropped
    val spec = BucketedLake.readSpec(spark, path).get
    val m = BucketedLake.readManifest(spark, path).get
    val byGen = m.partition(_.rel.contains("write-"))
    byGen._1.foreach { e =>
      val st = FileStats.decode(e.stats.get, spec.schema)
      assert(st("s").lo === Some("alpha") && st("s").hi === Some("beta"))
    }
    byGen._2.foreach { e =>
      val st = FileStats.decode(e.stats.getOrElse("{}"), spec.schema)
      assert(st.get("s").forall(_.lo.isEmpty),
        s"non-ASCII/oversized strings must drop the window: $st")
    }
    // the ASCII window skips; the poisoned file is always kept
    assert(plannedFiles(path, Array(EqualTo("s", "zzz"))) === 1)
    assert(table(path).where(col("s") === "z" * 200).count() === 1L)
  }

  test("strict literal typing: a mismatched literal type never skips") {
    val path = tmp("bks-strict")
    BucketedLake.write(Seq((1L, 1.5f), (2L, 2.5f)).toDF("k", "f"),
      path, "k", 1)
    // Double literal against a Float column: undecidable -> keep
    assert(plannedFiles(path, Array(GreaterThan("f", 10.0d))) === 1)
    // Float literal: decidable -> skip
    assert(plannedFiles(path, Array(GreaterThan("f", 10.0f))) === 0)
    assert(plannedFiles(path, Array(LessThan("f", 2.0f))) === 1)
  }

  test("date windows skip with both java.sql.Date and LocalDate literals") {
    val path = tmp("bks-date")
    BucketedLake.write((1L to 30L).map(i =>
      (i, java.sql.Date.valueOf(f"2024-01-${1 + (i % 28).toInt}%02d")))
      .toDF("k", "d"), path, "k", 1)
    (31L to 60L).map(i =>
      (i, java.sql.Date.valueOf(f"2024-03-${1 + (i % 28).toInt}%02d")))
      .toDF("k", "d").writeTo(s"$cat.`$path`").append()
    val feb = java.sql.Date.valueOf("2024-02-15")
    assert(plannedFiles(path, Array(GreaterThan("d", feb))) === 1)
    assert(plannedFiles(path,
      Array(GreaterThan("d", java.time.LocalDate.parse("2024-02-15")))) === 1)
    assert(table(path).where(col("d") > lit(feb)).count() === 30L)
  }

  test("runtime (join-pushed) filters skip by stats too") {
    val path = tmp("bks-runtime")
    generations(path)
    val spec = BucketedLake.readSpec(spark, path).get
    val b = new GraftBucketScanBuilder(spark, path, spec)
    val scan = b.build().toBatch
      .asInstanceOf[GraftBucketScan]
    assert(scan.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition].files.length).sum === 12)
    scan.filter(Array[Filter](GreaterThan("v", 250L)))
    assert(scan.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition].files.length).sum === 4,
      "runtime filters must reach the data-skipping axis")
  }

  test("merge-written files carry stats; skipping survives a merge") {
    val path = tmp("bks-merge")
    generations(path)
    BucketedLake.merge(spark, path, Seq((5L, 5000L)).toDF("k", "v"),
      spark.emptyDataset[Long].toDF("k")): Unit
    val spec = BucketedLake.readSpec(spark, path).get
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.forall(_.stats.isDefined))
    // only files whose window reaches 5000 are read (the merged one)
    assert(plannedFiles(path, Array(GreaterThan("v", 4000L))) === 1)
    assert(table(path).where(col("v") > 4000L).count() === 1L)
    assert(FileStats.decode(
      m.filter(_.rel.contains("merge-")).head.stats.get, spec.schema)
      .apply("v").hi === Some(5000L))
  }
}
