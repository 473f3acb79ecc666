package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scoped overwrites + metadata deletes on the bucketed lake:
  * `INSERT OVERWRITE ... PARTITION (p=v)` / `replaceWhere` supersede
  * exactly the matching partition's files (file-level decisions via
  * the partition-dir value — exact, loud when not), dynamic partition
  * overwrite replaces the partitions the new data touches, and
  * `DELETE FROM ... WHERE <partition pred>` is a pure manifest edit.
  * All are MVCC commits: pinned readers keep the pre-overwrite
  * snapshot and the change feed renders each as a scoped diff. */
class BucketedOverwriteSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bko"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-01-02")
  private val d3 = Date.valueOf("2024-01-03")

  private def mkPartitioned(): String = {
    val path = tmp("bko")
    BucketedLake.write(
      ((1L to 30L).map(i => (i, d1, i)) ++ (31L to 60L).map(i => (i, d2, i))
        ++ (61L to 90L).map(i => (i, d3, i))).toDF("k", "dt", "v"),
      path, "k", 4, partitionCol = Some("dt"))
    path
  }

  test("programmatic replaceWhere supersedes exactly the matching partition") {
    val path = mkPartitioned()
    val before = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    (101L to 105L).map(i => (i, d2, -i)).toDF("k", "dt", "v")
      .writeTo(s"$cat.`$path`").overwrite(col("dt") === lit(d2))
    val after = BucketedLake.readManifest(spark, path).get
    // d1/d3 files byte-identical; d2's files replaced
    val kept = after.map(_.rel).toSet intersect before
    assert(kept === before.filterNot(_.contains("__part=2024-01-02")))
    val rows = table(path).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.keySet === ((1L to 30L) ++ (61L to 90L) ++ (101L to 105L)).toSet)
    assert(rows(101L) === -101L)
    // the change feed renders it as that partition's delete+insert only
    val feed = BucketedLake.changes(spark, path, 1L, 2L)
    assert(feed.where(col("_change_type") === "delete").count() === 30L)
    assert(feed.where(col("_change_type") === "insert").count() === 5L)
    assert(feed.where(col("_change_type") === "delete")
      .select(min(col("k")), max(col("k"))).head().toSeq === Seq(31L, 60L))
  }

  test("SQL INSERT OVERWRITE ... PARTITION (static) replaces one partition") {
    val path = mkPartitioned()
    spark.sql(
      s"""INSERT OVERWRITE $cat.`$path` PARTITION (dt = DATE'2024-01-01')
         SELECT k, v FROM VALUES (201L, 0L), (202L, 0L) AS t(k, v)""")
    val rows = table(path).collect()
      .map(r => (r.getLong(0), r.getDate(1))).toSeq
    assert(rows.count(_._2 == d1) === 2)
    assert(rows.filter(_._2 == d1).map(_._1).sorted === Seq(201L, 202L))
    assert(rows.count(_._2 == d2) === 30)
    assert(rows.count(_._2 == d3) === 30)
  }

  test("rows outside the replaced region fail loudly; undecidable filters fail loudly") {
    val path = mkPartitioned()
    val outside = intercept[Exception] {
      (1L to 3L).map(i => (i, d3, i)).toDF("k", "dt", "v")
        .writeTo(s"$cat.`$path`").overwrite(col("dt") === lit(d2))
    }
    assert(outside.getMessage.contains("OUTSIDE the replaced region"))
    val rowLevel = intercept[Exception] {
      (1L to 3L).map(i => (i, d2, i)).toDF("k", "dt", "v")
        .writeTo(s"$cat.`$path`").overwrite(col("v") > 10L)
    }
    assert(rowLevel.getMessage.contains("partition-column predicates") ||
      rowLevel.getMessage.contains("cannot be decided"))
    // nothing committed by either failure
    assert(table(path).count() === 90L)
    assert(BucketedLake.versions(spark, path) === Seq(1L))
  }

  test("dynamic partition overwrite replaces exactly the touched partitions") {
    val path = mkPartitioned()
    ((301L to 303L).map(i => (i, d1, -i)) ++ Seq((304L, d3, -304L)))
      .toDF("k", "dt", "v")
      .writeTo(s"$cat.`$path`").overwritePartitions()
    val rows = table(path).collect()
      .map(r => (r.getLong(0), r.getDate(1))).toSeq
    assert(rows.count(_._2 == d1) === 3) // replaced
    assert(rows.count(_._2 == d2) === 30) // untouched
    assert(rows.count(_._2 == d3) === 1) // replaced
    // bucket-only tables refuse (no partition axis to overwrite)
    val bo = tmp("bko-flat")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      bo, "k", 2)
    val e = intercept[Exception] {
      Seq((1L, 1L)).toDF("k", "v")
        .writeTo(s"$cat.`$bo`").overwritePartitions()
    }
    assert(e.getMessage.contains("no partition axis"))
  }

  test("metadata DELETE FROM drops whole partitions with zero data IO; row-level rewrites") {
    val path = mkPartitioned()
    val before = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    spark.sql(s"DELETE FROM $cat.`$path` WHERE dt = DATE'2024-01-02'")
    val after = BucketedLake.readManifest(spark, path).get
    // pure manifest edit: every surviving entry is an ORIGINAL file
    assert(after.map(_.rel).toSet.subsetOf(before))
    assert(after.size === before.size - before.count(_.contains("2024-01-02")))
    assert(table(path).count() === 60L)
    assert(table(path).where(col("dt") === lit(d2)).count() === 0L)
    // range predicates on the partition axis are metadata deletes too
    spark.sql(s"DELETE FROM $cat.`$path` WHERE dt > DATE'2024-01-02'")
    assert(table(path).count() === 30L)
    // a row-level predicate no longer refuses: it takes the
    // copy-on-write rewrite path (SupportsRowLevelOperations — see
    // BucketedRowLevelSpec); the partition deletes above stayed pure
    // manifest edits because OptimizeMetadataOnlyDeleteFromTable
    // prefers SupportsDelete when canDeleteWhere accepts
    spark.sql(s"DELETE FROM $cat.`$path` WHERE v = 5")
    assert(table(path).where(col("v") === 5).count() === 0L)
    assert(table(path).count() === 29L)
    // history shows the delete commits; CDF renders them as deletes
    val feed = BucketedLake.changes(spark, path, 1L, 3L)
    assert(feed.where(col("_change_type") === "insert").isEmpty)
    assert(feed.where(col("_change_type") === "delete").count() === 60L)
  }

  test("a pinned reader survives a scoped overwrite (MVCC)") {
    val path = mkPartitioned()
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    (401L to 402L).map(i => (i, d2, -i)).toDF("k", "dt", "v")
      .writeTo(s"$cat.`$path`").overwrite(col("dt") === lit(d2))
    val v1 = spark.sql(
      s"SELECT count(*) AS n, sum(v) AS s FROM graft_bucketed('$path', 1)")
      .head()
    assert(v1.getLong(0) === 90L && v1.getLong(1) === (1L to 90L).sum)
    assert(table(path).count() === 62L)
  }
}
