package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter}

import graft.SparkSuite

/** COMPOSITE partitioning — `data/__part=<dt>/__part2=<region>/
  * __bucket=<b>/`: the (date, region)-shaped layout real ingest lakes
  * use. Conjuncts on any subset of the axes prune directories
  * independently ([[PartPruning.matchesAll]]), metadata deletes and
  * dynamic overwrites decide per file across ALL axes at once, merge
  * rewrites at (dt, region, bucket) group granularity, and the SQL DDL
  * accepts multiple identity transforms. */
class CompositePartitionedLakeSpec extends SparkSuite {

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

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-01-02")
  private val d3 = Date.valueOf("2024-01-03")
  private val regions = Seq("EU", "US", "AP")

  /** 900 rows over 3 dates x 3 regions (k decides both), 4 buckets. */
  private def fixture(path: String): Unit =
    BucketedLake.write(
      (1L to 900L).map(i => (i,
        Seq(d1, d2, d3)((i % 3L).toInt), regions((i % 9L / 3L).toInt),
        i * 2))
        .toDF("k", "dt", "region", "v"),
      path, "k", 4, partitionCols = Seq("dt", "region"))

  private def planParts(path: String, filters: Array[Filter])
      : Array[GraftBucketPartition] = {
    val spec = BucketedLake.readSpec(spark, path).get
    val b = new GraftBucketScanBuilder(spark, path, spec)
    b.pushFilters(filters)
    b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition])
  }

  test("round trip: nested __part/__part2 dirs, spec + manifest carry both axes") {
    val path = tmp("bkc-rt")
    fixture(path)
    assert(BucketedLake.readSpec(spark, path).get.partCols ===
      Seq("dt", "region"))
    val back = table(path)
    assert(back.count() === 900L)
    assert(back.agg(sum("v")).head().getLong(0) === (1L to 900L).map(_ * 2).sum)
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.forall(e => e.rel.contains("__part=2024-01-") &&
      e.rel.contains("__part2=") && e.rel.contains("__bucket=")),
      s"bad rels: ${m.take(3).map(_.rel)}")
    // 9 composite partitions on disk
    assert(m.map(e => (BucketedLake.partValueRawAt(e.rel, 0),
      BucketedLake.partValueRawAt(e.rel, 1))).distinct.size === 9)
    // the layout header round-trips both axes
    assert(BucketedLake.readManifestFull(spark, path).get.layout.get._3 ===
      Seq("dt", "region"))
  }

  test("pruning composes across axes: dt alone, region alone, both + key") {
    val path = tmp("bkc-prune")
    fixture(path)
    val all = planParts(path, Array.empty).flatMap(_.files).length
    assert(all > 9, s"expected many files, got $all")
    // axis 0 only: a third of the dirs survive
    val p0 = planParts(path, Array(EqualTo("dt", d2)))
    assert(p0.flatMap(_.files).nonEmpty &&
      p0.flatMap(_.files).forall(_._1.contains("__part=2024-01-02/")))
    // axis 1 only: the second-level dirs prune INDEPENDENTLY
    val p1 = planParts(path, Array(EqualTo("region", "EU")))
    assert(p1.flatMap(_.files).nonEmpty &&
      p1.flatMap(_.files).forall(_._1.contains("__part2=EU/")))
    // both + key: exactly one dir x one bucket
    val k = 5L // k=5: 5%3=2 -> d3; 5%9/3=1 -> US
    val pb = planParts(path, Array(EqualTo("dt", d3),
      EqualTo("region", "US"), EqualTo("k", k)))
    assert(pb.count(_.files.nonEmpty) === 1)
    assert(pb.flatMap(_.files).forall(f =>
      f._1.contains("__part=2024-01-03/") && f._1.contains("__part2=US/")))
    // e2e values
    assert(table(path).where(col("dt") === d3 && col("region") === "US" &&
      col("k") === k).select("v").head().getLong(0) === 10L)
    assert(table(path).where(col("region") === "EU").count() === 300L)
  }

  test("metadata DELETE decides across both axes; dynamic overwrite replaces composite groups") {
    val path = tmp("bkc-del")
    fixture(path)
    val before = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    // second-axis predicate alone is a pure manifest edit
    spark.sql(s"DELETE FROM $cat.`$path` WHERE region = 'AP'")
    val afterAp = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    assert(afterAp.subsetOf(before), "metadata delete must not write files")
    assert(table(path).count() === 600L)
    // cross-axis conjunction is still per-file decidable -> metadata
    spark.sql(
      s"DELETE FROM $cat.`$path` WHERE dt = DATE'2024-01-02' AND region = 'US'")
    val afterBoth = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    assert(afterBoth.subsetOf(afterAp))
    assert(table(path).where(col("dt") === d2 && col("region") === "US")
      .count() === 0L)
    assert(table(path).count() === 500L)
    // dynamic partition overwrite touches ONLY the written combos
    val keepEu = table(path).where(col("region") === "EU").count()
    (10001L to 10050L).map(i => (i, d1, "US", -1L))
      .toDF("k", "dt", "region", "v")
      .writeTo(s"$cat.`$path`").overwritePartitions()
    assert(table(path).where(col("dt") === d1 && col("region") === "US")
      .count() === 50L)
    assert(table(path).where(col("region") === "EU").count() === keepEu,
      "untouched composite groups must survive a dynamic overwrite")
  }

  test("merge rewrites at (dt, region, bucket) group granularity") {
    val path = tmp("bkc-merge")
    fixture(path)
    val before = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    // one upserted key -> exactly its (dt, region, bucket) group rewrites
    val up = Seq((5L, d3, "US", 999L)).toDF("k", "dt", "region", "v")
    val stats = BucketedLake.merge(spark, path, up,
      spark.emptyDataFrame.withColumn("k", lit(null).cast("long"))
        .select("k"))
    val after = BucketedLake.readManifest(spark, path).get.map(_.rel).toSet
    val removed = before.diff(after)
    assert(removed.size === 1, s"one group out, got $removed")
    assert(removed.forall(r => r.contains("__part=2024-01-03/") &&
      r.contains("__part2=US/")))
    assert(stats.updated === 1L)
    assert(table(path).where(col("k") === 5L).select("v").head()
      .getLong(0) === 999L)
    assert(table(path).count() === 900L)
  }

  test("SQL DDL: PARTITIONED BY (dt, region, bucket(n, k)) + INSERT + metadata aggregates") {
    val path = tmp("bkc-ddl")
    spark.sql(s"""
      CREATE TABLE $cat.`$path` (k BIGINT, dt DATE, region STRING, v BIGINT)
      PARTITIONED BY (dt, region, bucket(4, k))""")
    assert(BucketedLake.readSpec(spark, path).get.partCols ===
      Seq("dt", "region"))
    (1L to 300L).map(i => (i, Seq(d1, d2, d3)((i % 3L).toInt),
      regions((i % 9L / 3L).toInt), i))
      .toDF("k", "dt", "region", "v")
      .writeTo(s"$cat.`$path`").append()
    assert(table(path).count() === 300L)
    // GROUP BY on the SECOND axis answers from the manifest alone
    val q = table(path).groupBy("region").agg(count(lit(1)).as("n"))
    val rows = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // residues of i % 9 over 1..300: EU (0,1,2) = 33+34+34, US (3,4,5)
    // = 34+33+33, AP (6,7,8) = 33+33+33
    assert(rows === Map("EU" -> 101L, "US" -> 100L, "AP" -> 99L))
    assert(q.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("from manifest")),
      "GROUP BY region must price from the manifest")
    // COUNT(DISTINCT region) is metadata-only too
    val qd = table(path).agg(countDistinct(col("region")).as("nr"))
    assert(qd.head().getLong(0) === 3L)
    assert(qd.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("from manifest")))
  }
}
