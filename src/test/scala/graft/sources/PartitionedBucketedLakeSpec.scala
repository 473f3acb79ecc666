package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan}

import graft.SparkSuite

/** Two-axis bucketed lake — `data/__part=<v>/__bucket=<b>/`: the shape
  * every real 100 TB ingest lake uses. Partition predicates prune whole
  * partition directories, key predicates still prune to 1-of-n buckets,
  * the two compose (1 dir × 1 bucket for a point-in-time lookup), SPJ
  * stays exchange-free, manifest statistics stay exact per partition,
  * and appends/compaction respect the (partition, bucket) fold unit. */
class PartitionedBucketedLakeSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bk2"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")

  private def shuffles(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case s: ShuffleExchangeLike => Seq(s)
        case _ => Nil
      }
      self ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** 1000 rows over ten dates 2024-01-01..10 (k % 10 picks the day). */
  private def fixture(path: String, buckets: Int = 8): Unit =
    BucketedLake.write(
      (1L to 1000L).map(i =>
        (i, Date.valueOf(f"2024-01-${1 + (i % 10)}%02d"), s"n$i"))
        .toDF("k", "dt", "nm"),
      path, "k", buckets, partitionCol = Some("dt"))

  private def planParts(path: String,
                        filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[GraftBucketPartition] = {
    val spec = BucketedLake.readSpec(spark, path).get
    val b = new GraftBucketScanBuilder(spark, path, spec)
    b.pushFilters(filters)
    b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition])
  }

  test("round trip: partition dirs + buckets on disk, full schema back") {
    val path = tmp("bk2-rt")
    fixture(path)
    assert(BucketedLake.readSpec(spark, path).get.partCols === Seq("dt"))
    val back = table(path)
    assert(back.schema.fieldNames.toSeq === Seq("k", "dt", "nm"))
    assert(back.count() === 1000L)
    assert(back.agg(sum("k")).head().getLong(0) === (1L to 1000L).sum)
    // the layout is two-level: every manifest rel carries both segments
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.nonEmpty)
    assert(m.forall(e => e.rel.contains("__part=2024-01-") &&
      e.rel.contains("__bucket=")), s"bad rels: ${m.take(3).map(_.rel)}")
    assert(m.map(e => BucketedLake.partValueRaw(e.rel).get.get)
      .distinct.size === 10, "ten distinct partition dirs expected")
    // partition value is ALSO a data column: no dir re-injection needed
    assert(back.where(col("dt") === Date.valueOf("2024-01-03")).count() ===
      100L)
  }

  test("two-axis pruning: partition + key predicate reads 1 dir x 1 bucket") {
    val path = tmp("bk2-point")
    fixture(path)
    // k = 42 lives on 2024-01-03 (42 % 10 = 2 -> day 3)
    val parts = planParts(path, Array(
      EqualTo("dt", Date.valueOf("2024-01-03")), EqualTo("k", 42L)))
    assert(parts.length === 1, "key equality must prune to ONE bucket")
    val files = parts.head.files
    assert(files.nonEmpty &&
      files.forall(_._1.contains("__part=2024-01-03/")),
      s"partition pruning must keep only the matching dir: " +
        s"${files.map(_._1).toSeq}")
    // e2e through SQL: one input partition, exact row
    val df = table(path).where(col("dt") === Date.valueOf("2024-01-03") &&
      col("k") === 42L)
    assert(df.rdd.getNumPartitions === 1)
    val rows = df.collect()
    assert(rows.length === 1 && rows.head.getString(2) === "n42")
    // the wrong date on the right key: pruned to an empty file set
    assert(table(path).where(col("dt") === Date.valueOf("2024-01-04") &&
      col("k") === 42L).count() === 0L)
  }

  test("date-range predicates prune partition dirs (the 100 TB ingest-lake filter)") {
    val path = tmp("bk2-range")
    fixture(path)
    val parts = planParts(path, Array(
      GreaterThanOrEqual("dt", Date.valueOf("2024-01-08"))))
    assert(parts.length === 8, "no key predicate: all buckets stay")
    val dirs = parts.flatMap(_.files.map(_._1))
      .flatMap(p => "__part=([0-9-]+)".r.findFirstMatchIn(p).map(_.group(1)))
      .distinct.sorted
    assert(dirs.toSeq === Seq("2024-01-08", "2024-01-09", "2024-01-10"),
      s"range pruning kept $dirs")
    // e2e counts stay exact (filters remain residual above the scan)
    assert(table(path)
      .where(col("dt") >= Date.valueOf("2024-01-08")).count() === 300L)
    assert(table(path).where(col("dt") >= Date.valueOf("2024-01-08") &&
      col("dt") < Date.valueOf("2024-01-10")).count() === 200L)
    // IN-list prunes too
    val inParts = planParts(path, Array(In("dt",
      Array(Date.valueOf("2024-01-01"), Date.valueOf("2024-01-05")))))
    val inDirs = inParts.flatMap(_.files.map(_._1))
      .flatMap(p => "__part=([0-9-]+)".r.findFirstMatchIn(p).map(_.group(1)))
      .distinct.sorted
    assert(inDirs.toSeq === Seq("2024-01-01", "2024-01-05"))
  }

  test("SPJ: a partitioned fact joins a bucket-only dim with ZERO exchanges") {
    val fact = tmp("bk2-spj-f"); val dim = tmp("bk2-spj-d")
    fixture(fact)
    BucketedLake.write((1L to 1000L).map(i => (i, s"d$i")).toDF("k", "dv"),
      dim, "k", 8)
    val joined = table(fact).join(table(dim), Seq("k"))
    assert(shuffles(joined).isEmpty,
      s"SPJ must survive the partition axis:\n" +
        s"${joined.queryExecution.executedPlan}")
    assert(joined.count() === 1000L)
    // partition-pruned SPJ still joins exchange-free (both sides report
    // all 8 bucket partition values; pruning only trimmed file lists)
    val prunedJoin = table(fact)
      .where(col("dt") === Date.valueOf("2024-01-03"))
      .join(table(dim), Seq("k"))
    assert(shuffles(prunedJoin).isEmpty,
      s"partition pruning must not break SPJ:\n" +
        s"${prunedJoin.queryExecution.executedPlan}")
    assert(prunedJoin.count() === 100L)
  }

  test("V2 append routes to (partition, bucket); manifest stays exact; compaction folds per group") {
    val path = tmp("bk2-append")
    fixture(path, buckets = 4)
    (1001L to 1200L).map(i =>
      (i, Date.valueOf(f"2024-01-${1 + (i % 10)}%02d"), s"n$i"))
      .toDF("k", "dt", "nm")
      .writeTo(s"$cat.`$path`").append()
    assert(table(path).count() === 1200L)
    // the manifest never drifts from the physical files (the legacy
    // sweep is UNTRUSTED — normalize the exactness flag away)
    val m = BucketedLake.readManifest(spark, path).get
      .sortBy(e => (e.bucket, e.rel)).map(e => e.copy(stats =
        e.stats.map(_.replace(",\"x\":true", "")
          .replace("\"x\":true,", ""))))
    val swept = BucketedLake.footerSweep(spark, path)
      .sortBy(e => (e.bucket, e.rel))
    assert(m === swept, "manifest drifted from files after append")
    // appends land inside partition dirs, never a bare __bucket dir
    assert(m.forall(_.rel.startsWith("data/__part=")))
    // two-axis pruning still exact over mixed write+append files
    assert(table(path).where(col("dt") === Date.valueOf("2024-01-03") &&
      col("k") === 1042L).count() === 1L)
    // compaction folds each multi-file (partition, bucket) group to ONE
    BucketedLake.compact(spark, path)
    val m2 = BucketedLake.readManifest(spark, path).get
    def seg(rel: String) = rel.split("/").find(_.startsWith("__part=")).get
    assert(m2.groupBy(e => (seg(e.rel), e.bucket))
      .forall(_._2.length == 1),
      "compaction must leave one file per (partition, bucket)")
    assert(table(path).count() === 1200L)
    assert(BucketedLake.vacuum(spark, path, minAgeMs = 0L).files > 0)
    assert(table(path).count() === 1200L)
    assert(table(path).agg(sum("k")).head().getLong(0) === (1L to 1200L).sum)
  }

  test("null partition values land in the default dir; IS NULL prunes to it") {
    val path = tmp("bk2-null")
    val rows = Seq[(java.lang.Long, Date, String)](
      (1L, Date.valueOf("2024-01-01"), "a"),
      (2L, null, "b"), (3L, null, "c"))
    BucketedLake.write(rows.toDF("k", "dt", "nm"), path, "k", 4,
      partitionCol = Some("dt"))
    assert(table(path).count() === 3L)
    assert(table(path).where(col("dt").isNull).count() === 2L)
    assert(table(path).where(col("dt").isNotNull).count() === 1L)
    val nullParts = planParts(path, Array(IsNull("dt")))
    val nullFiles = nullParts.flatMap(_.files.map(_._1))
    assert(nullFiles.nonEmpty &&
      nullFiles.forall(_.contains("__part=__HIVE_DEFAULT_PARTITION__")),
      s"IS NULL must keep only the default partition: ${nullFiles.toSeq}")
    val notNull = planParts(path, Array(IsNotNull("dt")))
    assert(notNull.flatMap(_.files.map(_._1))
      .forall(!_.contains("__HIVE_DEFAULT_PARTITION__")))
    // comparisons exclude the null partition (SQL three-valued logic)
    val lt = planParts(path, Array(LessThan("dt", Date.valueOf("2024-02-01"))))
    assert(lt.flatMap(_.files.map(_._1))
      .forall(!_.contains("__HIVE_DEFAULT_PARTITION__")))
  }

  test("manifest statistics are exact per pruned partition") {
    val path = tmp("bk2-stats")
    fixture(path)
    val spec = BucketedLake.readSpec(spark, path).get
    def statsFor(filters: Array[org.apache.spark.sql.sources.Filter]) = {
      val b = new GraftBucketScanBuilder(spark, path, spec)
      b.pushFilters(filters)
      b.build().asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
    }
    val full = statsFor(Array.empty)
    assert(full.numRows().getAsLong === 1000L)
    val oneDay = statsFor(Array(EqualTo("dt", Date.valueOf("2024-01-03"))))
    assert(oneDay.numRows().getAsLong === 100L,
      "per-partition row stats must be exact")
    assert(oneDay.sizeInBytes().getAsLong < full.sizeInBytes().getAsLong)
    val pointStats = statsFor(Array(
      EqualTo("dt", Date.valueOf("2024-01-03")), EqualTo("k", 42L)))
    assert(pointStats.sizeInBytes().getAsLong <
      oneDay.sizeInBytes().getAsLong, "both axes must compound in stats")
  }

  test("additive schema evolution: old files null-fill, appends carry the new column, pruning unaffected") {
    val path = tmp("bk2-evolve")
    BucketedLake.write((1L to 100L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 4)
    // SQL ALTER TABLE ADD COLUMN drives evolveSchema through the catalog
    spark.sql(s"ALTER TABLE $cat.`$path` ADD COLUMN score BIGINT")
    assert(BucketedLake.readSpec(spark, path).get.schema.fieldNames.toSeq ===
      Seq("k", "nm", "score"))
    // old files scan consistently: the new column null-fills
    val back = table(path)
    assert(back.schema.fieldNames.toSeq === Seq("k", "nm", "score"))
    assert(back.where(col("score").isNull).count() === 100L)
    // appends carry the full evolved schema
    (101L to 150L).map(i => (i, s"n$i", i * 10)).toDF("k", "nm", "score")
      .writeTo(s"$cat.`$path`").append()
    assert(table(path).count() === 150L)
    assert(table(path).where(col("score").isNotNull).count() === 50L)
    assert(table(path).agg(sum("score")).head().getLong(0) ===
      (101L to 150L).map(_ * 10).sum)
    // bucket pruning is untouched by evolution — old AND new rows
    val point = table(path).where(col("k") === 42L)
    assert(point.rdd.getNumPartitions === 1)
    assert(point.head().isNullAt(2))
    assert(table(path).where(col("k") === 142L).head().getLong(2) === 1420L)
    // the manifest stayed exact across the evolved append
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.map(_.rows).sum === 150L)
    // compaction reads mixed-schema files and folds them
    BucketedLake.compact(spark, path)
    assert(table(path).count() === 150L)
    assert(table(path).where(col("score").isNull).count() === 100L)
    // incompatible changes fail loudly
    val e1 = intercept[IllegalArgumentException] {
      BucketedLake.evolveSchema(spark, path, org.apache.spark.sql.types
        .StructType(BucketedLake.readSpec(spark, path).get.schema.fields
          .take(2))) // drop
    }
    assert(e1.getMessage.contains("drop"))
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.`$path` DROP COLUMN score")
    }
    assert(e2.getMessage.contains("additive") ||
      e2.getMessage.toLowerCase.contains("unsupported"))
  }

  test("evolution composes with the two-axis layout: SPJ and partition pruning survive") {
    val fact = tmp("bk2-evolve-spj"); val dim = tmp("bk2-evolve-dim")
    fixture(fact)
    BucketedLake.evolveSchema(spark, fact, org.apache.spark.sql.types
      .StructType(BucketedLake.readSpec(spark, fact).get.schema.fields :+
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.LongType, nullable = true)))
    BucketedLake.write((1L to 1000L).map(i => (i, s"d$i")).toDF("k", "dv"),
      dim, "k", 8)
    val joined = table(fact).join(table(dim), Seq("k"))
    assert(shuffles(joined).isEmpty, "evolution must not break SPJ")
    assert(joined.count() === 1000L)
    // partition pruning still drives the file lists
    val parts = planParts(fact, Array(
      EqualTo("dt", Date.valueOf("2024-01-03"))))
    assert(parts.flatMap(_.files.map(_._1))
      .forall(_.contains("__part=2024-01-03/")))
    assert(table(fact).where(col("dt") === Date.valueOf("2024-01-03"))
      .where(col("extra").isNull).count() === 100L)
  }

  test("SQL DDL end-to-end: CREATE TABLE ... PARTITIONED BY (dt, bucket(8, k)) -> INSERT INTO -> pruned SELECT") {
    val path = tmp("bk2-ddl"); val dim = tmp("bk2-ddl-dim")
    spark.sql(s"""CREATE TABLE $cat.`$path` (k BIGINT, dt DATE, nm STRING)
      PARTITIONED BY (dt, bucket(8, k))""")
    val spec = BucketedLake.readSpec(spark, path).get
    assert(spec.keyCol === "k" && spec.buckets === 8 &&
      spec.partCols === Seq("dt"))
    // MVCC from birth: the empty table already answers through a manifest
    assert(spark.sql(s"SELECT count(*) FROM $cat.`$path`").head().getLong(0)
      === 0L)
    (1L to 1000L).map(i =>
      (i, Date.valueOf(f"2024-01-${1 + (i % 10)}%02d"), s"n$i"))
      .toDF("k", "dt", "nm").createOrReplaceTempView("ddl_src")
    spark.sql(s"INSERT INTO $cat.`$path` SELECT * FROM ddl_src")
    assert(spark.sql(s"SELECT count(*) FROM $cat.`$path`").head().getLong(0)
      === 1000L)
    // two-axis pruning holds for the DDL-created table
    val df = table(path).where(col("dt") === Date.valueOf("2024-01-03") &&
      col("k") === 42L)
    assert(df.rdd.getNumPartitions === 1)
    assert(df.head().getString(2) === "n42")
    // SPJ against a second DDL-created table, same bucket count
    spark.sql(s"CREATE TABLE $cat.`$dim` (k BIGINT, dv STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    (1L to 1000L).map(i => (i, s"d$i")).toDF("k", "dv")
      .createOrReplaceTempView("ddl_dim_src")
    spark.sql(s"INSERT INTO $cat.`$dim` SELECT * FROM ddl_dim_src")
    val joined = table(path).join(table(dim), Seq("k"))
    assert(shuffles(joined).isEmpty, "DDL-created tables must SPJ")
    assert(joined.count() === 1000L)
    // a second CREATE at the same path fails loudly
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`$path` (x BIGINT) " +
        "PARTITIONED BY (bucket(2, x))")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("runtime (DPP) filters on the partition column empty non-matching dirs") {
    val path = tmp("bk2-dpp")
    fixture(path)
    val spec = BucketedLake.readSpec(spark, path).get
    val scan = new GraftBucketScanBuilder(spark, path, spec).build()
    val rf = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    assert(rf.filterAttributes().map(_.describe()).toSeq === Seq("k", "dt"))
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      In("dt", Array(Date.valueOf("2024-01-03")))))
    val parts = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBucketPartition])
    assert(parts.length === 8, "partition keys must not mutate at runtime")
    val files = parts.flatMap(_.files.map(_._1))
    assert(files.nonEmpty && files.forall(_.contains("__part=2024-01-03/")),
      s"runtime partition filter must empty other dirs: ${files.take(3).toSeq}")
  }

  test("float partition dirs parse in the literal's canonical space (no false pruning)") {
    // "0.1" as a dir string must canonicalize exactly like the 0.1f
    // literal — parsing it as Double would prune files that hold matches
    import org.apache.spark.sql.types.FloatType
    val dir = PartPruning.parseDirValue("0.1", FloatType)
    val lit = PartPruning.canonical(0.1f, FloatType)
    assert(dir === lit, s"dir=$dir literal=$lit")
    // end-to-end: a float-partitioned table answers = probes exactly
    val path = tmp("bk2-float")
    BucketedLake.write(
      Seq((1L, 0.1f, "a"), (2L, 0.2f, "b"), (3L, 0.1f, "c"))
        .toDF("k", "fp", "nm"),
      path, "k", 2, partitionCol = Some("fp"))
    assert(table(path).where(col("fp") === 0.1f).count() === 2L)
    assert(table(path).where(col("fp") === 0.2f).count() === 1L)
  }

  test("a layout-changing replace is detected LOUDLY by stale readers and time travel") {
    val path = tmp("bk2-relayout")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 8)
    // full replace with a DIFFERENT bucket count (a legal re-bucketing)
    BucketedLake.write((1L to 50L).map(i => (i, i * 2)).toDF("k", "v"),
      path, "k", 16)
    assert(table(path).count() === 50L) // fresh readers resolve fine
    // time travel to the pre-replace version pairs the OLD manifest with
    // the NEW spec — pruning under the wrong layout would silently drop
    // rows, so the scan must refuse
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bucketed('$path', 1) WHERE k = 7")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("layout changed")),
      s"expected the layout guard, got: $e")
  }

  test("INSERT OVERWRITE is snapshot-atomic: a pinned reader survives it") {
    val path = tmp("bk2-trunc")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    val pinned = table(path).select(col("v")).queryExecution.toRdd
    (201L to 220L).map(i => (i, i)).toDF("k", "v")
      .createOrReplaceTempView("trunc_src")
    spark.sql(s"INSERT OVERWRITE $cat.`$path` SELECT * FROM trunc_src")
    // the pinned pre-overwrite scan still reads its full snapshot
    val old = pinned.map(_.getLong(0)).collect()
    assert(old.length === 100 && old.sum === (1L to 100L).sum,
      "pinned reader lost its snapshot under INSERT OVERWRITE")
    assert(table(path).count() === 20L)
    // the superseded files are vacuumable, not deleted in place
    assert(BucketedLake.vacuum(spark, path, minAgeMs = 0L).files > 0)
    assert(table(path).count() === 20L)
  }

  test("vacuum retention keys on SUPERSESSION time, not file age") {
    val path = tmp("bk2-vacage")
    BucketedLake.write((1L to 40L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // age the DATA files AND the v1 manifest far past the retention
    // window (a table written a month ago), then supersede them NOW
    // with a replace — retention must key on the SUCCESSOR's commit
    // time, not on how old the superseded artifacts themselves are
    val old = System.currentTimeMillis() - 30L * 24 * 3600 * 1000
    BucketedLake.readManifest(spark, path).get.foreach(e =>
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$path/${e.rel}"), old, old))
    fs.setTimes(new org.apache.hadoop.fs.Path(path,
      "_bucket_manifest.v000001.txt"), old, old)
    val pinned = table(path).select(col("v")).queryExecution.toRdd
    BucketedLake.write((1L to 5L).map(i => (i, i * 10)).toDF("k", "v"),
      path, "k", 2)
    // default-retention vacuum must NOT reclaim the just-superseded
    // files: the manifest that references them is seconds old, even
    // though the files' own mtime is 30 days — a reader pinned a minute
    // ago is scanning exactly those files
    val r = BucketedLake.vacuum(spark, path)
    assert(r.files === 0,
      s"retention keyed on file age reclaimed just-superseded files: $r")
    val rows = pinned.map(_.getLong(0)).collect()
    assert(rows.length === 40 && rows.sum === (1L to 40L).sum)
    // force still works
    assert(BucketedLake.vacuum(spark, path, minAgeMs = 0L).files > 0)
  }
}
