package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucketed graft-lake tables + storage-partitioned joins: write/read
  * round trip, the ZERO-SHUFFLE co-located join plan contract, correct
  * fallback on mismatched bucket counts, and column pruning through the
  * V2 scan. */
class BucketedLakeSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bk"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString

  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")

  /** every shuffle under the (possibly adaptive) executed plan. */
  private def shuffles(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // finalize any adaptive plan
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan) // AQE stages are childless wrappers — descend
        case s: ShuffleExchangeLike => Seq(s)
        case _ => Nil
      }
      self ++ p.children.flatMap(walk) ++
        p.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("write/read round trip preserves rows, types, and key placement") {
    val path = tmp("bk-rt")
    val df = (1L to 1000L).map(i => (i, s"name-$i", i % 7)).toDF("id", "nm", "grp")
    BucketedLake.write(df, path, "id", 8)
    val back = table(path)
    assert(back.schema.fieldNames.toSeq === Seq("id", "nm", "grp"))
    assert(back.count() === 1000L)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    // physical placement: each bucket dir holds exactly the rows whose
    // pmod(xxhash64(id), 8) routes there (write/read identity)
    val expected = df
      .withColumn("b", BucketedLake.bucketExpr("id", 8)).groupBy("b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { b =>
      val files = BucketedLake.bucketFiles(spark, path, b)
      val n =
        if (files.isEmpty) 0L
        else spark.read.parquet(files.map(_._1).toSeq: _*).count()
      assert(n === expected.getOrElse(b, 0L), s"bucket $b row count")
    }
  }

  test("storage-partitioned join: same bucketing on both sides -> ZERO shuffles") {
    val left = tmp("bk-l"); val right = tmp("bk-r")
    val l = (1L to 500L).map(i => (i, i * 2)).toDF("k", "lv")
    val r = (250L to 750L).map(i => (i, s"r$i")).toDF("k", "rv")
    BucketedLake.write(l, left, "k", 8)
    BucketedLake.write(r, right, "k", 8)
    // join WITHOUT a global aggregate: the whole plan must be exchange-free
    val joined = table(left).hint("merge").join(table(right), Seq("k"))
    assert(shuffles(joined).isEmpty,
      s"expected a shuffle-free co-located join, got:\n" +
        joined.queryExecution.executedPlan)
    // buckets are key-sorted single files and the scans REPORT it, so the
    // SMJ runs without SortExecs either: scan -> join, nothing between
    val sorts = joined.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.isEmpty, s"expected a sort-free co-located join, got:\n" +
      joined.queryExecution.executedPlan)
    // and the co-located result is RIGHT (vs a plain shuffled recompute)
    val expect = l.join(r, Seq("k"))
      .select(sum(col("lv")).as("s"), count(lit(1)).as("n")).head()
    val got = table(left).hint("merge").join(table(right), Seq("k"))
      .select(sum(col("lv")).as("s"), count(lit(1)).as("n")).head()
    assert(got === expect)
  }

  test("divisible bucket counts coalesce (8 vs 4) — still shuffle-free and correct") {
    // floorMod(h, 8) = b implies floorMod(h, 4) = b mod 4, so with
    // compatible-transform SPJ on, Spark groups the 8 buckets pairwise via
    // the function's ReducibleFunction — exchange-free. The scan must then
    // WITHHOLD its ordering claim (a grouped task concatenates two sorted
    // buckets, which is not sorted): sorts reappear, results stay right.
    val left = tmp("bk-l2"); val right = tmp("bk-r2")
    val l = (1L to 200L).map(i => (i, i * 3)).toDF("k", "lv")
    val r = (1L to 200L).map(i => (i, s"x$i")).toDF("k", "rv")
    BucketedLake.write(l, left, "k", 8)
    BucketedLake.write(r, right, "k", 4)
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
    try {
      val joined = table(left).hint("merge").join(table(right), Seq("k"))
      assert(joined.count() === 200L)
      assert(shuffles(joined).isEmpty,
        "divisible bucket counts should coalesce without an exchange")
    } finally spark.conf.unset(
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled")
  }

  test("joining on a non-bucket column falls back to a shuffled join, still correct") {
    val left = tmp("bk-l3"); val right = tmp("bk-r3")
    val l = (1L to 200L).map(i => (i, i % 10)).toDF("k", "other")
    val r = (0L to 9L).map(i => (i, s"x$i")).toDF("other", "rv")
    BucketedLake.write(l, left, "k", 8)
    BucketedLake.write(r, right, "other", 8)
    // pin the SMJ path (a tiny side would broadcast, hiding the check)
    val thresh = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val aqeThresh =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // left is bucketed by k but joins on `other` — not co-partitioned
      val joined = table(left).hint("merge").join(table(right), Seq("other"))
      assert(shuffles(joined).nonEmpty, "non-key join must shuffle")
      assert(joined.count() === 200L)
    } finally {
      thresh.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      aqeThresh.fold(
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
  }

  test("group-by on the bucket key also rides the reported partitioning") {
    val path = tmp("bk-agg")
    BucketedLake.write((1L to 300L).map(i => (i % 50, i)).toDF("k", "v"),
      path, "k", 8)
    val agg = table(path).groupBy("k").agg(sum("v").as("s"))
    assert(shuffles(agg).isEmpty,
      s"bucketed group-by must not shuffle:\n${agg.queryExecution.executedPlan}")
    val expect = (1L to 300L).map(i => (i % 50, i)).groupBy(_._1)
      .map { case (k, vs) => (k, vs.map(_._2).sum) }.toSet
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expect)
  }

  test("column pruning reaches the V2 scan") {
    val path = tmp("bk-prune")
    BucketedLake.write(
      (1L to 10L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "nm", "x"),
      path, "id", 4)
    val df = table(path).select("nm")
    val scans = df.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.schema.fieldNames.sameElements(Array("nm"))),
      s"scan should read only 'nm':\n${df.queryExecution.executedPlan}")
    assert(df.collect().map(_.getString(0)).sorted.head === "n1")
  }

  test("V2 append: Spark plans the connector-required shuffle+sort; placement holds") {
    val path = tmp("bk-w")
    BucketedLake.write((1L to 100L).map(i => (i, i * 2)).toDF("k", "v"),
      path, "k", 8)
    // DSv2 append: RequiresDistributionAndOrdering makes Spark cluster by
    // bucket(8, k) and sort (bucket, k); the writer cuts files on bucket
    // transitions — no writer-side shuffle logic at all
    (101L to 200L).map(i => (i, i * 2)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    val back = table(path)
    assert(back.count() === 200L)
    assert(back.agg(sum(col("v"))).head().getLong(0) ===
      (1L to 200L).map(_ * 2).sum)
    // physical placement: every row of every bucket dir re-hashes to it
    (0 until 8).foreach { b =>
      val files = BucketedLake.bucketFiles(spark, path, b)
      if (files.nonEmpty) {
        val misrouted = spark.read.parquet(files.map(_._1).toSeq: _*)
          .where(BucketedLake.bucketExpr("k", 8) =!= b).count()
        assert(misrouted === 0L, s"bucket $b holds foreign keys")
      }
    }
    // appended buckets now hold 2 files: the ordering claim withdraws
    // itself but the co-located join stays exchange-free
    val other = tmp("bk-w2")
    BucketedLake.write((1L to 200L).map(i => (i, s"r$i")).toDF("k", "rv"),
      other, "k", 8)
    val joined = table(path).hint("merge").join(table(other), Seq("k"))
    assert(shuffles(joined).isEmpty, "append broke co-location")
    assert(joined.count() === 200L)
  }

  test("SQL INSERT INTO and INSERT OVERWRITE work against the catalog") {
    val path = tmp("bk-sql")
    BucketedLake.write((1L to 50L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 4)
    spark.sql(s"INSERT INTO $cat.`$path` SELECT id AS k, 'x' AS nm " +
      "FROM range(51, 61)")
    assert(table(path).count() === 60L)
    // static mode: INSERT OVERWRITE = truncate-and-write. The session is
    // shared across suites and another spec may leave dynamic mode set —
    // under which Spark plans OverwritePartitionsDynamic, a bucket-
    // granular replace this table deliberately does NOT support (it
    // would silently keep rows in untouched buckets).
    val mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try spark.sql(s"INSERT OVERWRITE $cat.`$path` SELECT id AS k, " +
      "'y' AS nm FROM range(0, 10)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
    val rows = table(path).collect()
    assert(rows.length === 10 && rows.forall(_.getString(1) == "y"))
    // a truncate-write restores single sorted files: sort-free SMJ again
    val other = tmp("bk-sql2")
    BucketedLake.write((0L until 10L).map(i => (i, i)).toDF("k", "v"),
      other, "k", 4)
    val joined = table(path).hint("merge").join(table(other), Seq("k"))
    assert(shuffles(joined).isEmpty)
    val sorts = joined.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.isEmpty, "overwrite lost the sorted single-file layout")
    assert(joined.count() === 10L)
  }

  test("compaction folds multi-file buckets to one sorted file; sort-free join returns") {
    val path = tmp("bk-compact"); val other = tmp("bk-compact2")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"), path, "k", 4)
    (101L to 200L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    assert((0 until 4).exists(
      BucketedLake.bucketFiles(spark, path, _).length > 1),
      "append should have produced a multi-file bucket")
    BucketedLake.compact(spark, path)
    // MVCC: the manifest view is one file per bucket immediately; the
    // superseded files stay on disk until vacuum reclaims them
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.groupBy(_.bucket).forall(_._2.length == 1),
      "compaction must publish one manifest file per bucket")
    assert(BucketedLake.vacuum(spark, path, minAgeMs = 0L).files > 0,
      "vacuum should reclaim the superseded files")
    assert((0 until 4).forall(
      BucketedLake.bucketFiles(spark, path, _).length <= 1),
      "vacuum must leave at most one physical file per bucket")
    assert(table(path).count() === 200L)
    assert(table(path).agg(sum(col("v"))).head().getLong(0) ===
      (1L to 200L).sum)
    // single sorted files again: the co-located SMJ drops its sorts
    BucketedLake.write((1L to 200L).map(i => (i, s"r$i")).toDF("k", "rv"),
      other, "k", 4)
    val joined = table(path).hint("merge").join(table(other), Seq("k"))
    assert(shuffles(joined).isEmpty)
    assert(joined.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, "compaction should restore the sort-free co-located join")
    assert(joined.count() === 200L)
  }

  test("a mis-shaped write is rejected before any byte") {
    val path = tmp("bk-badw")
    BucketedLake.write((1L to 5L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 4)
    val e = intercept[Exception] {
      (1L to 5L).map(i => (i, i)).toDF("k", "other")
        .writeTo(s"$cat.`$path`").append()
    }
    assert(e.getMessage.contains("schema") || e.getMessage.contains("column"))
  }

  test("COUNT(*) answers from the manifest: one metadata partition, no row decode") {
    val path = tmp("bk-count")
    BucketedLake.write((1L to 12345L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 8)
    val df = spark.sql(s"SELECT count(*) AS n FROM $cat.`$path`")
    assert(df.head().getLong(0) === 12345L)
    // the pushed scan is a single metadata partition, not 8 bucket reads
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.exists(_.toString.contains("COUNT(*) from manifest")),
      s"aggregate not pushed:\n${df.queryExecution.executedPlan}")
    // predicates block the pushdown (correctness first): the filtered
    // count must re-route through the row scan
    val filtered = spark.sql(
      s"SELECT count(*) FROM $cat.`$path` WHERE k <= 10")
    assert(filtered.head().getLong(0) === 10L)
  }

  test("the count path reads ONLY the manifest — zero per-file IO (doctored-manifest contract)") {
    val path = tmp("bk-count-manifest")
    BucketedLake.write((1L to 100L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 4)
    // doctor the manifest's row counts: the pushed COUNT(*) must return
    // the DOCTORED sum — proof it never opened a footer or listed a dir
    val entries = BucketedLake.readManifest(spark, path).get
    BucketedLake.writeManifest(spark, path,
      entries.map(e => e.copy(rows = e.rows + 1000)))
    val n = spark.sql(s"SELECT count(*) AS n FROM $cat.`$path`")
      .head().getLong(0)
    assert(n === 100L + entries.size * 1000L,
      "count(*) did not come from the manifest")
    // restore: the true manifest again drives the true count
    BucketedLake.writeManifest(spark, path, entries)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.`$path`")
      .head().getLong(0) === 100L)
  }

  test("manifest stays exact across write, V2 append, and compaction") {
    val path = tmp("bk-manifest")
    BucketedLake.write((1L to 500L).map(i => (i, i * 2)).toDF("k", "v"),
      path, "k", 8)
    // the legacy sweep is UNTRUSTED (no exactness flag), so normalize
    // the flag away: the drift invariant is about windows/counts
    def noFlag(e: BucketedLake.ManifestEntry) = e.copy(stats =
      e.stats.map(_.replace(",\"x\":true", "").replace("\"x\":true,", "")))
    def check(label: String): Unit = {
      val m = BucketedLake.readManifest(spark, path).get
        .sortBy(e => (e.bucket, e.rel)).map(noFlag)
      val swept = BucketedLake.footerSweep(spark, path)
        .sortBy(e => (e.bucket, e.rel))
      assert(m === swept, s"$label: manifest drifted from the files")
    }
    check("after write")
    (501L to 900L).map(i => (i, i * 2)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    check("after append")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.`$path`")
      .head().getLong(0) === 900L)
    BucketedLake.compact(spark, path)
    BucketedLake.vacuum(spark, path, minAgeMs = 0L): Unit // physical == manifest again
    check("after compaction + vacuum")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.`$path`")
      .head().getLong(0) === 900L)
  }

  test("MVCC: a reader pinned to the old manifest survives a concurrent compaction") {
    val path = tmp("bk-mvcc")
    BucketedLake.write((1L to 300L).map(i => (i, i * 3)).toDF("k", "v"),
      path, "k", 4)
    (301L to 600L).map(i => (i, i * 3)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    // plan a scan against the CURRENT (multi-file) manifest and pin its
    // RDD — the in-flight reader (a new query would re-resolve)
    val pinned = table(path).select(col("v")).queryExecution.toRdd
    assert(pinned.partitions.length === 4)
    BucketedLake.compact(spark, path) // publishes v+1, old files intact
    // the pinned reader still scans a CONSISTENT pre-compaction view
    val pinnedRows = pinned.map(_.getLong(0)).collect()
    assert(pinnedRows.length === 600)
    assert(pinnedRows.sum === (1L to 600L).map(_ * 3).sum)
    // fresh reads resolve the new manifest (one file per bucket)
    assert(table(path).count() === 600L)
    // the retention guard: nothing young enough is reclaimed
    assert(BucketedLake.vacuum(spark, path, minAgeMs = 3600000L).files === 0,
      "retention must protect just-superseded files")
    // the DEFAULT is retention too (7 days): a bare vacuum deletes nothing
    assert(BucketedLake.vacuum(spark, path).files === 0,
      "default vacuum must be retention-guarded")
    // vacuum ends the old version's readability — the MVCC GC contract
    assert(BucketedLake.vacuum(spark, path, minAgeMs = 0L).files > 0)
    assert(table(path).count() === 600L)
    assert(BucketedLake.readManifest(spark, path).get
      .groupBy(_.bucket).forall(_._2.length == 1))
  }

  test("legacy table (no manifest): scan and count fall back to sweeps, still correct") {
    val path = tmp("bk-legacy")
    BucketedLake.write((1L to 777L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 8)
    // simulate a pre-manifest table (pointer, versions, legacy file)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).filter(_.getName.startsWith("_bucket_manifest"))
      .foreach(p => fs.delete(p, false))
    assert(BucketedLake.readManifest(spark, path).isEmpty)
    assert(table(path).count() === 777L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.`$path`")
      .head().getLong(0) === 777L)
    // a V2 append onto the legacy table materializes the merged manifest
    (778L to 800L).map(i => (i, s"n$i")).toDF("k", "nm")
      .writeTo(s"$cat.`$path`").append()
    val m = BucketedLake.readManifest(spark, path)
    assert(m.isDefined && m.get.map(_.rows).sum === 800L)
  }

  test("bucket pruning: a point lookup reads 1 of n buckets") {
    val path = tmp("bk-point")
    BucketedLake.write((1L to 1000L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 8)
    val df = table(path).where(col("k") === 42L)
    // plan contract: one input partition, the pruning visible in explain
    assert(df.rdd.getNumPartitions === 1,
      s"point lookup must plan 1 bucket:\n${df.queryExecution.executedPlan}")
    assert(df.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("prunedTo=1/8")),
      s"pruning not reported:\n${df.queryExecution.executedPlan}")
    val rows = df.collect()
    assert(rows.length === 1 && rows.head.getString(1) === "n42")
    // IN-list prunes to the union of matching buckets
    val in = table(path).where(col("k").isin(1L, 2L, 3L))
    assert(in.rdd.getNumPartitions <= 3)
    assert(in.count() === 3L)
    // a null probe scans ZERO buckets (null keys are rejected at write)
    val nullSafe = table(path).where(col("k") <=> lit(null))
    assert(nullSafe.rdd.getNumPartitions === 0 ||
      nullSafe.queryExecution.executedPlan.collectLeaves()
        .exists(_.toString.contains("prunedTo=0/8")))
    assert(nullSafe.count() === 0L)
    // a non-key predicate must NOT prune (all buckets scanned)
    val nk = table(path).where(col("nm") === "n42")
    assert(nk.rdd.getNumPartitions === 8)
    assert(nk.count() === 1L)
    // a range predicate cannot prune either — correctness first
    assert(table(path).where(col("k") <= 10L).count() === 10L)
  }

  test("bucket pruning hashes exactly like the write path (string keys too)") {
    val path = tmp("bk-point-str")
    val df = (1L to 500L).map(i => (s"key-$i", i)).toDF("k", "v")
    BucketedLake.write(df, path, "k", 16)
    (1L to 500L by 97L).foreach { i =>
      val got = table(path).where(col("k") === s"key-$i")
      assert(got.rdd.getNumPartitions === 1, s"key-$i should prune to 1")
      val rows = got.collect()
      assert(rows.length === 1 && rows.head.getLong(1) === i, s"key-$i row")
    }
    // pruned scans still compose with residual predicates
    assert(table(path)
      .where(col("k") === "key-98" && col("v") > 1000L).count() === 0L)
  }

  test("runtime (DPP) filtering empties non-matching buckets, partition keys untouched") {
    val path = tmp("bk-dpp")
    BucketedLake.write((1L to 400L).map(i => (i, i * 2)).toDF("k", "v"),
      path, "k", 8)
    // unit contract: filter() EMPTIES pruned buckets' file lists but
    // keeps all 8 partitions (Spark forbids mutating the partition-key
    // set during runtime filtering when KeyGroupedPartitioning was
    // reported — and SPJ alignment depends on it)
    val spec0 = BucketedLake.readSpec(spark, path).get
    val scan = new GraftBucketScanBuilder(spark, path, spec0).build()
    val rf = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    assert(rf.filterAttributes().map(_.describe()).toSeq === Seq("k"))
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k",
        Array(42L, 43L).map(_.asInstanceOf[Any]))))
    val parts = scan.toBatch.planInputPartitions()
    assert(parts.length === 8, "partition keys must not mutate at runtime")
    val nonEmpty = parts.map(_.asInstanceOf[GraftBucketPartition])
      .count(_.files.nonEmpty)
    assert(nonEmpty >= 1 && nonEmpty <= 2,
      s"IN(42,43) should keep at most 2 of 8 buckets, kept $nonEmpty")
    // e2e: a selective broadcast dim injects a dynamic-pruning runtime
    // filter into the fact scan; the join result must stay exact
    val dimPath = tmp("bk-dpp-dim")
    (40L to 45L).map(i => (i, s"d$i")).toDF("dk", "dname")
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).where(col("dk") % 2 === 0)
    val joined = table(path).join(dim, col("k") === col("dk"))
    val rows = joined.collect()
    assert(rows.length === 3) // dk in {40, 42, 44}
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a runtime filter on the bucketed scan:\n$plan")
  }

  test("manifest statistics make a small bucketed dimension auto-broadcastable") {
    val dim = tmp("bk-stats-dim")
    BucketedLake.write((1L to 100L).map(i => (i, s"d$i")).toDF("k", "dname"),
      dim, "k", 4)
    // a V2 scan without statistics defaults to "unknown = huge" and
    // could never auto-broadcast; the manifest makes the size exact
    val fact = (1L to 50000L).map(i => (i % 100, i)).toDF("fk", "v")
    val joined = fact.join(table(dim), col("fk") === col("k"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small bucketed side should broadcast:\n$plan")
  }

  test("SQL: graft_bucketed('/path') serves the same V2 relation (count + pruning)") {
    val path = tmp("bk-tvf")
    BucketedLake.write((1L to 321L).map(i => (i, s"n$i")).toDF("k", "nm"),
      path, "k", 8)
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    val cnt = spark.sql(s"SELECT count(*) AS n FROM graft_bucketed('$path')")
    assert(cnt.head().getLong(0) === 321L)
    assert(cnt.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("COUNT(*) from manifest")),
      "TVF count must ride the manifest pushdown")
    val point = spark.sql(
      s"SELECT nm FROM graft_bucketed('$path') WHERE k = 42")
    assert(point.rdd.getNumPartitions === 1, "TVF point lookup must prune")
    assert(point.collect().map(_.getString(0)).toSeq === Seq("n42"))
  }

  test("property: prune-side hashing equals write-side routing for every key type") {
    import org.apache.spark.sql.types._
    val rng = new scala.util.Random(0xB0CCE7) // deterministic
    // pruning a bucket that holds a matching key would SILENTLY drop
    // rows — the identity must hold for every supported type, edge
    // values included
    def check[T](keyType: DataType, values: Seq[T], mkDf: Seq[T] => DataFrame,
                 lit: T => Any): Unit = {
      val df = mkDf(values)
      val buckets = 16
      val routed = df
        .withColumn("__b", BucketedLake.bucketExpr("k", buckets))
        .collect().map(r => r.get(0) -> r.getInt(1)).toMap
      values.foreach { v =>
        val set = BucketPruning.bucketSetOf(
          org.apache.spark.sql.sources.EqualTo("k", lit(v)),
          "k", keyType, buckets)
        assert(set.isDefined, s"$keyType value $v must be prunable")
        assert(set.get === Set(routed(v)),
          s"$keyType value $v: prune says ${set.get}, write routed to ${routed(v)}")
      }
    }
    val longs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L) ++
      Seq.fill(50)(rng.nextLong())
    check[Long](LongType, longs.distinct, _.toDF("k"), identity)
    val ints = Seq(0, -1, Int.MaxValue, Int.MinValue) ++
      Seq.fill(50)(rng.nextInt())
    check[Int](IntegerType, ints.distinct, _.toDF("k"),
      v => java.lang.Integer.valueOf(v))
    val strs = Seq("", "a", "key-42", "ünïcode-ключ-鍵", " spaces ",
      "\t\n") ++ Seq.fill(50)(rng.nextString(rng.nextInt(20)))
    check[String](StringType, strs.distinct, _.toDF("k"), identity)
    val doubles = Seq(0.0, -0.0, 1.5, -1.5, Double.MaxValue,
      Double.MinPositiveValue) ++ Seq.fill(50)(rng.nextDouble())
    check[Double](DoubleType, doubles.distinct, _.toDF("k"), identity)
    check[Boolean](BooleanType, Seq(true, false), _.toDF("k"),
      v => java.lang.Boolean.valueOf(v))
    val dates = Seq.fill(30)(java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(rng.nextInt(40000).toLong - 10000)))
    check[java.sql.Date](DateType, dates.distinct, _.toDF("k"), identity)
    // an unsupported literal type must yield None (no pruning), never a
    // wrong bucket
    assert(BucketPruning.bucketSetOf(
      org.apache.spark.sql.sources.EqualTo("k",
        new java.math.BigDecimal("1.5")),
      "k", LongType, 16).isEmpty)
  }

  test("scans serve COLUMNAR batches: ColumnarToRow inside codegen, results exact") {
    val path = tmp("bk-columnar")
    val df0 = (1L to 5000L).map(i => (i, s"n$i", i * 1.5)).toDF("k", "nm", "x")
    BucketedLake.write(df0, path, "k", 8)
    val agg = table(path).groupBy().agg(sum(col("x")).as("s"),
      count(lit(1)).as("n"))
    val row = agg.collect().head // finalize THIS plan (head() runs its own)
    assert(row.getLong(1) === 5000L && row.getDouble(0) === df0.agg(
      sum(col("x"))).head().getDouble(0))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"bucketed scan should be columnar:\n$plan")
  }

  test("null bucket keys are rejected by the V1 write path too") {
    val path = tmp("bk-nullkey")
    val df = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "v")
    val e = intercept[Exception] { BucketedLake.write(df, path, "k", 4) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("null")),
      s"expected a null-key rejection, got: $e")
  }

  test("empty buckets are materialized so both sides' partition values align") {
    val path = tmp("bk-empty")
    // one distinct key -> exactly one non-empty bucket out of 16
    BucketedLake.write(Seq((42L, "only")).toDF("k", "v"), path, "k", 16)
    val back = table(path)
    assert(back.rdd.getNumPartitions === 16)
    assert(back.count() === 1L)
  }

  test("racing committers: exactly one wins, the loser fails LOUDLY") {
    val path = tmp("bk-race")
    BucketedLake.write((1L to 50L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    val entries = BucketedLake.readManifest(spark, path).get
    // writer B resolved the same current version as writer A and staged
    // its manifest file first — writer A's commit must now CONFLICT, not
    // silently orphan B's files (the Hudi/Delta/Iceberg semantics)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = BucketedLake.currentVersion(spark, path).get + 1L
    val racer = new org.apache.hadoop.fs.Path(path,
      f"_bucket_manifest.v$next%06d.txt")
    val out = fs.create(racer, false)
    try out.write("0\t1\t1\tdata/__bucket=0/ghost.parquet\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    intercept[BucketedLake.ConcurrentCommitException] {
      BucketedLake.writeManifest(spark, path, entries)
    }
    // the pointer never flipped: readers still resolve writer-0's commit
    assert(BucketedLake.currentVersion(spark, path).get === next - 1L)
    assert(table(path).count() === 50L)
    fs.delete(racer, false)
    // with the race gone, the same commit succeeds
    BucketedLake.writeManifest(spark, path, entries)
    assert(BucketedLake.currentVersion(spark, path).get === next)
  }

  test("a truncated/garbled commit pointer fails loudly, never a stale fallback") {
    val path = tmp("bk-badptr")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    val ptr = new org.apache.hadoop.fs.Path(path, "_bucket_manifest.current")
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(ptr, true)
    try out.write("not-a-version".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val e = intercept[IllegalStateException] {
      BucketedLake.currentVersion(spark, path)
    }
    assert(e.getMessage.contains("pointer"))
    // restore
    val out2 = fs.create(ptr, true)
    try out2.write("1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out2.close()
    assert(table(path).count() === 10L)
  }

  test("MVCC: a pinned reader survives a concurrent create-or-replace write()") {
    val path = tmp("bk-replace")
    BucketedLake.write((1L to 100L).map(i => (i, i * 2)).toDF("k", "v"),
      path, "k", 4)
    val pinned = table(path).select(col("v")).queryExecution.toRdd
    // full REPLACE with different rows — the old files must stay put
    // until vacuum's retention lapses, so the pinned scan is unharmed
    BucketedLake.write((1L to 10L).map(i => (i, i * 1000)).toDF("k", "v"),
      path, "k", 4)
    val old = pinned.map(_.getLong(0)).collect()
    assert(old.length === 100 && old.sum === (1L to 100L).map(_ * 2).sum,
      "pinned reader lost its snapshot under a replace")
    // fresh reads resolve the replacement
    assert(table(path).count() === 10L)
    assert(table(path).agg(sum(col("v"))).head().getLong(0) ===
      (1L to 10L).map(_ * 1000).sum)
    // the superseded files are exactly what vacuum(force) reclaims
    assert(BucketedLake.vacuum(spark, path, minAgeMs = 0L).files > 0)
    assert(table(path).count() === 10L)
  }

  test("vacuum dryRun reports exactly what a real pass deletes — and deletes nothing") {
    val path = tmp("bk-dryrun")
    BucketedLake.write((1L to 200L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    (201L to 400L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    BucketedLake.compact(spark, path) // superseded files now exist
    val dry = BucketedLake.vacuum(spark, path, minAgeMs = 0L, dryRun = true)
    assert(dry.files > 0 && dry.bytes > 0L && dry.manifests > 0)
    // dry run deleted NOTHING: counts reproduce exactly on the real pass
    val real = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
    assert(real === dry, s"dry-run $dry drifted from the real pass $real")
    assert(table(path).count() === 400L)
    // idempotent: a second pass finds nothing
    val again = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
    assert(again.files === 0 && again.manifests === 0)
  }

  test("vacuum reclaims crashed-write staging directories") {
    val path = tmp("bk-stage")
    BucketedLake.write((1L to 20L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a writer crashed after staging: its dir lingers under the root
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/.write-crashed"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/.compact-crashed"))
    // retention protects an IN-FLIGHT write's staging
    assert(BucketedLake.vacuum(spark, path).stagingDirs === 0)
    val r = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
    assert(r.stagingDirs === 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/.write-crashed")))
    assert(table(path).count() === 20L)
  }

  test("OCC read gate: a commit based on a stale snapshot is rejected before writing") {
    val path = tmp("bk-occ")
    BucketedLake.write((1L to 50L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    val staleBase = BucketedLake.currentVersion(spark, path).get
    val entries = BucketedLake.readManifest(spark, path).get
    // someone else commits (replace semantics, no base)
    BucketedLake.writeManifest(spark, path, entries)
    // the stale snapshot must now be refused LOUDLY — merging it would
    // silently drop the interleaved commit's files
    val e = intercept[BucketedLake.ConcurrentCommitException] {
      BucketedLake.writeManifest(spark, path, entries, Some(staleBase))
    }
    assert(e.getMessage.contains("advanced"))
    // a fresh read commits fine
    BucketedLake.writeManifest(spark, path, entries,
      Some(BucketedLake.currentVersion(spark, path).get))
  }

  test("concurrent V2 appends: optimistic retry lands BOTH commits, no rows lost") {
    val path = tmp("bk-cc-append")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (0 until 2).map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val lo = t * 1000 + 1; val hi = t * 1000 + 100
            (lo.toLong to hi.toLong).map(i => (i, i)).toDF("k", "v")
              .writeTo(s"$cat.`$path`").append()
          }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(table(path).count() === 210L,
      "a racing append's files were dropped from the manifest")
    // the manifest agrees with the physical files exactly
    val m = BucketedLake.readManifest(spark, path).get
      .sortBy(e => (e.bucket, e.rel)).map(e => e.copy(stats =
        e.stats.map(_.replace(",\"x\":true", "")
          .replace("\"x\":true,", ""))))
    val swept = BucketedLake.footerSweep(spark, path)
      .sortBy(e => (e.bucket, e.rel))
    assert(m === swept, "manifest drifted from files under concurrency")
    assert(table(path).agg(sum(col("v"))).head().getLong(0) ===
      (1L to 10L).sum + (1L to 100L).sum + (1001L to 1100L).sum)
  }

  test("compaction racing an append fails loudly instead of dropping the append") {
    val path = tmp("bk-occ-compact")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    (101L to 200L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    // simulate the race: capture compaction's base, let an append land,
    // then try to publish a manifest gated on the stale base
    val staleBase = BucketedLake.currentVersion(spark, path).get
    val staleEntries = BucketedLake.readManifest(spark, path).get
    (201L to 300L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    intercept[BucketedLake.ConcurrentCommitException] {
      BucketedLake.writeManifest(spark, path, staleEntries, Some(staleBase))
    }
    // the append survived; a re-run compaction then folds everything
    assert(table(path).count() === 300L)
    BucketedLake.compact(spark, path)
    assert(table(path).count() === 300L)
    val m = BucketedLake.readManifest(spark, path).get
    assert(m.groupBy(_.bucket).forall(_._2.length == 1))
  }

  test("time travel: every retained manifest version is a consistent pinned snapshot") {
    val path = tmp("bk-tt")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // v1
    (101L to 200L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    BucketedLake.compact(spark, path) // v3
    assert(BucketedLake.versions(spark, path) === Seq(1L, 2L, 3L))
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    def countAt(v: Long): Long =
      spark.sql(s"SELECT count(*) FROM graft_bucketed('$path', $v)")
        .head().getLong(0)
    assert(countAt(1L) === 100L) // pre-append snapshot
    assert(countAt(2L) === 200L)
    assert(countAt(3L) === 200L) // compaction preserves rows
    // full scans at a version, with pruning intact
    val v1 = spark.sql(
      s"SELECT sum(v) AS s FROM graft_bucketed('$path', 1) WHERE k <= 50")
    assert(v1.head().getLong(0) === (1L to 50L).sum)
    // a time-travel snapshot refuses writes (the guard fires before the
    // write info is ever touched)
    val e = intercept[IllegalArgumentException] {
      new GraftBucketedTable(spark, path,
        BucketedLake.readSpec(spark, path).get, Some(1L))
        .newWriteBuilder(null)
    }
    assert(e.getMessage.contains("time-travel"))
    // the SQL history surface: one row per retained version, exact rows
    // and op tags (the change feed's dispatch key)
    val hist = spark.sql(
      s"SELECT version, operation, rows FROM graft_bucketed_history('$path')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(hist === Seq((1L, "replace", 100L), (2L, "append", 200L),
      (3L, "compact", 200L)))
    // vacuum trims history: superseded versions stop resolving LOUDLY
    BucketedLake.vacuum(spark, path, minAgeMs = 0L): Unit
    assert(BucketedLake.versions(spark, path) === Seq(3L))
    val gone = intercept[IllegalArgumentException] { countAt(1L) }
    assert(gone.getMessage.contains("vacuum") ||
      gone.getMessage.contains("no manifest version"))
    assert(countAt(3L) === 200L)
  }

  test("exactly-once streaming ingest: a re-delivered micro-batch never double-appends") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp("bk-stream")
    BucketedLake.createEmpty(spark, path, "k", 4,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val ckpt = Files.createTempDirectory("bk-stream-ckpt").toString
    val in = MemoryStream[(Long, Long)]
    // the previous run's checkpoint lease releases asynchronously after
    // stop(); retry the transient "concurrently using" window
    def run(attempt: Int = 0): Unit = {
      val q = BucketedLake.streamInto(in.toDF().toDF("k", "v"), path,
        "ingest-a", ckpt)
      try { q.processAllAvailable(); q.stop(); q.awaitTermination() }
      catch {
        case e: Exception if attempt < 10 && Option(e.getMessage)
            .exists(_.contains("concurrently using")) =>
          q.stop(); Thread.sleep(300); run(attempt + 1)
      }
    }
    in.addData((1L, 10L), (2L, 20L))
    run()
    assert(table(path).count() === 2L)
    // crash window: the state committed but Spark's checkpoint commit was
    // lost — restart re-delivers the SAME batch under the SAME epoch, and
    // the manifest watermark makes it a no-op
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val last = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filterNot(_.endsWith(".tmp")).sorted.last
    java.nio.file.Files.delete(java.nio.file.Paths.get(last))
    run()
    assert(table(path).count() === 2L,
      "re-delivered micro-batch double-appended")
    // the manifest agrees with the physical live files (replayed staged
    // files are unreferenced at worst, never counted)
    assert(table(path).agg(sum(col("v"))).head().getLong(0) === 30L)
    // new data keeps flowing
    in.addData((3L, 30L))
    run()
    assert(table(path).count() === 3L)
    assert(table(path).agg(sum(col("v"))).head().getLong(0) === 60L)
    // the watermark rides the manifest: visible to readTxns
    assert(BucketedLake.readTxns(spark, path).contains("ingest-a"))
    // compaction carries watermarks forward
    BucketedLake.compact(spark, path)
    assert(BucketedLake.readTxns(spark, path).contains("ingest-a"))
  }
}
