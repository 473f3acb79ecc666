package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Key-NDV sketches in the manifest ([[NdvSketch]]) → `distinctCount`
  * column statistics → CBO join planning: a wide-but-low-cardinality
  * dimension whose BYTES say sort-merge broadcasts once its GROUP BY
  * output is estimated by CARDINALITY. Folds: appends/merges union,
  * compaction carries exactly, full replace starts fresh. */
class NdvStatsSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_ndv"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")
  private def ndvOf(path: String): Option[Long] = {
    val m = BucketedLake.readManifestFull(spark, path).get
    m.ndv.values.headOption.flatMap(NdvSketch.estimate)
  }

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joins(df: DataFrame): Seq[String] = {
    df.collect()
    def walk(p: SparkPlan): Seq[String] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case j if j.nodeName.contains("Join") => Seq(j.nodeName)
        case _ => Nil
      }
      self ++ p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("NDV flips a byte-driven sort-merge to a cardinality-driven broadcast") {
    val dim = tmp("ndv-dim")
    val fact = tmp("ndv-fact")
    // WIDE dimension, only 40 distinct keys: bytes say "big", NDV says
    // "tiny after GROUP BY". The payload is INCOMPRESSIBLE (md5 chain)
    // so the manifest's byte statistics are honestly large.
    val wide = concat_ws("",
      (0 until 60).map(j => md5(concat($"seq", lit(j)))): _*)
    BucketedLake.write(
      (1L to 4000L).map(i => (i % 40L, i)).toDF("k", "seq")
        .withColumn("payload", wide),
      dim, "k", 4)
    BucketedLake.write(
      (1L to 200000L).map(i => (i % 40L, i * 3)).toDF("k", "v")
        .withColumn("pad", md5($"v".cast("string"))),
      fact, "k", 4)
    assert(BucketedLake.readManifestFull(spark, dim).get.ndv.contains("k"),
      "write() must land the #ndv header")
    val est = ndvOf(dim).get
    assert(est === 40L, s"HLL is exact at this cardinality, got $est")
    def q(): DataFrame =
      table(fact).join(
        table(dim).groupBy("k")
          .agg(max("seq").as("mx"), max("payload").as("pay")), Seq("k"))
        .agg(sum($"v" + $"mx" + length($"pay")), max($"pad"))
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "1048576") {
      // the dim SCAN is ~8 MB of payload — bytes alone refuse broadcast;
      // NDV=40 collapses the aggregate's estimate and flips the join
      val withNdv = joins(q())
      assert(withNdv.exists(_.contains("BroadcastHashJoin")),
        s"NDV stats must broadcast the aggregated dim, got $withNdv")
      // strip the header (commit the same entries with no ndv): the
      // same query degrades to sort-merge — proving the flip came from
      // the NDV statistic, not from bytes
      val m = BucketedLake.readManifestFull(spark, dim).get
      BucketedLake.writeManifest(spark, dim, m.entries,
        base = BucketedLake.currentVersion(spark, dim),
        txns = m.txns, layout = m.layout, op = "compact",
        bloom = m.bloom): Unit
      val withoutNdv = joins(q())
      assert(withoutNdv.exists(_.contains("SortMergeJoin")),
        s"without NDV the byte estimate must sort-merge, got $withoutNdv")
    }
  }

  test("analyze with a column list: a NON-KEY join attribute flips to broadcast") {
    val dim = tmp("ndv-nonkey-dim")
    val fact = tmp("ndv-nonkey-fact")
    // the join attribute is `cat` (40 distinct values), NOT the bucket
    // key — only an analyzed non-key sketch can price this join
    val wide = concat_ws("",
      (0 until 60).map(j => md5(concat($"k", lit(j)))): _*)
    BucketedLake.write(
      (1L to 4000L).map(i => (i, s"c${i % 40}")).toDF("k", "cat")
        .withColumn("payload", wide),
      dim, "k", 4)
    BucketedLake.write(
      (1L to 200000L).map(i => (i, s"c${i % 40}", i * 3))
        .toDF("k", "cat", "v").withColumn("pad", md5($"v".cast("string"))),
      fact, "k", 4)
    def q(): DataFrame =
      table(fact).join(
        table(dim).groupBy("cat")
          .agg(max("k").as("mx"), max("payload").as("pay")), Seq("cat"))
        .agg(sum($"v" + $"mx" + length($"pay")), max($"pad"))
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      // 16 KiB: the decision hinges on the aggregate's ROW estimate —
      // without a `cat` sketch it falls back to the child's 4000 rows
      // (~190 KiB at default widths) → sort-merge; the analyzed NDV=40
      // collapses it to ~2 KiB → broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "16384") {
      // before analyze: only the KEY sketch exists; grouping on `cat`
      // has no cardinality, so the estimate stays row-bound and big
      val before = joins(q())
      assert(before.exists(_.contains("SortMergeJoin")),
        s"without a non-key sketch the byte estimate must sort-merge, " +
          s"got $before")
      val ests = spark.sql(
        s"CALL $cat.system.analyze('$dim', 'cat')").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ests("cat") === 40L, s"exact at this cardinality: $ests")
      assert(ests.contains("k"), "the key is always re-sketched")
      val after = joins(q())
      assert(after.exists(_.contains("BroadcastHashJoin")),
        s"the analyzed non-key NDV must broadcast the aggregated dim, " +
          s"got $after")
    }
    // guards: unknown + untrackable columns are loud
    intercept[IllegalArgumentException](
      BucketedLake.analyzeNdv(spark, dim, Seq("nope")))
  }

  test("folds: append unions, compaction carries exactly, replace resets") {
    val path = tmp("ndv-fold")
    BucketedLake.write((1L to 300L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    assert(ndvOf(path).get === 300L)
    // append overlapping + new keys: union, not double count
    (200L to 500L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    assert(ndvOf(path).get === 500L, "union of overlapping key ranges")
    // compaction rewrites files but not rows: the sketch carries EXACT
    val before = BucketedLake.readManifestFull(spark, path).get.ndv
    BucketedLake.compact(spark, path): Unit
    assert(BucketedLake.readManifestFull(spark, path).get.ndv === before)
    // merge with INSERTED keys unions them in
    BucketedLake.merge(spark, path,
      Seq((9001L, 1L), (9002L, 2L)).toDF("k", "v"),
      Seq.empty[Long].toDF("k")): Unit
    assert(ndvOf(path).get === 502L)
    // full replace starts fresh
    BucketedLake.write((1L to 7L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    assert(ndvOf(path).get === 7L)
    // INSERT OVERWRITE (truncate) starts fresh from the new tasks too
    (1L to 12L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").overwrite(lit(true))
    assert(ndvOf(path).get === 12L)
  }

  test("CALL analyze bootstraps pre-header tables and tightens after deletes") {
    val path = tmp("ndv-analyze")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    BucketedLake.write((1L to 400L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    // simulate unsketched history: strip the header, then append — the
    // coverage guard keeps the commit silent (publishing tasks-only
    // would under-estimate)
    val m = BucketedLake.readManifestFull(spark, path).get
    BucketedLake.writeManifest(spark, path, m.entries,
      base = BucketedLake.currentVersion(spark, path), txns = m.txns,
      layout = m.layout, op = "compact", bloom = m.bloom): Unit
    (401L to 450L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    assert(BucketedLake.readManifestFull(spark, path).get.ndv.isEmpty,
      "append atop unsketched history must stay silent")
    // analyze bootstraps from the live snapshot
    val est = spark.sql(s"CALL $cat.system.analyze('$path')")
      .head().getLong(1)
    // ~1.6% HLL error at this cardinality (449-451 observed)
    assert(math.abs(est - 450L) <= 9L, s"est=$est")
    assert(math.abs(ndvOf(path).get - 450L) <= 9L)
    // after a delete, the running header over-estimates; analyze
    // tightens back to exact-live
    BucketedLake.deleteWhere(spark, path, col("k") <= 300L): Unit
    assert(math.abs(ndvOf(path).get - 450L) <= 9L,
      "carried header over-estimates")
    val tightened = BucketedLake.analyzeNdv(spark, path)("k")
    assert(math.abs(tightened - 150L) <= 3L, s"tightened=$tightened")
    assert(math.abs(ndvOf(path).get - 150L) <= 3L)
  }

  test("graft_bucketed_stats TVF: one metadata row with layout, totals, NDV, bloom") {
    val path = tmp("ndv-stats")
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    BucketedLake.write(
      (1L to 250L).map(i => (i, java.sql.Date.valueOf("2024-01-01"), i))
        .toDF("k", "dt", "v"),
      path, "k", 4, partitionCol = Some("dt"))
    BucketedLake.buildBloomIndex(spark, path, Seq("v")): Unit
    val r = spark.sql(s"SELECT * FROM graft_bucketed_stats('$path')").head()
    assert(r.getAs[String]("key") === "k")
    assert(r.getAs[Int]("buckets") === 4)
    assert(r.getAs[String]("partition_cols") === "dt")
    assert(r.getAs[Long]("rows") === 250L)
    assert(r.getAs[Long]("files") > 0L)
    assert(math.abs(r.getAs[Long]("key_ndv") - 250L) <= 5L)
    assert(r.getAs[String]("bloom_index").startsWith("_index/bloom/"))
    // a pre-NDV snapshot reports null, not a guess
    val m = BucketedLake.readManifestFull(spark, path).get
    BucketedLake.writeManifest(spark, path, m.entries,
      base = BucketedLake.currentVersion(spark, path), txns = m.txns,
      layout = m.layout, op = "compact", bloom = m.bloom): Unit
    val r2 = spark.sql(s"SELECT * FROM graft_bucketed_stats('$path')").head()
    assert(r2.isNullAt(r2.fieldIndex("key_ndv")))
  }

  test("partition-axis distinctCount is exact from the manifest; scan reports columnStats") {
    val path = tmp("ndv-part")
    val d = java.sql.Date.valueOf("2024-01-01")
    BucketedLake.write(
      (1L to 90L).map(i =>
        (i, new java.sql.Date(d.getTime + (i % 3) * 86400000L), i))
        .toDF("k", "dt", "v"),
      path, "k", 4, partitionCol = Some("dt"))
    val spec = BucketedLake.readSpec(spark, path).get
    val b = new GraftBucketScanBuilder(spark, path, spec)
    b.pushFilters(Array.empty)
    val stats = b.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val cs = stats.columnStats()
    import scala.jdk.CollectionConverters._
    val byName = cs.asScala.map { case (ref, st) =>
      ref.fieldNames().mkString(".") -> st }
    assert(byName("dt").distinctCount().getAsLong === 3L,
      "partition distinct count is exact from the dirs")
    assert(byName("k").distinctCount().getAsLong === 90L)
    assert(byName("k").nullCount().getAsLong === 0L)
  }
}
