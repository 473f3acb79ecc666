package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Metadata-only aggregate pushdown on the bucketed lake: MIN / MAX /
  * COUNT(col) / COUNT(*) — optionally GROUP BY the partition column —
  * answer from the manifest's per-file statistics in one metadata
  * read. Contracts: pushed plans carry the `PushedAggregates ... from
  * manifest` leaf, answers equal a row-scan recompute across all three
  * stats producers (footer sweep, inline tracker, compaction merge),
  * and every exactness doubt (filters, strings, NaN, distinct,
  * non-partition grouping) declines to the normal scan instead of
  * guessing. */
class BucketedAggPushdownSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_aggpd"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString

  private def pushed(df: DataFrame): Boolean = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("from manifest"))
  }

  test("string MIN/MAX pushes only on writer-EXACT windows; inexact declines to the row scan") {
    val path = tmp("aggpd-str")
    val df = (1L to 4000L).map(i => (i, f"name$i%05d")).toDF("k", "nm")
    BucketedLake.write(df, path, "k", 4)
    def q() = spark.sql(
      s"SELECT min(nm) AS lo, max(nm) AS hi FROM $cat.`$path`")
    // write()'s own-file footer sweep is trusted: the windows are
    // attained values, so string MIN/MAX answers from the manifest
    val r1 = q()
    assert(pushed(r1), s"exact string windows must push:\n" +
      s"${r1.queryExecution.executedPlan}")
    assert(r1.head().toSeq === Seq("name00001", "name04000"))
    // V2 appends (Tracker stats) stay exact
    Seq((9000L, "zzz-appended")).toDF("k", "nm")
      .writeTo(s"$cat.`$path`").append()
    val r2 = q()
    assert(pushed(r2))
    assert(r2.head().toSeq === Seq("name00001", "zzz-appended"))
    // strip the exactness flags (a foreign/legacy manifest's windows
    // are BOUNDS, not values): the pushdown must DECLINE, and the row
    // scan still answers correctly
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = BucketedLake.currentVersion(spark, path).get
    val m = BucketedLake.readManifestFull(spark, path, Some(v)).get
    val doctored = m.entries.map(e => e.copy(stats =
      e.stats.map(_.replace(",\"x\":true", "").replace("\"x\":true,", ""))))
    BucketedLake.writeManifest(spark, path, doctored, base = Some(v),
      txns = m.txns, layout = m.layout, op = "compact",
      bloom = m.bloom, ndv = m.ndv): Unit
    val r3 = q()
    assert(!pushed(r3),
      "inexact string windows must NOT answer MIN/MAX")
    assert(r3.head().toSeq === Seq("name00001", "zzz-appended"))
    // numeric aggregates still push off the same doctored manifest
    val r4 = spark.sql(s"SELECT min(k) AS lo, count(*) AS n FROM $cat.`$path`")
    assert(pushed(r4))
    assert(r4.head().toSeq === Seq(1L, 4001L))
  }

  test("MIN/MAX/COUNT push to the manifest and match a row-scan recompute") {
    val path = tmp("aggpd-base")
    val df = (1L to 5000L)
      .map(i => (i, (i * 37 % 1000).toInt, s"n$i")).toDF("k", "v", "nm")
    BucketedLake.write(df, path, "k", 8)
    val q = spark.sql(
      s"SELECT min(v) AS lo, max(v) AS hi, count(*) AS n, count(v) AS nv " +
        s"FROM $cat.`$path`")
    assert(pushed(q), s"not pushed:\n${q.queryExecution.executedPlan}")
    val r = q.head()
    assert(r.getInt(0) === 0 && r.getInt(1) === 999)
    assert(r.getLong(2) === 5000L && r.getLong(3) === 5000L)
  }

  test("the pushed answer comes from the manifest alone (doctored-stats contract)") {
    val path = tmp("aggpd-doctor")
    BucketedLake.write((1L to 100L).map(i => (i, i * 2)).toDF("k", "v"),
      path, "k", 4)
    // doctor every entry's stats window for v: hi -> 9999
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = BucketedLake.currentVersion(spark, path).get
    val mp = new org.apache.hadoop.fs.Path(path,
      BucketedLake.versionedManifest(v))
    val text = {
      val in = fs.open(mp)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
    val doctored = text.replaceAll(""""hi":\d+""", "\"hi\":9999")
    val out = fs.create(mp, true)
    try out.write(doctored.getBytes(
      java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    val r = spark.sql(s"SELECT max(v), max(k) FROM $cat.`$path`").head()
    assert(r.getLong(0) === 9999L && r.getLong(1) === 9999L,
      "pushed MAX must be priced off the manifest, not the data files")
  }

  test("GROUP BY the partition column: per-group rows incl. the null partition") {
    val path = tmp("aggpd-group")
    val df = Seq(
      (1L, Option("2026-01-01"), 10), (2L, Option("2026-01-01"), 20),
      (3L, Option("2026-01-02"), 5), (4L, None, 42), (5L, None, 1))
      .toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 4, partitionCol = Some("dt"))
    val q = spark.sql(
      s"SELECT dt, count(*) AS n, min(v) AS lo, max(v) AS hi " +
        s"FROM $cat.`$path` GROUP BY dt")
    assert(pushed(q), s"not pushed:\n${q.queryExecution.executedPlan}")
    val got = q.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(got === Set(
      (Some("2026-01-01"), 2L, 10, 20),
      (Some("2026-01-02"), 1L, 5, 5),
      (None, 2L, 1, 42)))
  }

  test("all three stats producers price identically (write, append, compact)") {
    val path = tmp("aggpd-producers")
    BucketedLake.write((1L to 100L).map(i => (i, i * 3)).toDF("k", "v"),
      path, "k", 4) // footer-sweep stats
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    (101L to 200L).map(i => (i, i * 3)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // inline tracker stats
    def check(): Unit = {
      val q = spark.sql(
        s"SELECT min(v) AS lo, max(v) AS hi, count(v) AS n FROM $cat.`$path`")
      assert(pushed(q))
      val r = q.head()
      assert(r.getLong(0) === 3L && r.getLong(1) === 600L &&
        r.getLong(2) === 200L)
    }
    check()
    BucketedLake.compact(spark, path) // merged stats
    check()
  }

  test("nulls: COUNT(col) subtracts them; an all-null column prices MIN/MAX as null") {
    val path = tmp("aggpd-nulls")
    val df = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) Some(i.toInt) else None,
        Option.empty[Int])).toDF("k", "v", "dead")
    BucketedLake.write(df, path, "k", 4)
    val q = spark.sql(
      s"SELECT count(v) AS nv, min(v) AS lo, count(dead) AS nd, " +
        s"min(dead) AS dlo, max(dead) AS dhi FROM $cat.`$path`")
    assert(pushed(q))
    val r = q.head()
    assert(r.getLong(0) === 20L && r.getInt(1) === 3)
    assert(r.getLong(2) === 0L && r.isNullAt(3) && r.isNullAt(4))
  }

  test("empty table: one zero/null row ungrouped, zero rows grouped") {
    val path = tmp("aggpd-empty")
    BucketedLake.createEmpty(spark, path, "k", 4,
      new org.apache.spark.sql.types.StructType()
        .add("k", "long", nullable = false).add("dt", "string")
        .add("v", "int"),
      partitionCol = Some("dt"))
    val q = spark.sql(
      s"SELECT count(*) AS n, min(v) AS lo FROM $cat.`$path`")
    assert(pushed(q))
    val r = q.head()
    assert(r.getLong(0) === 0L && r.isNullAt(1))
    val g = spark.sql(
      s"SELECT dt, count(*) FROM $cat.`$path` GROUP BY dt")
    assert(g.collect().isEmpty)
  }

  test("COUNT(DISTINCT partition col) prices from the dir values alone") {
    val path = tmp("aggpd-distinctpart")
    val df = Seq(
      (1L, Option("a"), 1), (2L, Option("a"), 2), (3L, Option("b"), 3),
      (4L, Option("c"), 4), (5L, None, 5)).toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 4, partitionCol = Some("dt"))
    val q = spark.sql(
      s"SELECT count(DISTINCT dt) AS d, count(*) AS n FROM $cat.`$path`")
    assert(pushed(q), s"not pushed:\n${q.queryExecution.executedPlan}")
    val r = q.head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 5L) // null excluded
    // filtered by an exact partition predicate
    val f = spark.sql(
      s"SELECT count(DISTINCT dt) FROM $cat.`$path` WHERE dt >= 'b'")
    assert(pushed(f) && f.head().getLong(0) === 2L)
    // DISTINCT on a non-partition column still declines
    val d = spark.sql(s"SELECT count(DISTINCT v) FROM $cat.`$path`")
    assert(!pushed(d) && d.head().getLong(0) === 5L)
  }

  test("multi-axis COUNT(DISTINCT) folds every composite axis from one manifest read") {
    val path = tmp("aggpd-multidistinct")
    val df = (1L to 600L).map(i =>
      (i, s"d${i % 4}", s"r${i % 3}", i)).toDF("k", "dt", "region", "v")
    BucketedLake.write(df, path, "k", 2,
      partitionCols = Seq("dt", "region"))
    val q = spark.sql(
      s"SELECT count(DISTINCT dt) AS d_dt, count(DISTINCT region) AS d_rg, " +
        s"count(*) AS n FROM $cat.`$path`")
    assert(pushed(q),
      s"multi-axis distinct must stay metadata-only:\n" +
        s"${q.queryExecution.executedPlan}")
    val r = q.head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L &&
      r.getLong(2) === 600L)
    // filtered: the fold sees only the matching partition dirs
    val f = spark.sql(
      s"SELECT count(DISTINCT dt), count(DISTINCT region) " +
        s"FROM $cat.`$path` WHERE dt = 'd1'")
    assert(pushed(f))
    assert(f.head().toSeq === Seq(1L, 3L))
    // decline rule: mixing in a NON-axis distinct sends the whole
    // aggregate to the row scan, answers unchanged
    val d = spark.sql(
      s"SELECT count(DISTINCT dt), count(DISTINCT v) FROM $cat.`$path`")
    assert(!pushed(d))
    assert(d.head().toSeq === Seq(4L, 600L))
  }

  test("exactness doubts decline to the row scan (answers stay right)") {
    val path = tmp("aggpd-decline")
    val df = (1L to 100L).map(i =>
      (i, s"s$i", if (i == 50) Float.NaN else i.toFloat,
        (i % 10).toInt)).toDF("k", "s", "f", "g")
    BucketedLake.write(df, path, "k", 4)
    def unpushed(sql: String): DataFrame = {
      val q = spark.sql(sql)
      assert(!pushed(q), s"must NOT push: $sql")
      q
    }
    // filter present
    assert(unpushed(s"SELECT count(*) FROM $cat.`$path` WHERE k <= 10")
      .head().getLong(0) === 10L)
    // string min/max now PUSHES on graft-written tables (the writer's
    // own windows are exact — see the writer-EXACT test above); the
    // inexact-decline leg lives there too
    val sq = spark.sql(s"SELECT max(s) FROM $cat.`$path`")
    assert(pushed(sq), "writer-exact string windows must push")
    assert(sq.head().getString(0) === "s99")
    // NaN poisoned the float column's windows at write time
    assert(unpushed(s"SELECT max(f) FROM $cat.`$path`")
      .head().getFloat(0).isNaN)
    // distinct
    assert(unpushed(s"SELECT count(DISTINCT g) FROM $cat.`$path`")
      .head().getLong(0) === 10L)
    // grouping on a non-partition column
    assert(unpushed(
      s"SELECT g, count(*) FROM $cat.`$path` GROUP BY g").count() === 10L)
    // avg needs sums the stats never carry
    assert(unpushed(s"SELECT avg(g) FROM $cat.`$path`").head()
      .getDouble(0) === 4.5d)
  }

  test("a re-layout between versions: grouped pushdown declines, ungrouped still prices") {
    val path = tmp("aggpd-relayout")
    BucketedLake.write(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "dt", "v"),
      path, "k", 2, partitionCol = Some("dt"))
    val v1 = BucketedLake.currentVersion(spark, path).get
    // re-partition the table: v1's __part dirs now mean a DIFFERENT axis
    BucketedLake.write(
      Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 5)).toDF("k", "g", "v"),
      path, "k", 2, partitionCol = Some("g"))
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, AggregateFunc}
    val spec = BucketedLake.readSpec(spark, path).get
    def builder = new GraftBucketScanBuilder(spark, path, spec, Some(v1))
    val grouped = new Aggregation(
      Array[AggregateFunc](new CountStar),
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("g")))
    assert(!builder.supportCompletePushDown(grouped),
      "grouping across a re-layout must decline (dir values changed axis)")
    val bare = new Aggregation(Array[AggregateFunc](new CountStar),
      Array.empty)
    assert(builder.supportCompletePushDown(bare),
      "ungrouped COUNT(*) is layout-independent and still prices")
  }

  test("exact partition filters: no Filter node, and filtered aggregates stay metadata-only") {
    val path = tmp("aggpd-exactf")
    val df = Seq(
      (1L, Option("a"), 10), (2L, Option("a"), 20), (3L, Option("b"), 5),
      (4L, Option("b"), 7), (5L, None, 42)).toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 4, partitionCol = Some("dt"))

    // a pure partition predicate is decided whole-file by every entry:
    // claimed handled -> the row scan carries NO Filter above it
    val rows = spark.sql(s"SELECT k, v FROM $cat.`$path` WHERE dt = 'a'")
    assert(rows.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    val hasFilter = rows.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FilterExec])
    assert(!hasFilter,
      s"claimed-exact predicate left a Filter:\n${rows.queryExecution.executedPlan}")

    // ... and a FILTERED aggregate can therefore reach the manifest
    val agg = spark.sql(
      s"SELECT count(*) AS n, min(v) AS lo FROM $cat.`$path` WHERE dt = 'a'")
    assert(pushed(agg), s"not pushed:\n${agg.queryExecution.executedPlan}")
    val r = agg.head()
    assert(r.getLong(0) === 2L && r.getInt(1) === 10)

    // ranges and IS NULL are exact too
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.`$path` WHERE dt >= 'b'").head().getLong(0)
      === 2L)
    val nullAgg = spark.sql(
      s"SELECT count(*) AS n FROM $cat.`$path` WHERE dt IS NULL")
    assert(pushed(nullAgg) && nullAgg.head().getLong(0) === 1L)

    // grouped + filtered composes
    val g = spark.sql(s"SELECT dt, count(*) AS n, max(v) AS hi " +
      s"FROM $cat.`$path` WHERE dt IS NOT NULL GROUP BY dt")
    assert(pushed(g))
    assert(g.collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2)))
      .toSet === Set(("a", 2L, 20), ("b", 2L, 7)))
  }

  test("mixed predicates keep the row-level part residual; bucket-only tables never claim") {
    val path = tmp("aggpd-mixed")
    val df = Seq(
      (1L, "a", 10), (2L, "a", 20), (3L, "b", 5)).toDF("k", "dt", "v")
    BucketedLake.write(df, path, "k", 2, partitionCol = Some("dt"))
    // dt='a' claimed, v>10 residual: a Filter survives with ONLY v>10,
    // the aggregate declines, and results are exact
    val q = spark.sql(
      s"SELECT count(*) FROM $cat.`$path` WHERE dt = 'a' AND v > 10")
    assert(!pushed(q))
    assert(q.head().getLong(0) === 1L)
    assert(spark.sql(s"SELECT k FROM $cat.`$path` WHERE dt = 'a' AND v > 10")
      .head().getLong(0) === 2L)
    // bucket-only layout: no partition axis, nothing claims — Filter
    // stays, answers right
    val p2 = tmp("aggpd-bucketonly")
    BucketedLake.write(df.drop("dt"), p2, "k", 2)
    val q2 = spark.sql(s"SELECT k FROM $cat.`$p2` WHERE v > 10")
    assert(q2.head().getLong(0) === 2L)
    assert(q2.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FilterExec]))
  }

  test("LIMIT trims the scan to just enough files; anything residual disables the trim") {
    val path = tmp("aggpd-limit")
    BucketedLake.write(
      (1L to 4000L).map(i => (i, s"dt${i % 2}", i)).toDF("k", "dt", "v"),
      path, "k", 8, partitionCol = Some("dt"))
    val spec = BucketedLake.readSpec(spark, path).get
    def files(setup: GraftBucketScanBuilder => Unit): Int = {
      val b = new GraftBucketScanBuilder(spark, path, spec)
      setup(b)
      b.build().toBatch.planInputPartitions()
        .map(_.asInstanceOf[GraftBucketPartition].files.length).sum
    }
    val all = files(_ => ())
    assert(all > 2)
    // bare LIMIT: one file covers 10 rows
    assert(files(_.pushLimit(10): Unit) === 1)
    // claimed-exact partition filter composes: trim within the match
    assert(files { b =>
      b.pushFilters(Array(org.apache.spark.sql.sources
        .EqualTo("dt", "dt1"))): Unit
      b.pushLimit(10): Unit
    } === 1)
    // a residual row-level filter disables the trim (kept rows might
    // not match — trimming could under-produce)
    assert(files { b =>
      b.pushFilters(Array(org.apache.spark.sql.sources
        .GreaterThan("v", 100L))): Unit
      b.pushLimit(10): Unit
    } === all)
    // end-to-end: exactly LIMIT rows, and filtered limits stay right
    assert(spark.sql(s"SELECT * FROM $cat.`$path` LIMIT 10")
      .collect().length === 10)
    val filtered = spark.sql(
      s"SELECT dt FROM $cat.`$path` WHERE dt = 'dt1' LIMIT 7").collect()
    assert(filtered.length === 7 && filtered.forall(_.getString(0) == "dt1"))
  }

  test("time travel prices the pinned version's manifest") {
    val path = tmp("aggpd-tt")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    val v1 = BucketedLake.currentVersion(spark, path).get
    (11L to 20L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    val q = spark.sql(
      s"SELECT max(v) AS hi, count(*) AS n FROM graft_bucketed('$path', $v1)")
    val r = q.head()
    assert(r.getLong(0) === 10L && r.getLong(1) === 10L)
    val now = spark.sql(
      s"SELECT max(v), count(*) FROM $cat.`$path`").head()
    assert(now.getLong(0) === 20L && now.getLong(1) === 20L)
  }
}
