package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Change data feed over the bucketed lake's MVCC history
  * ([[BucketedLake.changes]]): appends surface exactly their rows,
  * compactions are invisible, replaces render a full diff, merges read
  * their precise change files (with a correct coarse fallback), and the
  * APPLY CONTRACT holds under randomized mixed histories — feed applied
  * to the `from` snapshot == the `to` snapshot, the invariant IVM and
  * replication consumers rely on. */
class BucketedCdfSpec extends SparkSuite {

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
  private def snapshotAt(path: String, v: Long): DataFrame = {
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    spark.sql(s"SELECT * FROM graft_bucketed('$path', $v)")
  }

  /** The CDF apply contract: per version ascending, remove
    * delete/update_preimage rows, add insert/update_postimage rows —
    * multiset semantics (exceptAll/unionAll). */
  private def applyFeed(from: DataFrame, feed: DataFrame): DataFrame = {
    val vs = feed.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).sorted
    vs.foldLeft(from) { (state, v) =>
      val batch = feed.where(col("_commit_version") === v)
      val minus = batch
        .where(col("_change_type").isin("delete", "update_preimage"))
        .drop("_change_type", "_commit_version")
      val plus = batch
        .where(col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type", "_commit_version")
      state.exceptAll(minus).unionAll(plus)
    }
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))

  test("append-only feed: inserts are exactly the appended rows, versioned") {
    val path = tmp("bkc-append")
    BucketedLake.write((1L to 50L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // v1
    (51L to 80L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    (81L to 100L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v3
    val feed = BucketedLake.changes(spark, path, 1L, 3L)
    assert(feed.where(col("_change_type") =!= "insert").isEmpty)
    val got = feed.collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(got === ((51L to 80L).map(k => (k, 2L)) ++
      (81L to 100L).map(k => (k, 3L))).sorted)
    // sub-ranges slice exactly
    assert(BucketedLake.changes(spark, path, 2L, 3L).count() === 20L)
    assert(BucketedLake.changes(spark, path, 3L, 3L).count() === 0L)
    // the SQL spelling, with `to` defaulting to the commit pointer
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_bucketed_changes('$path', 2, 3)")
      .head().getLong(0) === 20L)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_bucketed_changes('$path', 1)")
      .head().getLong(0) === 50L)
  }

  test("compaction is invisible to the feed") {
    val path = tmp("bkc-compact")
    BucketedLake.write((1L to 50L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // v1
    (51L to 60L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    BucketedLake.compact(spark, path) // v3: physical only
    val feed = BucketedLake.changes(spark, path, 1L, 3L)
    assert(feed.count() === 10L)
    assert(feed.select(max(col("_commit_version"))).head().getLong(0) === 2L)
  }

  test("replace renders a full old-vs-new diff; apply contract holds") {
    val path = tmp("bkc-replace")
    BucketedLake.write((1L to 20L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // v1
    BucketedLake.write((10L to 25L).map(i => (i, i * 10)).toDF("k", "v"),
      path, "k", 4) // v2: create-or-replace
    val feed = BucketedLake.changes(spark, path, 1L, 2L)
    assert(feed.where(col("_change_type") === "delete").count() === 20L)
    assert(feed.where(col("_change_type") === "insert").count() === 16L)
    assert(sortedRows(applyFeed(snapshotAt(path, 1L), feed)) ===
      sortedRows(snapshotAt(path, 2L)))
  }

  test("merge feed falls back to the file diff when change files are lost — net effect identical") {
    val path = tmp("bkc-fallback")
    BucketedLake.write((1L to 30L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // v1
    val st = BucketedLake.merge(spark, path,
      Seq((5L, 500L), (31L, 310L)).toDF("k", "v"), Seq(9L).toDF("k")) // v2
    // simulate the crash window: the committed manifest survives, the
    // published change dir does not
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val chg = new org.apache.hadoop.fs.Path(path, f"_change/v${st.version}%06d")
    assert(fs.exists(chg))
    fs.delete(chg, true)
    val feed = BucketedLake.changes(spark, path, 1L, st.version)
    // coarser (rewritten files surface as delete+insert churn) ...
    assert(feed.where(col("_change_type") === "update_preimage").isEmpty)
    // ... but the net effect is EXACTLY the same
    assert(sortedRows(applyFeed(snapshotAt(path, 1L), feed)) ===
      sortedRows(snapshotAt(path, st.version)))
  }

  test("randomized mixed history: applying the feed reproduces every later snapshot") {
    val path = tmp("bkc-random")
    val rnd = new scala.util.Random(20260815L)
    var model = (1L to 40L).map(i => i -> i).toMap
    BucketedLake.write(model.toSeq.toDF("k", "v"), path, "k", 4) // v1
    var nextKey = 41L
    (1 to 6).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 => // append fresh keys
          val rows = (nextKey until nextKey + 5).map(k => (k, k * 2))
          nextKey += 5
          rows.toDF("k", "v").writeTo(s"$cat.`$path`").append()
          model ++= rows
        case 1 => // merge: update some, delete some, insert one
          val keys = model.keys.toSeq.sorted
          val upd = rnd.shuffle(keys).take(3).map(k => (k, k + 1000L))
          val del = rnd.shuffle(keys.filterNot(upd.map(_._1).contains))
            .take(2)
          val ins = Seq((nextKey, nextKey * 3))
          nextKey += 1
          BucketedLake.merge(spark, path, (upd ++ ins).toDF("k", "v"),
            del.toDF("k")): Unit
          model = model -- del ++ upd ++ ins
        case 2 => // compact (no logical change)
          BucketedLake.compact(spark, path)
      }
    }
    val tip = BucketedLake.versions(spark, path).max
    // model == final table (sanity of the model itself)
    assert(table(path).collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap === model)
    // the apply contract from EVERY earlier version to the tip
    BucketedLake.versions(spark, path).filter(_ < tip).foreach { from =>
      val feed = BucketedLake.changes(spark, path, from, tip)
      assert(sortedRows(applyFeed(snapshotAt(path, from), feed)) ===
        sortedRows(snapshotAt(path, tip)),
        s"apply contract broken for changes($from, $tip)")
    }
  }

  test("untagged (pre-op) versions fail loudly; vacuum trims the feed's reach") {
    val path = tmp("bkc-guards")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2) // v1
    (11L to 15L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    // forge an untagged v3: copy v2's manifest without its #op line
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v2p = new org.apache.hadoop.fs.Path(path, "_bucket_manifest.v000002.txt")
    val text = {
      val in = fs.open(v2p)
      val buf = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      finally in.close()
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    val stripped = text.linesIterator.filterNot(_.startsWith("#op"))
      .mkString("", "\n", "\n")
    val v3p = new org.apache.hadoop.fs.Path(path, "_bucket_manifest.v000003.txt")
    val out = fs.create(v3p, false)
    try out.write(stripped.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(path, "_bucket_manifest.current")
    val pout = fs.create(ptr, true)
    try pout.write("3".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally pout.close()
    val e = intercept[IllegalStateException] {
      BucketedLake.changes(spark, path, 1L, 3L).collect()
    }
    assert(e.getMessage.contains("operation tag"))
    // untagged versions still SCAN fine (the feed is the only consumer)
    assert(table(path).count() === 15L)
    // vacuum: versions below the pointer age out; the feed then refuses
    BucketedLake.vacuum(spark, path, minAgeMs = 0L): Unit
    val gone = intercept[IllegalArgumentException] {
      BucketedLake.changes(spark, path, 1L, 3L).collect()
    }
    assert(gone.getMessage.contains("retained"))
  }

  test("vacuum reclaims a doomed version's change dir; the current one survives") {
    val path = tmp("bkc-vacuum")
    BucketedLake.write((1L to 20L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2) // v1
    val st1 = BucketedLake.merge(spark, path,
      Seq((1L, 100L)).toDF("k", "v"), spark.emptyDataset[Long].toDF("k")) // v2
    val st2 = BucketedLake.merge(spark, path,
      Seq((2L, 200L)).toDF("k", "v"), spark.emptyDataset[Long].toDF("k")) // v3
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def chg(v: Long) =
      new org.apache.hadoop.fs.Path(path, f"_change/v$v%06d")
    assert(fs.exists(chg(st1.version)) && fs.exists(chg(st2.version)))
    val report = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
    assert(report.manifests >= 2) // v1, v2 manifests + v2's change dir
    assert(!fs.exists(chg(st1.version)),
      "doomed version's change dir must be reclaimed")
    assert(fs.exists(chg(st2.version)),
      "the CURRENT version's change feed must survive vacuum")
    assert(table(path).count() === 20L)
  }
}
