package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.HudiRead

/** [[HudiCowWrite.upsert]] — Hudi as a CDC target: real-layout COW
  * upserts with file-group-scoped rewrites, original commit times on
  * carried rows (incremental pulls see exactly the changes), and
  * timeline-instant idempotence. */
class HudiCowWriteSpec extends SparkSuite {

  import spark.implicits._

  private val T1 = "20240101000000000"
  private val T2 = "20240102000000000"
  private val T3 = "20240103000000000"

  test("upserts rewrite only affected groups; carried rows keep their commit time") {
    val root = Files.createTempDirectory("hudi-cow-upsert").toString
    assert(HudiCowWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt")).toDF("id", "item"), root, "id", T1))
    // second batch: update key 1, add key 3
    assert(HudiCowWrite.upsert(
      Seq((1L, "widget-v2"), (3L, "nut")).toDF("id", "item"), root, "id", T2))

    val snap = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item", "_hoodie_commit_time")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(snap === Seq((1L, "widget-v2", T2), (2L, "bolt", T1),
      (3L, "nut", T2)),
      "key 2 is CARRIED: its commit time must stay T1 through the rewrite")

    // incremental pull sees exactly the T2 changes, not carried rows
    val inc = HudiRead.incremental(spark, root, T1)
      .selectExpr("id").as[Long].collect().toSeq.sorted
    assert(inc === Seq(1L, 3L))

    // replayed instant: skipped before writing anything
    assert(!HudiCowWrite.upsert(
      Seq((9L, "stale")).toDF("id", "item"), root, "id", T2))
    assert(HudiRead.snapshot(spark, root).count() === 3L)

    // third batch touches only the NEW group (key 3) — group fg-T1
    // must not be rewritten again
    assert(HudiCowWrite.upsert(
      Seq((3L, "nut-v2")).toDF("id", "item"), root, "id", T3))
    val after = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item", "_hoodie_commit_time")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(after === Seq((1L, "widget-v2", T2), (2L, "bolt", T1),
      (3L, "nut-v2", T3)))
    // the T2 group holding keys 1 (and formerly 3) was rewritten at T3?
    // no: only key 3's group. Key 1's commit time stays T2.
  }

  test("partitioned upserts route rows by the partition column in one commit") {
    val root = Files.createTempDirectory("hudi-cow-part").toString
    // batch 1: two partitions, two keys each
    assert(HudiCowWrite.upsertPartitioned(
      Seq((1L, "a", "red"), (2L, "b", "red"), (3L, "c", "blue"),
        (4L, "d", "blue")).toDF("id", "item", "color"),
      root, "id", "color", T1))
    // batch 2: update key 1 (red), add key 5 to a NEW partition (green)
    assert(HudiCowWrite.upsertPartitioned(
      Seq((1L, "a2", "red"), (5L, "e", "green")).toDF("id", "item", "color"),
      root, "id", "color", T2))
    val snap = HudiRead.snapshot(spark, root)
      .selectExpr("id", "item", "color", "_hoodie_commit_time")
      .as[(Long, String, String, String)].collect().toSeq.sorted
    assert(snap === Seq((1L, "a2", "red", T2), (2L, "b", "red", T1),
      (3L, "c", "blue", T1), (4L, "d", "blue", T1), (5L, "e", "green", T2)),
      "partition column restored from the directory; carried rows keep T1")
    // key scoping is PER PARTITION: id 3 upserted under red is a NEW
    // record there, blue's id 3 untouched
    assert(HudiCowWrite.upsertPartitioned(
      Seq((3L, "c-red", "red")).toDF("id", "item", "color"),
      root, "id", "color", T3))
    val byColor = HudiRead.snapshot(spark, root)
      .selectExpr("id", "color").as[(Long, String)].collect().toSeq.sorted
    assert(byColor.count(_._1 == 3L) === 2)
    // partitioned deletes: drop blue's id 3, red's id 3 survives
    assert(HudiCowWrite.deleteKeysPartitioned(
      Seq((3L, "blue")).toDF("id", "color"), root, "id", "color",
      "20240104000000000"))
    val after = HudiRead.snapshot(spark, root)
      .selectExpr("id", "color").as[(Long, String)].collect().toSeq.sorted
    assert(after.filter(_._1 == 3L) === Seq((3L, "red")))
  }

  test("path-breaking partition values fail loudly instead of corrupting the layout") {
    val root = Files.createTempDirectory("hudi-cow-badpart").toString
    val slash = intercept[Exception] {
      HudiCowWrite.upsertPartitioned(
        Seq((1L, "a", "red/pink")).toDF("id", "item", "color"),
        root, "id", "color", T1)
    }
    assert(slash.getMessage.contains("path-breaking"),
      s"expected the /-value guard, got: ${slash.getMessage}")
    val eq = intercept[Exception] {
      HudiCowWrite.deleteKeysPartitioned(
        Seq((1L, "a=b")).toDF("id", "color"), root, "id", "color", T1)
    }
    assert(eq.getMessage.contains("path-breaking"))
    val nul = intercept[Exception] {
      HudiCowWrite.upsertPartitioned(
        Seq((1L, "a", null: String)).toDF("id", "item", "color"),
        root, "id", "color", T1)
    }
    assert(nul.getMessage.contains("null"))
  }

  test("job count stays constant in the number of affected file groups") {
    // seed n file groups (disjoint keys), then one upsert touching every
    // group + a fresh key; return the Spark job count of the upsert
    def jobsForGroups(nGroups: Int): Int = {
      val root = Files.createTempDirectory(s"hudi-cow-jobs-$nGroups").toString
      (0 until nGroups).foreach { g =>
        val rows = Seq((g * 100L, s"g$g-a"), (g * 100L + 1, s"g$g-b"))
          .toDF("id", "item")
          .withColumn("_hoodie_record_key", $"id".cast("string"))
          .withColumn("_hoodie_commit_time",
            org.apache.spark.sql.functions.lit(T1))
        HudiMorWrite.writeBase(rows, root, "part=0", s"fg$g", T1)
      }
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val batch = ((0 until nGroups).map(g => (g * 100L, s"new-$g")) ++
          Seq((9990L, "n1"), (9991L, "n2"))).toDF("id", "item")
        assert(HudiCowWrite.upsert(batch, root, "id", T2))
        Thread.sleep(1000) // listener bus drain
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val small = jobsForGroups(4)
    val large = jobsForGroups(24)
    assert(large <= small + 3,
      s"jobs grew $small -> $large from 4 to 24 affected groups — the " +
        "committer must not loop per group (contract: constant job count)")
    // and the 24-group write is still correct (re-read the large table)
    val root24 = Files.createTempDirectory("hudi-cow-jobs-check").toString
    (0 until 3).foreach { g =>
      val rows = Seq((g * 100L, s"g$g-a"), (g * 100L + 1, s"g$g-b"))
        .toDF("id", "item")
        .withColumn("_hoodie_record_key", $"id".cast("string"))
        .withColumn("_hoodie_commit_time",
          org.apache.spark.sql.functions.lit(T1))
      HudiMorWrite.writeBase(rows, root24, "part=0", s"fg$g", T1)
    }
    assert(HudiCowWrite.upsert(
      ((0 until 3).map(g => (g * 100L, s"new-$g")) :+ (9990L, "n1"))
        .toDF("id", "item"), root24, "id", T2))
    val snap = HudiRead.snapshot(spark, root24)
      .selectExpr("id", "item", "_hoodie_commit_time")
      .as[(Long, String, String)].collect().toSeq
    assert(snap.size === 3 * 2 + 1)
    assert(snap.count(_._3 == T2) === 3 + 1)
    assert(snap.filter(_._1 == 0L).map(_._2) === Seq("new-0"))
    assert(snap.filter(_._1 == 1L).map(_._2) === Seq("g0-b"))
  }

  test("the tables round-trip through the graft-hudi streaming tail") {
    val root = Files.createTempDirectory("hudi-cow-tail").toString
    HudiCowWrite.upsert(Seq((1L, "a")).toDF("id", "item"), root, "id", T1)
    HudiCowWrite.upsert(Seq((1L, "b"), (2L, "c")).toDF("id", "item"),
      root, "id", T2)
    val q = spark.readStream.format("graft-hudi").option("path", root).load()
      .writeStream.format("memory").queryName("cow_upsert_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("cow_upsert_tail")
      .selectExpr("version", "row").as[(Long, String)].collect().toSeq
    // the first drain spans both commits: COW incremental semantics —
    // the T2 rewrite collapsed id 1's T1 state, so exactly the LATEST
    // rows emit, both stamped T2 (id 1 updated, id 2 new)
    assert(rows.count(_._1 == T1.toLong) === 0)
    assert(rows.count(_._1 == T2.toLong) === 2)
    assert(rows.exists(_._2.contains("\"b\"")) && rows.exists(_._2.contains("\"c\"")))
  }
}
