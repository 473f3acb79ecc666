package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** [[DeltaRead.changes]] — Delta Change Data Feed: synthesized
  * insert/delete from file actions, explicit `cdc` actions taking
  * precedence, partition-column attachment, and the loud gates
  * (vacuumed range, DV-without-cdc, partitioned remove without
  * partitionValues). */
class DeltaCdfSpec extends SparkSuite {

  import spark.implicits._

  test("synthesized CDF: create is inserts, partition rewrite is delete+insert") {
    val root = Files.createTempDirectory("delta-cdf").resolve("t").toString
    val df = Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
      .toDF("id", "item", "par")
    graft.sink.DeltaWrite.create(df, root, Seq("par"))
    val rewrite = Seq((1L, "widget-v2", "a"), (4L, "gear", "a"))
      .toDF("id", "item", "par")
    graft.sink.DeltaWrite.replacePartition(rewrite, root, "par", "a")

    val all = DeltaRead.changes(spark, root, 0L, 1L)
      .selectExpr("id", "item", "par", "_change_type", "_commit_version")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // v0: all three rows as inserts
    assert(all.filter(c => c._5 == 0L).map(c => (c._1, c._4)).sorted ===
      Seq((1L, "insert"), (2L, "insert"), (3L, "insert")))
    // v1: partition a's old rows deleted, new rows inserted; b untouched
    val v1 = all.filter(_._5 == 1L)
    assert(v1.filter(_._4 == "delete").map(_._1).sorted === Seq(1L, 2L))
    assert(v1.filter(_._4 == "insert").map(c => (c._1, c._2)).sorted ===
      Seq((1L, "widget-v2"), (4L, "gear")))
    assert(v1.forall(_._3 == "a"), "partition column must come from the action")
    // a sub-range reads only its versions
    assert(DeltaRead.changes(spark, root, 1L, 1L).count() === 4L)
  }

  test("explicit cdc actions take precedence over file actions") {
    val root = Files.createTempDirectory("delta-cdfc").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "x"), (2L, "y")).toDF("id", "item"), root, Nil)
    // v1: an UPDATE commit — cdc file with pre/post images + add/remove
    // (the state actions must be ignored by CDF in favor of the cdc file)
    val cdDir = java.nio.file.Paths.get(root, "_change_data")
    Files.createDirectories(cdDir)
    val tmp = Files.createTempDirectory("cdf-cdc")
    Seq((1L, "x", "update_preimage"), (1L, "x2", "update_postimage"))
      .toDF("id", "item", "_change_type").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part, cdDir.resolve("cdc-1.parquet"))
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      """{"cdc":{"path":"_change_data/cdc-1.parquet","partitionValues":{},"size":1,"dataChange":false}}""" + "\n" +
        """{"remove":{"path":"whatever.parquet","dataChange":true}}""" + "\n")
    val v1 = DeltaRead.changes(spark, root, 1L, 1L)
      .selectExpr("id", "item", "_change_type")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(v1 === Seq((1L, "x", "update_preimage"), (1L, "x2", "update_postimage")))
  }

  test("CDF replication: applying the feed reproduces the Delta snapshot") {
    val root = Files.createTempDirectory("delta-cdfr").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
        .toDF("id", "item", "par"), root, Seq("par"))
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a"), (4L, "gear", "a")).toDF("id", "item", "par"),
      root, "par", "a")
    val lake = graft.sink.LakeTable(
      Files.createTempDirectory("cdf-lake").resolve("t").toString,
      "replica", Seq("id"), precombineField = "_commit_version")
    (0L to 1L).foreach { v =>
      val all = DeltaRead.changes(spark, root, v, v)
      val ups = all.where("_change_type IN ('insert', 'update_postimage')")
        .drop("_change_type")
      // net effect per key within one commit: a delete of a key that is
      // re-inserted in the same commit must not win
      val dels = all.where("_change_type = 'delete'").drop("_change_type")
        .join(ups.select("id").distinct(), Seq("id"), "left_anti")
      if (!dels.isEmpty) graft.sink.MergeWriter.delete(spark, dels, lake)
      if (!ups.isEmpty) graft.sink.MergeWriter.upsert(spark, ups, lake)
    }
    val got = graft.sink.MergeWriter.readView(spark, lake)
      .select("id", "item", "par").as[(Long, String, String)]
      .collect().sorted.toSeq
    val want = DeltaRead.snapshot(spark, root)
      .select("id", "item", "par").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got === want)
  }

  test("loud gates: vacuumed range, DV commits without cdc") {
    val root = Files.createTempDirectory("delta-cdfg").resolve("t").toString
    graft.sink.DeltaWrite.create(
      (1L to 20L).map(i => (i, s"i$i")).toDF("id", "item"), root, Nil)
    graft.sink.DeltaWrite.deleteWhere(spark, root, "id <= 5")
    // the DV commit (v1) cannot be synthesized
    val e = intercept[IllegalArgumentException](
      DeltaRead.changes(spark, root, 0L, 1L).collect())
    assert(e.getMessage.contains("deletion vectors without cdc"))
    // v0 alone is fine
    assert(DeltaRead.changes(spark, root, 0L, 0L).count() === 20L)
    // a missing version in range is loud
    val e2 = intercept[IllegalArgumentException](
      DeltaRead.changes(spark, root, 0L, 7L))
    assert(e2.getMessage.contains("version 2 missing"))
  }
}
