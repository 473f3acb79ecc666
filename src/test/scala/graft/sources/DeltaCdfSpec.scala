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

  test("updateWhere: row-level UPDATE with pre/postimage cdc; snapshot rewritten") {
    val root = Files.createTempDirectory("delta-upd").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"))
        .toDF("id", "price", "par"), root, Seq("par"))
    graft.sink.DeltaWrite.updateWhere(spark, root, "id % 2 = 0",
      Map("price" -> "price * 10"))

    // snapshot: only the matched row changed, carried-overs intact
    val snap = DeltaRead.snapshot(spark, root)
      .selectExpr("id", "price").as[(Long, Double)].collect().toSeq.sorted
    assert(snap === Seq((1L, 10.0), (2L, 200.0), (3L, 30.0)))

    // CDF: exactly one preimage + one postimage, with partition column
    val changes = DeltaRead.changes(spark, root, 1L, 1L)
      .selectExpr("id", "price", "par", "_change_type")
      .as[(Long, Double, String, String)].collect().toSeq.sorted
    assert(changes === Seq(
      (2L, 20.0, "a", "update_preimage"),
      (2L, 200.0, "a", "update_postimage")),
      s"row-level delta, never whole-file insert+delete: $changes")

    // the streaming tail carries the same row classes
    val q = spark.readStream.format("graft-delta").option("path", root)
      .option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("upd_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val tail = spark.table("upd_tail").selectExpr("change_type", "row")
      .as[(String, String)].collect().toSeq
    assert(tail.map(_._1).sorted === Seq("update_postimage", "update_preimage"))
    assert(tail.forall(_._2.contains("\"par\":\"a\"")))

    // a second update matching NOTHING commits nothing
    graft.sink.DeltaWrite.updateWhere(spark, root, "id = 999",
      Map("price" -> "0.0"))
    assert(DeltaRead.latestVersion(spark, root) === 1L)
  }

  test("deleteWhere(emitCdc): DV deletes become consumable delete rows") {
    val root = Files.createTempDirectory("delta-delcdc").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"))
        .toDF("id", "price", "par"), root, Seq("par"))
    graft.sink.DeltaWrite.deleteWhere(spark, root, "id <= 2", emitCdc = true)

    // snapshot: DV applied
    assert(DeltaRead.snapshot(spark, root).selectExpr("id")
      .as[Long].collect().toSeq === Seq(3L))
    // CDF: exactly the two dying rows, partition column attached
    val changes = DeltaRead.changes(spark, root, 1L, 1L)
      .selectExpr("id", "par", "_change_type")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(changes === Seq((1L, "a", "delete"), (2L, "a", "delete")))

    // overlapping second delete: only the NEWLY dead row is reported
    graft.sink.DeltaWrite.deleteWhere(spark, root, "id <= 3", emitCdc = true)
    val second = DeltaRead.changes(spark, root, 2L, 2L)
      .selectExpr("id", "_change_type").as[(Long, String)].collect().toSeq
    assert(second === Seq((3L, "delete")),
      s"rows already dead in a prior DV must not re-report: $second")

    // the tail consumes the feed instead of firing the DV gate
    val q = spark.readStream.format("graft-delta").option("path", root).load()
      .writeStream.format("memory").queryName("delcdc_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val tail = spark.table("delcdc_tail").selectExpr("version", "change_type")
      .as[(Long, String)].collect().toSeq
    assert(tail.count(_._2 == "delete") === 3)
    assert(tail.count(_._2 == "insert") === 3) // v0 creates
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
    // the action's size must be TRUE — scan split planning trusts it,
    // exactly like Delta's own clients trust add/cdc sizes
    val cdcSize = Files.size(cdDir.resolve("cdc-1.parquet"))
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      s"""{"cdc":{"path":"_change_data/cdc-1.parquet","partitionValues":{},"size":$cdcSize,"dataChange":false}}""" + "\n" +
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

  test("plan contract: scans are O(versions × change-classes), not O(files)") {
    // a single commit that lands 120 files must plan as ONE multi-file
    // scan — per-file scans + a 120-way union blow up driver planning
    // exactly like the pre-round-8 snapshot path did
    val root = Files.createTempDirectory("delta-cdfp").resolve("t").toString
    graft.sink.DeltaWrite.create(
      (1L to 600L).map(i => (i, s"i$i", if (i % 2 == 0) "a" else "b"))
        .toDF("id", "item", "par").repartition(60),
      root, Seq("par"))
    val nAdded = DeltaRead.tableState(spark, root,
      0L).live.size
    assert(nAdded >= 100, s"fixture should land >=100 files, got $nAdded")
    val v0 = DeltaRead.changes(spark, root, 0L, 0L)
    assert(v0.count() === 600L)
    val plan0 = v0.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllMatchIn(plan0).size === 1,
      s"v0 ($nAdded added files, one change class) must be ONE scan:\n$plan0")
    // v1 rewrites partition a (many removes + adds): the whole 0..1 feed
    // is one scan per (version, change-class) = v0-insert, v1-delete,
    // v1-insert — THREE scans, independent of file count
    graft.sink.DeltaWrite.replacePartition(
      (2L to 600L by 2).map(i => (i, s"I$i", "a")).toDF("id", "item", "par")
        .repartition(30), root, "par", "a")
    val feed = DeltaRead.changes(spark, root, 0L, 1L)
    val plan1 = feed.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllMatchIn(plan1).size === 3,
      s"0..1 feed must be one scan per (version, change-class):\n$plan1")
    // and the contents stay right: partition-a deletes == its v0 inserts
    val byClass = feed.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byClass((0L, "insert")) === 600L)
    assert(byClass((1L, "delete")) === 300L)
    assert(byClass((1L, "insert")) === 300L)
  }

  test("plan contract: partition predicates PRUNE the CDF scans at planning time") {
    val root = Files.createTempDirectory("delta-cdfprune").resolve("t").toString
    graft.sink.DeltaWrite.create(
      (1L to 100L).map(i => (i, s"i$i", s"p${i % 5}")).toDF("id", "item", "par"),
      root, Seq("par"))
    val feed = DeltaRead.changes(spark, root, 0L, 0L)
      .where(org.apache.spark.sql.functions.col("par") === "p1")
    assert(feed.count() === 20L)
    val scan = feed.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in the CDF plan"))
    assert(scan.partitionFilters.nonEmpty,
      "the partition predicate must reach the StaticFileIndex")
    val allFiles = scan.relation.location.inputFiles.length
    val readFiles = scan.selectedPartitions.totalNumberOfFiles
    assert(readFiles < allFiles,
      s"pruning must cut the file list ($readFiles of $allFiles read)")
  }

  test("CDF over a column-mapped table restores logical names") {
    // name-mode table: parquet/cdc columns are col-aaa/col-bbb, the
    // partition column dt's partitionValues key is col-ddd
    val root = Files.createTempDirectory("delta-cdfm")
    def schemaString = {
      def f(name: String, phys: String, tpe: String, id: Int) =
        s"""{"name":"$name","type":"$tpe","nullable":true,"metadata":{""" +
          s""""delta.columnMapping.physicalName":"$phys","delta.columnMapping.id":$id}}"""
      (s"""{"type":"struct","fields":[${f("id", "col-aaa", "long", 1)},""" +
        s"""${f("item", "col-bbb", "string", 2)},${f("dt", "col-ddd", "string", 3)}]}""")
        .replace("\"", "\\\"")
    }
    def physParquet(dir: String, name: String, rows: Seq[(Long, String)]): Long = {
      val tmp = Files.createTempDirectory("cdfm-p")
      rows.toDF("col-aaa", "col-bbb").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.createDirectories(root.resolve(dir))
      Files.copy(part, root.resolve(s"$dir/$name"))
      Files.size(root.resolve(s"$dir/$name"))
    }
    val logDir = root.resolve("_delta_log")
    Files.createDirectories(logDir)
    val sz1 = physParquet("d1", "f1.parquet", Seq((1L, "widget"), (2L, "bolt")))
    Files.writeString(logDir.resolve(f"${0L}%020d.json"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" + "\n" +
        s"""{"metaData":{"id":"m1","partitionColumns":["dt"],"schemaString":"$schemaString","format":{"provider":"parquet"},"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"}}}""" + "\n" +
        s"""{"add":{"path":"d1/f1.parquet","partitionValues":{"col-ddd":"2024-06-01"},"size":$sz1,"modificationTime":1,"dataChange":true}}""" + "\n")
    // v1: remove f1 (physical pv keys), add f2
    val sz2 = physParquet("d2", "f2.parquet", Seq((3L, "nut")))
    Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      s"""{"remove":{"path":"d1/f1.parquet","dataChange":true,"partitionValues":{"col-ddd":"2024-06-01"}}}""" + "\n" +
        s"""{"add":{"path":"d2/f2.parquet","partitionValues":{"col-ddd":"2024-06-02"},"size":$sz2,"modificationTime":2,"dataChange":true}}""" + "\n")
    val all = DeltaRead.changes(spark, root.toString, 0L, 1L)
    assert(all.schema.fieldNames.toSeq ===
      Seq("id", "item", "dt", "_change_type", "_commit_version"))
    val rows = all.selectExpr("id", "item", "dt", "_change_type", "_commit_version")
      .as[(Long, String, String, String, Long)].collect().toSeq.sorted
    assert(rows === Seq(
      (1L, "widget", "2024-06-01", "delete", 1L),
      (1L, "widget", "2024-06-01", "insert", 0L),
      (2L, "bolt", "2024-06-01", "delete", 1L),
      (2L, "bolt", "2024-06-01", "insert", 0L),
      (3L, "nut", "2024-06-02", "insert", 1L)).sorted)
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
