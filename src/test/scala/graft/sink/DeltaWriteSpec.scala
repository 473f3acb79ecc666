package graft.sink

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.sources.DeltaRead

/** [[DeltaWrite]] ↔ [[DeltaRead]] round-trip: create / partition
  * replacement / checkpoint / log vacuum, percent-encoded paths for
  * partition values with spaces, and protocol-conformant log contents. */
class DeltaWriteSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("delta-write")
    Files.delete(d) // create() requires a fresh path
    d.toString
  }

  test("appendTxn: SetTransaction exactly-once across replays, checkpoint, vacuum") {
    val root = tmp()
    DeltaWrite.create(
      Seq((1L, "widget")).toDF("id", "item"), root, Nil)
    // foreachBatch-style at-least-once delivery: batch 1 replayed twice
    assert(DeltaWrite.appendTxn(
      Seq((2L, "bolt")).toDF("id", "item"), root, "app-a", 1L))
    assert(!DeltaWrite.appendTxn(
      Seq((2L, "bolt")).toDF("id", "item"), root, "app-a", 1L),
      "replayed batch must be skipped")
    // an OLDER txn version is also a replay
    assert(!DeltaWrite.appendTxn(
      Seq((9L, "stale")).toDF("id", "item"), root, "app-a", 0L))
    // a different appId has its own watermark
    assert(DeltaWrite.appendTxn(
      Seq((3L, "nut")).toDF("id", "item"), root, "app-b", 1L))
    assert(DeltaWrite.appendTxn(
      Seq((4L, "gear")).toDF("id", "item"), root, "app-a", 2L))
    def rows(): Seq[Long] = DeltaRead.snapshot(spark, root)
      .selectExpr("id").as[Long].collect().toSeq.sorted
    assert(rows() === Seq(1L, 2L, 3L, 4L))
    // watermarks survive checkpoint + log vacuum
    DeltaWrite.checkpoint(spark, root)
    DeltaWrite.vacuumLog(spark, root)
    assert(!DeltaWrite.appendTxn(
      Seq((5L, "cog")).toDF("id", "item"), root, "app-a", 2L),
      "watermark must round-trip through the checkpoint")
    assert(DeltaWrite.appendTxn(
      Seq((5L, "cog")).toDF("id", "item"), root, "app-a", 3L))
    assert(rows() === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("merge: keyed upserts+deletes rewrite only key-holding files; MERGE cdc; txn guard") {
    val root = tmp()
    // two files with disjoint keys (create + append)
    DeltaWrite.create(
      Seq((1L, "widget"), (2L, "bolt")).toDF("id", "item"), root, Nil)
    DeltaWrite.append(
      Seq((3L, "nut"), (4L, "gear")).toDF("id", "item"), root)
    val untouched = DeltaRead.tableState(spark, root, 1L).live
      .map(_.path).toSet
    // epoch 0: update key 1, delete key 2, insert key 5 — only the FIRST
    // file holds touched keys
    assert(DeltaWrite.merge(
      Seq((1L, "widget-v2"), (5L, "cog")).toDF("id", "item"),
      Seq(Tuple1(2L)).toDF("id"), root, Seq("id"), "m-app", 0L))
    def rows(): Seq[(Long, String)] = DeltaRead.snapshot(spark, root)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq.sorted
    assert(rows() === Seq((1L, "widget-v2"), (3L, "nut"), (4L, "gear"),
      (5L, "cog")))
    val after = DeltaRead.tableState(spark, root, 2L).live.map(_.path).toSet
    assert(after.intersect(untouched).nonEmpty,
      "the file with only untouched keys (3, 4) must NOT be rewritten")
    // MERGE cdc classes land in the change feed
    val cdc = DeltaRead.changes(spark, root, 2L, 2L)
      .selectExpr("_change_type", "id").as[(String, Long)]
      .collect().toSeq.sorted
    assert(cdc === Seq(("delete", 2L), ("insert", 5L),
      ("update_postimage", 1L), ("update_preimage", 1L)))
    assert(DeltaRead.changes(spark, root, 2L, 2L)
      .where("_change_type = 'update_preimage'")
      .selectExpr("item").as[String].head() === "widget")
    // replayed epoch: skipped before any byte
    assert(!DeltaWrite.merge(
      Seq((9L, "stale")).toDF("id", "item"),
      Seq.empty[Tuple1[Long]].toDF("id"), root, Seq("id"), "m-app", 0L))
    assert(rows().size === 4)
    // a RESET checkpoint (txn behind the watermark) fails loudly
    assert(DeltaWrite.merge(Seq((6L, "pin")).toDF("id", "item"),
      Seq.empty[Tuple1[Long]].toDF("id"), root, Seq("id"), "m-app", 1L))
    val err = intercept[IllegalStateException] {
      DeltaWrite.merge(Seq((7L, "bad")).toDF("id", "item"),
        Seq.empty[Tuple1[Long]].toDF("id"), root, Seq("id"), "m-app", 0L)
    }
    assert(err.getMessage.contains("behind the committed watermark"))
  }

  test("create → replacePartition → checkpoint → vacuum round-trips") {
    val root = tmp()
    val df = Seq((1L, "widget", "A"), (2L, "bolt", "A"), (3L, "nut", "B"))
      .toDF("id", "item", "grp")
    DeltaWrite.create(df, root, Seq("grp"))
    assert(DeltaRead.snapshot(spark, root).count() === 3L)
    // rewrite partition A with upper-cased items
    DeltaWrite.replacePartition(
      Seq((1L, "WIDGET", "A"), (2L, "BOLT", "A")).toDF("id", "item", "grp"),
      root, "grp", "A")
    val afterRewrite = DeltaRead.snapshot(spark, root)
      .select("id", "item", "grp").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(afterRewrite === Seq((1L, "WIDGET", "A"), (2L, "BOLT", "A"),
      (3L, "nut", "B")))
    // time travel still sees v0
    assert(DeltaRead.snapshot(spark, root, versionAsOf = Some(0L))
      .where("item = 'widget'").count() === 1L)
    // checkpoint + vacuum: v0/v1 JSON gone, table still readable
    DeltaWrite.checkpoint(spark, root)
    DeltaWrite.vacuumLog(spark, root)
    assert(!Files.exists(Paths.get(root, "_delta_log", f"${0L}%020d.json")))
    val afterVacuum = DeltaRead.snapshot(spark, root)
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(afterVacuum === Seq((1L, "WIDGET"), (2L, "BOLT"), (3L, "nut")))
    // partition column typed + declared order preserved via schemaString
    assert(DeltaRead.snapshot(spark, root).schema.fieldNames.toSeq
      === Seq("id", "item", "grp"))
  }

  test("checkpoint round-trips the table's ACTUAL protocol, not a synthesized one") {
    val root = tmp()
    DeltaWrite.create(Seq((1L, "widget")).toDF("id", "item"), root, Nil)
    // upgrade the table to a feature protocol this writer does not itself
    // emit (all features reader-supported, so replay still works); a
    // checkpoint that re-synthesized (1,2) here would downgrade it
    val logDir = Paths.get(root, "_delta_log")
    Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","timestampNtz"],""" +
        """"writerFeatures":["columnMapping","timestampNtz","domainMetadata"]}}""" + "\n")
    DeltaWrite.checkpoint(spark, root)
    DeltaWrite.vacuumLog(spark, root)
    val proto = DeltaRead.tableState(spark, root,
      DeltaRead.latestVersion(spark, root)).protocol
    assert(proto === Some(DeltaRead.Protocol(3, 7,
      Seq("columnMapping", "timestampNtz"),
      Seq("columnMapping", "timestampNtz", "domainMetadata"))),
      "post-vacuum replay must see the original protocol from the checkpoint")
    assert(DeltaRead.snapshot(spark, root).count() === 1L)
  }

  test("maxFiles seatbelt: replay past the cap fails loudly by name") {
    val root = tmp()
    val df = Seq((1L, "a", "A"), (2L, "b", "B"), (3L, "c", "C"))
      .toDF("id", "item", "grp").repartition(3)
    DeltaWrite.create(df, root, Seq("grp")) // ≥3 files (one per partition)
    val e = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, root, maxFiles = 2).count())
    assert(e.getMessage.contains("more than 2 live files"))
    // the same seatbelt guards the checkpoint-loaded path
    DeltaWrite.checkpoint(spark, root)
    DeltaWrite.vacuumLog(spark, root)
    val e2 = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, root, maxFiles = 2).count())
    assert(e2.getMessage.contains("more than 2 live files"))
    assert(DeltaRead.snapshot(spark, root).count() === 3L)
  }

  test("OPTIMIZE compacts files; snapshot identical; CDF stays silent") {
    val root = tmp()
    val df = (1L to 300L).map(i => (i, s"i$i", if (i % 2 == 0) "a" else "b"))
      .toDF("id", "item", "grp").repartition(20)
    DeltaWrite.create(df, root, Seq("grp"))
    val before = DeltaRead.snapshot(spark, root)
      .select("id", "item", "grp").as[(Long, String, String)]
      .collect().sorted.toSeq
    val filesBefore = DeltaRead.tableState(spark, root, 0L).live.size
    assert(filesBefore > 4, s"fixture should land many files, got $filesBefore")
    DeltaWrite.optimize(spark, root)
    // snapshot contents identical, one file per partition now live
    val after = DeltaRead.snapshot(spark, root)
      .select("id", "item", "grp").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(after === before)
    val live = DeltaRead.tableState(spark, root, 1L).live
    assert(live.size === 2, s"expected 1 file per partition, got ${live.size}")
    // dataChange=false: the optimize version emits NO CDF rows
    assert(DeltaRead.changes(spark, root, 1L, 1L).count() === 0L)
    // time travel to the pre-optimize version still reads the old files
    assert(DeltaRead.snapshot(spark, root, versionAsOf = Some(0L))
      .count() === 300L)
    // idempotence guard: nothing left to compact → loud no-op
    val e = intercept[IllegalArgumentException](DeltaWrite.optimize(spark, root))
    assert(e.getMessage.contains("nothing to optimize"))
  }

  test("OPTIMIZE ZORDER: compacted files cluster on the z-key, contents equal") {
    val root = tmp()
    // ids striped across files so un-clustered min/max ranges all overlap
    DeltaWrite.create(
      (1L to 400L).map(i => (i, i % 20, s"i$i")).toDF("x", "y", "item")
        .repartition(8), root, Nil)
    val before = DeltaRead.snapshot(spark, root)
      .select("x", "y", "item").as[(Long, Long, String)].collect().sorted.toSeq
    DeltaWrite.optimize(spark, root, filesPerPartition = 4,
      zorderBy = Seq("x", "y"))
    val after = DeltaRead.snapshot(spark, root)
      .select("x", "y", "item").as[(Long, Long, String)].collect().sorted.toSeq
    assert(after === before)
    val live = DeltaRead.tableState(spark, root, 1L).live
    assert(live.size === 4)
    // clustering evidence: per-file x ranges are now (mostly) DISJOINT —
    // each file covers a narrow slice instead of the whole 1..400 stripe
    val ranges = live.map { f =>
      val df = spark.read.parquet(
        java.nio.file.Paths.get(root, f.path).toString)
      val r = df.agg(org.apache.spark.sql.functions.min("x"),
        org.apache.spark.sql.functions.max("x")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // before clustering every file spans ~the whole 1..400 stripe (the
    // fixture repartitions round-robin); after z-ordering on (x, y) each
    // file's x range must be at most ~half the stripe (the curve splits
    // x, then y within each half — 2 files per x-half is correct z-order)
    assert(ranges.forall { case (lo, hi) => hi - lo <= 210 },
      s"z-ordered files should carve narrow x ranges, got $ranges")
    assert(ranges.map(_._1).distinct.size >= 2,
      s"files should start at different x points, got $ranges")
  }

  test("vacuumData deletes unreferenced files; retained window survives") {
    val root = tmp()
    DeltaWrite.create(
      (1L to 100L).map(i => (i, s"i$i", if (i % 2 == 0) "a" else "b"))
        .toDF("id", "item", "grp").repartition(6), root, Seq("grp"))
    DeltaWrite.replacePartition(
      (2L to 100L by 2).map(i => (i, s"I$i", "a")).toDF("id", "item", "grp"),
      root, "grp", "a")
    val liveNow = DeltaRead.tableState(spark, root, 1L).live.size
    // retain only the current version: v0's replaced partition-a files go
    val n = DeltaWrite.vacuumData(spark, root, retainVersions = 1)
    assert(n > 0, "the replaced files must be deleted")
    assert(DeltaRead.snapshot(spark, root).count() === 100L)
    assert(DeltaRead.tableState(spark, root, 1L).live.size === liveNow)
    // time travel to v0 now fails at SCAN time (files gone) — the log
    // still replays, but the data is honestly unreadable
    val e = intercept[Exception](
      DeltaRead.snapshot(spark, root, versionAsOf = Some(0L))
        .where("grp = 'a'").count())
    assert(e != null)
    // a second vacuum finds nothing
    assert(DeltaWrite.vacuumData(spark, root, retainVersions = 1) === 0)
  }

  test("vacuumData keeps DV files referenced by the retained window") {
    val root = tmp()
    DeltaWrite.create((1L to 50L).map(i => (i, s"i$i")).toDF("id", "item"),
      root, Nil)
    DeltaWrite.deleteWhere(spark, root, "id <= 10")
    assert(DeltaWrite.vacuumData(spark, root, retainVersions = 1) === 0,
      "every data file and its DV are referenced by the current version")
    assert(DeltaRead.snapshot(spark, root).count() === 40L)
  }

  test("merge evolves the schema: new batch columns extend the replica") {
    val root = tmp()
    DeltaWrite.create(Seq((1L, "a"), (2L, "b")).toDF("id", "item"), root, Nil)
    // widened batch: new column 'score' — update key 2, insert key 3
    assert(DeltaWrite.merge(
      Seq((2L, "b2", 0.5), (3L, "c", 0.9)).toDF("id", "item", "score"),
      Seq.empty[Long].toDF("id"), root, Seq("id"), "evo", 1L))
    val snap = DeltaRead.snapshot(spark, root)
      .selectExpr("id", "item", "score")
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(snap === Seq((1L, "a", None), (2L, "b2", Some(0.5)),
      (3L, "c", Some(0.9))),
      "carried row 1 must read NULL for the evolved column")
    // a NARROWER later batch is fine: missing non-key columns land NULL
    assert(DeltaWrite.merge(
      Seq((4L, "d")).toDF("id", "item"),
      Seq.empty[Long].toDF("id"), root, Seq("id"), "evo", 2L))
    val after = DeltaRead.snapshot(spark, root)
      .selectExpr("id", "score").as[(Long, Option[Double])]
      .collect().toSeq.sortBy(_._1)
    assert(after === Seq((1L, None), (2L, Some(0.5)), (3L, Some(0.9)),
      (4L, None)))
    // same-name different-type fails loudly, nothing committed
    val clash = intercept[IllegalArgumentException] {
      DeltaWrite.merge(
        Seq((5L, "e", "high")).toDF("id", "item", "score"),
        Seq.empty[Long].toDF("id"), root, Seq("id"), "evo", 3L)
    }
    assert(clash.getMessage.contains("schema conflict"))
    assert(DeltaRead.snapshot(spark, root).count() === 4L)
  }

  test("DV delete merges existing vectors and stays constant-job in file count") {
    // correctness across stacked deletes over MANY files (per-file DVs
    // written executor-side must merge with the first commit's vectors)
    def build(nFiles: Int): String = {
      val root = tmp()
      DeltaWrite.create(
        (1L to nFiles * 10L).map(i => (i, s"i$i")).toDF("id", "item")
          .repartition(nFiles), root, Nil)
      root
    }
    val root = build(8)
    DeltaWrite.deleteWhere(spark, root, "id % 10 = 1") // hits every file
    DeltaWrite.deleteWhere(spark, root, "id % 10 = 2") // merges each DV
    assert(DeltaRead.snapshot(spark, root).count() === 64L)
    assert(DeltaRead.snapshot(spark, root)
      .selectExpr("id").as[Long].collect().forall(i => i % 10 != 1 && i % 10 != 2))
    // plan contract: job count must NOT grow with the affected-file
    // count (positions never funnel through the driver; one distributed
    // DV write job regardless of how many files are hit)
    def jobsForFiles(nFiles: Int): Int = {
      val r = build(nFiles)
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        DeltaWrite.deleteWhere(spark, r, "id % 10 = 3", emitCdc = true)
        Thread.sleep(1000) // listener bus drain
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val small = jobsForFiles(2)
    val large = jobsForFiles(16)
    assert(large <= small + 2,
      s"jobs grew $small -> $large from 2 to 16 affected files — the DV " +
        "delete must not loop per file or collect positions per file")
  }

  test("purgeDeletionVectors: identical snapshot, optimize unblocked, vacuum reclaims bitmaps") {
    val root = tmp()
    DeltaWrite.create(
      (1L to 100L).map(i => (i, s"i$i")).toDF("id", "item").repartition(4),
      root, Nil)                                          // v0: 4 files
    DeltaWrite.deleteWhere(spark, root, "id % 5 = 0")     // v1: DV on each
    val before = DeltaRead.snapshot(spark, root)
      .selectExpr("id").as[Long].collect().toSeq.sorted
    assert(before.size === 80)
    // optimize is gated while DVs are live
    intercept[IllegalArgumentException] { DeltaWrite.optimize(spark, root) }
    DeltaWrite.purgeDeletionVectors(spark, root, filesPerPartition = 4) // v2
    assert(DeltaRead.tableState(spark, root, 2L).live.forall(_.dv.isEmpty),
      "purge must leave no live deletion vector")
    val after = DeltaRead.snapshot(spark, root)
      .selectExpr("id").as[Long].collect().toSeq.sorted
    assert(after === before, "purge must not change the snapshot")
    // dataChange=false: CDF sees NOTHING for the purge version
    assert(DeltaRead.changes(spark, root, 2L, 2L).count() === 0L,
      "a purge commit must be invisible to the change feed")
    // time travel below the purge still applies the DVs
    assert(DeltaRead.snapshot(spark, root, Some(1L))
      .selectExpr("id").as[Long].collect().toSeq.sorted === before)
    // the no-DV gate now passes
    DeltaWrite.optimize(spark, root, zorderBy = Seq("id")) // v3
    // vacuum reclaims superseded data files AND the orphaned DV bitmaps
    assert(DeltaWrite.vacuumData(spark, root, retainVersions = 1) > 0)
    val binsLeft = Files.walk(Paths.get(root)).toArray.map(_.toString)
      .filter(_.endsWith(".bin"))
    assert(binsLeft.isEmpty, "purged DV bitmap files must be vacuumable")
    assert(DeltaRead.snapshot(spark, root)
      .selectExpr("id").as[Long].collect().toSeq.sorted === before)
    // purge with nothing to do is refused loudly
    intercept[IllegalArgumentException] {
      DeltaWrite.purgeDeletionVectors(spark, root)
    }
  }

  test("shallow clone: zero-copy branch; clone mutations never touch the source") {
    val src = tmp()
    DeltaWrite.create((1L to 10L).map(i => (i, s"i$i")).toDF("id", "item"),
      src, Nil)
    DeltaWrite.deleteWhere(spark, src, "id <= 2") // source carries DVs
    val dst = tmp()
    DeltaWrite.shallowClone(spark, src, dst)
    // zero-copy: the clone directory holds NO parquet
    val cloneFiles = Files.walk(Paths.get(dst)).toArray.map(_.toString)
    assert(!cloneFiles.exists(_.endsWith(".parquet")),
      "shallow clone must not copy data files")
    def ids(t: String): Seq[Long] = DeltaRead.snapshot(spark, t)
      .selectExpr("id").as[Long].collect().toSeq.sorted
    assert(ids(dst) === (3L to 10L), "clone reads the source's state incl. DVs")
    // diverge the clone: the source must not move
    DeltaWrite.append(Seq((99L, "new")).toDF("id", "item"), dst)
    DeltaWrite.deleteWhere(spark, dst, "id = 5")
    assert(ids(dst) === ((3L to 10L).filterNot(_ == 5L) :+ 99L).sorted)
    assert(ids(src) === (3L to 10L), "clone writes leaked into the source")
    // clone of an EARLIER version
    val dst0 = tmp()
    DeltaWrite.shallowClone(spark, src, dst0, versionAsOf = Some(0L))
    assert(ids(dst0) === (1L to 10L))
  }

  test("restore rewinds the live set (incl. DV state); history preserved") {
    val root = tmp()
    DeltaWrite.create((1L to 20L).map(i => (i, s"i$i")).toDF("id", "item"),
      root, Nil)                                        // v0
    DeltaWrite.deleteWhere(spark, root, "id <= 5")      // v1 (DV)
    DeltaWrite.append(Seq((99L, "new")).toDF("id", "item"), root) // v2
    assert(DeltaRead.snapshot(spark, root).count() === 16L)
    DeltaWrite.restore(spark, root, 0L)                 // v3 == v0 state
    val ids = DeltaRead.snapshot(spark, root)
      .selectExpr("id").as[Long].collect().toSeq.sorted
    assert(ids === (1L to 20L), "restore must undo the DV delete AND the append")
    // history preserved: v2's state still time-travels
    assert(DeltaRead.snapshot(spark, root, Some(2L)).count() === 16L)
    // a restore to the same state is refused as a no-op
    intercept[IllegalArgumentException] {
      DeltaWrite.restore(spark, root, 0L)
    }
    // and restore is itself reversible: back to v2's state
    DeltaWrite.restore(spark, root, 2L)
    assert(DeltaRead.snapshot(spark, root).count() === 16L)
  }

  test("column mapping: rename is metadata-only; old files read under the new name") {
    val root = tmp()
    DeltaWrite.create(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"), root, Nil)
    DeltaWrite.enableColumnMapping(spark, root)
    val dataFilesBefore = Files.walk(Paths.get(root)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    DeltaWrite.renameColumn(spark, root, "price", "total_price")
    val dataFilesAfter = Files.walk(Paths.get(root)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(dataFilesAfter === dataFilesBefore, "rename must not touch data files")
    val rows = DeltaRead.snapshot(spark, root)
      .selectExpr("id", "total_price").as[(Long, Double)]
      .collect().toSeq.sorted
    assert(rows === Seq((1L, 10.0), (2L, 20.0)),
      "physicalName must keep resolving the pre-rename files")
    // old LOGICAL name is gone
    assert(!DeltaRead.snapshot(spark, root).columns.contains("price"))
    // renames stack
    DeltaWrite.renameColumn(spark, root, "total_price", "p2")
    assert(DeltaRead.snapshot(spark, root).columns.toSeq === Seq("id", "p2"))
    // guards: double-enable, unknown/conflicting names, mapped-table writes
    intercept[IllegalArgumentException] {
      DeltaWrite.enableColumnMapping(spark, root)
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.renameColumn(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.renameColumn(spark, root, "p2", "id")
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.merge(Seq((3L, 1.0)).toDF("id", "p2"),
        Seq.empty[Long].toDF("id"), root, Seq("id"), "m", 1L)
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.deleteWhere(spark, root, "id = 1")
    }
  }

  test("partition values with spaces percent-encode per the protocol") {
    val root = tmp()
    val df = Seq((1L, "4-NOT SPECIFIED"), (2L, "1-URGENT"))
      .toDF("id", "prio")
    DeltaWrite.create(df, root, Seq("prio"))
    // the log's add.path must be URI-parseable (encoded), and the read
    // must resolve it back to the on-disk file
    val logLines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"${0L}%020d.json"))
    val addLines = logLines.toArray.map(_.toString).filter(_.contains("\"add\""))
    assert(addLines.exists(_.contains("4-NOT%20SPECIFIED")),
      s"space not percent-encoded in add.path: ${addLines.mkString("\n")}")
    val rows = DeltaRead.snapshot(spark, root)
      .select("id", "prio").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "4-NOT SPECIFIED"), (2L, "1-URGENT")))
  }
}
