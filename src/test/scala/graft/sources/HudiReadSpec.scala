package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** [[HudiRead]] against a hand-built REAL Hudi COW layout: `.hoodie/`
  * timeline instants, `<fileId>_<writeToken>_<instant>.parquet` base
  * files with `_hoodie_*` meta columns, an inflight instant that must be
  * invisible, a COW update rewriting one file group, a clustering
  * replacecommit, and partition directories. */
class HudiReadSpec extends SparkSuite {

  import spark.implicits._

  private val T1 = "20240101090000000"
  private val T2 = "20240102090000000"
  private val T3 = "20240103090000000" // inflight — invisible
  private val T4 = "20240104090000000" // replacecommit (clustering)

  /** Write rows as one Hudi base parquet file. */
  private def baseFile(dir: Path, fileId: String, instant: String,
                       rows: Seq[(String, Long, String)]): Unit = {
    val df = rows.toDF("_hoodie_record_key", "id", "item")
      .withColumn("_hoodie_commit_time",
        org.apache.spark.sql.functions.lit(instant))
    val tmp = Files.createTempDirectory("hudi-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(dir)
    Files.copy(part, dir.resolve(s"${fileId}_0-1-2_$instant.parquet"))
  }

  /** Build the fixture table; returns its path. */
  private def buildTable(withReplace: Boolean = false): String = {
    val root = Files.createTempDirectory("hudi-table")
    val hoodie = root.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.writeString(hoodie.resolve("hoodie.properties"),
      "hoodie.table.name=fixture\nhoodie.table.type=COPY_ON_WRITE\n")
    // t1: fileId A (2 rows) + fileId B (1 row), partition dt=2024-01-01
    val p1 = root.resolve("dt=2024-01-01")
    baseFile(p1, "fgA", T1, Seq(("k1", 1L, "widget"), ("k2", 2L, "bolt")))
    baseFile(p1, "fgB", T1, Seq(("k3", 3L, "nut")))
    Files.writeString(hoodie.resolve(s"$T1.commit"), "{}")
    // t2: COW update of k1 — file group A rewritten WHOLE (k2 carried over
    // with its ORIGINAL commit time, k1 stamped with t2)
    val df2 = Seq(("k1", 1L, "gadget", T2), ("k2", 2L, "bolt", T1))
      .toDF("_hoodie_record_key", "id", "item", "_hoodie_commit_time")
    val tmp2 = Files.createTempDirectory("hudi-part2")
    df2.coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = Files.list(tmp2).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part2, p1.resolve(s"fgA_0-1-2_$T2.parquet"))
    Files.writeString(hoodie.resolve(s"$T2.commit"), "{}")
    // t3: an INFLIGHT commit with a data file already on disk — must be
    // invisible to every read (Hudi's read isolation)
    baseFile(p1, "fgC", T3, Seq(("k9", 9L, "ghost")))
    Files.writeString(hoodie.resolve(s"$T3.commit.inflight"), "")
    if (withReplace) {
      // t4: clustering rewrote group B into group D and replaced B
      baseFile(p1, "fgD", T4, Seq(("k3", 3L, "nut")))
      Files.writeString(hoodie.resolve(s"$T4.replacecommit"),
        s"""{"partitionToReplaceFileIds": {"dt=2024-01-01": ["fgB"]}}""")
    }
    root.toString
  }

  test("snapshot reads the newest file slice per group; inflight invisible") {
    val table = buildTable()
    assert(HudiRead.completedInstants(spark, table) === Seq(T1, T2))
    val rows = HudiRead.snapshot(spark, table)
      .select("_hoodie_record_key", "item", "_hoodie_commit_time")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(("k1", "gadget", T2), ("k2", "bolt", T1),
      ("k3", "nut", T1))) // no k9: its commit is inflight
  }

  test("time travel at t1 sees pre-update values") {
    val table = buildTable()
    val rows = HudiRead.snapshot(spark, table, asOf = Some(T1))
      .select("_hoodie_record_key", "item")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(("k1", "widget"), ("k2", "bolt"), ("k3", "nut")))
  }

  test("incremental pull returns changed rows only, not COW carry-overs") {
    val table = buildTable()
    val rows = HudiRead.incremental(spark, table, beginInstant = T1)
      .select("_hoodie_record_key", "item")
      .as[(String, String)].collect().toSeq
    assert(rows === Seq(("k1", "gadget"))) // k2 was copied, not changed
    // empty range
    assert(HudiRead.incremental(spark, table, beginInstant = T2).count() === 0)
  }

  test("replacecommit clustering hides the replaced file group") {
    val table = buildTable(withReplace = true)
    val rows = HudiRead.snapshot(spark, table)
      .select("_hoodie_record_key", "item")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    // k3 appears ONCE (from fgD), never doubled via the replaced fgB
    assert(rows === Seq(("k1", "gadget"), ("k2", "bolt"), ("k3", "nut")))
    // time travel BEFORE the clustering still reads fgB
    val pre = HudiRead.snapshot(spark, table, asOf = Some(T2))
      .select("_hoodie_record_key").as[String].collect().sorted.toSeq
    assert(pre === Seq("k1", "k2", "k3"))
  }

  test("filters and pruning reach the parquet scan through the slice resolution") {
    val table = buildTable()
    val df = HudiRead.snapshot(spark, table)
      .where($"id" >= 2L).select("id", "item")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,2)]"),
      "filter did not reach the parquet scan:\n" + plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,item:string>"),
      "column pruning lost — meta columns still read:\n" + plan)
    assert(df.count() === 2L)
  }

  test("hive-style partition dirs become typed partition columns; files prune") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = Files.createTempDirectory("hudi-part-prune")
    val hoodie = root.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.writeString(hoodie.resolve("hoodie.properties"),
      "hoodie.table.name=pruned\nhoodie.table.type=COPY_ON_WRITE\n")
    baseFile(root.resolve("dt=2024-01-01"), "fgA", T1, Seq(("k1", 1L, "widget")))
    baseFile(root.resolve("dt=2024-01-02"), "fgB", T1, Seq(("k2", 2L, "bolt")))
    baseFile(root.resolve("dt=2024-01-03"), "fgC", T1, Seq(("k3", 3L, "nut")))
    Files.writeString(hoodie.resolve(s"$T1.commit"), "{}")

    val df = HudiRead.snapshot(spark, root.toString)
    // dt surfaces as a column sourced from the DIRECTORY names
    assert(df.columns.contains("dt"))
    assert(df.selectExpr("id", "dt").as[(Long, String)].collect().toSeq.sorted
      === Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03")))

    val pruned = df.where($"dt" === "2024-01-02")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(pruned.selectExpr("id").as[Long].collect().toSeq === Seq(2L))
    assert(scan.partitionFilters.nonEmpty,
      "dt predicate was not recognized as a partition filter")
    val listed = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).flatMap(_.files)
    assert(listed.size === 1,
      s"partition filter did not prune files at planning time (${listed.size}/3)")
  }

  test("mixed-width instants (14-digit vintage + 17-digit) order as timestamps") {
    // a table migrated across Hudi instant-format generations: the first
    // commit is 14-digit (yyyyMMddHHmmss), the later rewrite 17-digit
    // with millis. LEFT/numeric padding would rank the 17-digit instant
    // above ANY 14-digit one regardless of time — the padded timeline
    // key must order them chronologically instead.
    val old14 = "20240105090000"       // Jan 5 — NEWER time, old format
    val new17 = "20240101090000123"    // Jan 1 — older time, new format
    val root = Files.createTempDirectory("hudi-mixed")
    val hoodie = root.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.writeString(hoodie.resolve("hoodie.properties"),
      "hoodie.table.name=fixture\nhoodie.table.type=COPY_ON_WRITE\n")
    val p = root.resolve("part=0")
    // group written at Jan 1 (17-digit), rewritten at Jan 5 (14-digit)
    baseFile(p, "fgA", new17, Seq(("k1", 1L, "old")))
    Files.writeString(hoodie.resolve(s"$new17.commit"), "{}")
    val df2 = Seq(("k1", 1L, "new", old14))
      .toDF("_hoodie_record_key", "id", "item", "_hoodie_commit_time")
    val tmp2 = Files.createTempDirectory("hudi-mixed2")
    df2.coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = Files.list(tmp2).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part2, p.resolve(s"fgA_0-1-2_$old14.parquet"))
    Files.writeString(hoodie.resolve(s"$old14.commit"), "{}")
    // ordering helpers agree the 14-digit Jan 5 instant is the tip
    assert(HudiRead.instantKey(old14) > HudiRead.instantKey(new17))
    assert(HudiRead.completedInstants(spark, root.toString).last === old14)
    // the snapshot resolves the Jan 5 rewrite as the visible slice
    val snap = HudiRead.snapshot(spark, root.toString)
      .selectExpr("id", "item").as[(Long, String)].collect().toSeq
    assert(snap === Seq((1L, "new")))
    // incremental after Jan 1 sees exactly the Jan 5 rewrite's rows
    val inc = HudiRead.incremental(spark, root.toString, new17)
      .selectExpr("item").as[String].collect().toSeq
    assert(inc === Seq("new"))
    // and X vs X000 stays a STRICT order (no padded-key collision)
    assert(HudiRead.instantKey("20240101090000") !=
      HudiRead.instantKey("20240101090000000"))
  }

  test("a non-Hudi directory fails with an actionable message") {
    val plain = Files.createTempDirectory("not-hudi").toString
    val e = intercept[IllegalArgumentException](
      HudiRead.snapshot(spark, plain))
    assert(e.getMessage.contains("not a Hudi table"))
  }

  // ======================================================================
  // merge-on-read
  // ======================================================================

  private val MorAvroSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"fixture","fields":[
      |{"name":"_hoodie_record_key","type":"string"},
      |{"name":"_hoodie_commit_time","type":"string"},
      |{"name":"id","type":"long"},
      |{"name":"item","type":"string"},
      |{"name":"_hoodie_is_deleted","type":"boolean","default":false}
      |]}""".stripMargin)

  private def avroRec(key: String, commit: String, id: Long, item: String,
                      deleted: Boolean = false): org.apache.avro.generic.GenericRecord =
    new org.apache.avro.generic.GenericRecordBuilder(MorAvroSchema)
      .set("_hoodie_record_key", key).set("_hoodie_commit_time", commit)
      .set("id", id).set("item", item).set("_hoodie_is_deleted", deleted)
      .build()

  private def writeLog(dir: Path, fileId: String, baseInstant: String,
                       version: Int, blocks: Seq[HudiLogFormat.LogBlock]): Unit = {
    Files.createDirectories(dir)
    val f = dir.resolve(s".${fileId}_$baseInstant.log.${version}_0-1-2")
    val out = new java.io.DataOutputStream(Files.newOutputStream(f))
    try blocks.foreach(HudiLogFormat.writeBlock(out, _)) finally out.close()
  }

  /** MOR base file carrying the full MOR schema (incl. the delete flag). */
  private def morBase(dir: Path, fileId: String, instant: String,
                      rows: Seq[(String, String, Long, String)]): Unit = {
    val df = rows.toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item")
      .withColumn("_hoodie_is_deleted", org.apache.spark.sql.functions.lit(false))
    val tmp = Files.createTempDirectory("hudi-mor-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(dir)
    Files.copy(part, dir.resolve(s"${fileId}_0-1-2_$instant.parquet"))
  }

  /** MOR fixture: base at T1, delta log at T2 (update k1, delete k2,
    * insert k4), an INFLIGHT delta at T3 whose log block must be
    * invisible, plus a log-only file group landed at T2. */
  private def buildMorTable(): Path = {
    val root = Files.createTempDirectory("hudi-mor-table")
    val hoodie = root.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.writeString(hoodie.resolve("hoodie.properties"),
      "hoodie.table.name=fixture\nhoodie.table.type=MERGE_ON_READ\n")
    val p1 = root.resolve("dt=2024-01-01")
    morBase(p1, "fgA", T1, Seq(("k1", T1, 1L, "widget"), ("k2", T1, 2L, "bolt")))
    Files.writeString(hoodie.resolve(s"$T1.commit"), "{}")
    // T2 delta commit: one log file on fgA, one log-only group fgN
    writeLog(p1, "fgA", T1, 1, Seq(HudiLogFormat.avroDataBlock(T2, MorAvroSchema,
      Seq(avroRec("k1", T2, 1L, "gadget"),
        avroRec("k2", T2, 2L, "bolt", deleted = true),
        avroRec("k4", T2, 4L, "gear")))))
    writeLog(p1, "fgN", T2, 1, Seq(HudiLogFormat.avroDataBlock(T2, MorAvroSchema,
      Seq(avroRec("k7", T2, 7L, "cam")))))
    Files.writeString(hoodie.resolve(s"$T2.deltacommit"), "{}")
    // T3: INFLIGHT delta commit — its log block exists but must be invisible
    writeLog(p1, "fgA", T1, 2, Seq(HudiLogFormat.avroDataBlock(T3, MorAvroSchema,
      Seq(avroRec("k1", T3, 1L, "phantom")))))
    Files.writeString(hoodie.resolve(s"$T3.deltacommit.inflight"), "")
    root
  }

  private def morRows(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String)] =
    df.select("_hoodie_record_key", "item", "_hoodie_commit_time")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq

  test("MOR snapshot merges visible log records over the base " +
       "(update, delete, insert, log-only group; inflight invisible)") {
    val t = buildMorTable()
    assert(morRows(HudiRead.snapshot(spark, t.toString)) === Seq(
      ("k1", "gadget", T2),  // updated by the T2 log, NOT the inflight T3
      ("k4", "gear", T2),    // inserted via log
      ("k7", "cam", T2)))    // log-only file group, no base yet
      // k2 deleted via _hoodie_is_deleted
  }

  test("MOR time travel to the base instant ignores later logs") {
    val t = buildMorTable()
    assert(morRows(HudiRead.snapshot(spark, t.toString, asOf = Some(T1))) === Seq(
      ("k1", "widget", T1), ("k2", "bolt", T1)))
  }

  test("MOR incremental pull returns log-committed rows only") {
    val t = buildMorTable()
    assert(morRows(HudiRead.incremental(spark, t.toString, beginInstant = T1))
      === Seq(("k1", "gadget", T2), ("k4", "gear", T2), ("k7", "cam", T2)))
  }

  test("post-compaction snapshot equals the pre-compaction merged view") {
    val t = buildMorTable()
    val before = morRows(HudiRead.snapshot(spark, t.toString))
    // compaction: fold fgA's merged rows into a new base at T4, fgN's into
    // its own base; logs (baseInstant < T4) stop applying
    val p1 = t.resolve("dt=2024-01-01")
    morBase(p1, "fgA", T4, Seq(("k1", T2, 1L, "gadget"), ("k4", T2, 4L, "gear")))
    morBase(p1, "fgN", T4, Seq(("k7", T2, 7L, "cam")))
    Files.writeString(t.resolve(".hoodie").resolve(s"$T4.commit"), "{}")
    val after = HudiRead.snapshot(spark, t.toString)
    assert(morRows(after) === before,
      "compaction changed the snapshot contents")
    // and the compacted read is a pure parquet scan (no log merge)
    assert(after.queryExecution.executedPlan.toString.contains("FileScan parquet"))
  }

  test("rollback command blocks hide the rolled-back instant's records") {
    val t = buildMorTable()
    // a later log file rolls back T2 on fgA (Hudi writes the command
    // block when a failed delta commit is rolled back)
    val p1 = t.resolve("dt=2024-01-01")
    writeLog(p1, "fgA", T1, 3, Seq(HudiLogFormat.LogBlock(
      HudiLogFormat.TypeCommand,
      Map(HudiLogFormat.HeaderInstantTime -> T4,
        HudiLogFormat.HeaderTargetInstantTime -> T2,
        HudiLogFormat.HeaderCommandBlockType -> "0"), Array.emptyByteArray)))
    val rows = morRows(HudiRead.snapshot(spark, t.toString))
    // fgA's T2 block is void → base rows only; fgN's T2 block (separate
    // file group, not rolled back by this log stream) still applies
    assert(rows === Seq(("k1", "widget", T1), ("k2", "bolt", T1),
      ("k7", "cam", T2)))
  }

  test("delete block payload: Kryo HoodieKey[] round-trips under the Hudi wire name") {
    val block = HudiLogFormat.deleteBlock(T2,
      Seq(("k1", "dt=2024-01-01"), ("k2", "")))
    // the wire carries the HUDI class name (what 0.9 writers emit and
    // expect), never the local shim's
    val wire = new String(block.content,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(wire.contains("org.apache.hudi.common.model.HoodieKe"),
      "payload must carry the Hudi class name on the wire")
    assert(!wire.contains("graft"), "local shim name leaked onto the wire")
    assert(HudiLogFormat.deleteKeys(block) ===
      Seq(("k1", "dt=2024-01-01"), ("k2", "")))
  }

  test("DELETE log blocks (0.9 Kryo payload) drop keys; later re-insert wins") {
    val t = buildMorTable() // post-T2: k1 gadget, k4 gear, k7 cam
    val p1 = t.resolve("dt=2024-01-01")
    val T5 = "20240105090000000"
    val T6 = "20240106090000000"
    // T5 delta commit: hard-delete k1 and k4 via a delete block (k9 never
    // existed — deleting an absent key is a no-op, like Hudi)
    writeLog(p1, "fgA", T1, 3, Seq(HudiLogFormat.deleteBlock(T5,
      Seq(("k1", "dt=2024-01-01"), ("k4", "dt=2024-01-01"),
        ("k9", "dt=2024-01-01")))))
    Files.writeString(t.resolve(".hoodie").resolve(s"$T5.deltacommit"), "{}")
    assert(morRows(HudiRead.snapshot(spark, t.toString)) ===
      Seq(("k7", "cam", T2)))
    // time travel BEFORE the delete still sees the full merged view
    assert(morRows(HudiRead.snapshot(spark, t.toString, asOf = Some(T2)))
      .map(_._1) === Seq("k1", "k4", "k7"))
    // T6: re-insert k1 — the later record must win over the tombstone
    writeLog(p1, "fgA", T1, 4, Seq(HudiLogFormat.avroDataBlock(T6, MorAvroSchema,
      Seq(avroRec("k1", T6, 1L, "reborn")))))
    Files.writeString(t.resolve(".hoodie").resolve(s"$T6.deltacommit"), "{}")
    assert(morRows(HudiRead.snapshot(spark, t.toString)) ===
      Seq(("k1", "reborn", T6), ("k7", "cam", T2)))
  }

  test("a NON-0.9 delete block payload fails loudly, never resurrects rows") {
    val t = buildMorTable()
    val p1 = t.resolve("dt=2024-01-01")
    // truncated content (version int only) — not the 0.9 layout
    writeLog(p1, "fgA", T1, 3, Seq(HudiLogFormat.LogBlock(
      HudiLogFormat.TypeDelete,
      Map(HudiLogFormat.HeaderInstantTime -> T2), Array[Byte](0, 0, 0, 2))))
    val e = intercept[org.apache.spark.SparkException](
      HudiRead.snapshot(spark, t.toString).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).toSeq
    assert(msgs.exists(m => m.contains("delete block") ||
      m.contains("implausible delete block")), msgs.mkString(" | "))
  }

  test("latest-wins ordering across MULTIPLE log files and instants") {
    val t = buildMorTable() // fgA: T2 log sets k1 → "gadget"
    val p1 = t.resolve("dt=2024-01-01")
    // a FURTHER log file (version 3 — version 2 is the fixture's inflight
    // T3 stream) with a later delta commit T4 updates k1 again — the T4
    // record must win over T2's even though both live in the same file
    // group's log stream
    writeLog(p1, "fgA", T1, 3, Seq(HudiLogFormat.avroDataBlock(T4, MorAvroSchema,
      Seq(avroRec("k1", T4, 1L, "final")))))
    Files.writeString(t.resolve(".hoodie").resolve(s"$T4.deltacommit"), "{}")
    val rows = morRows(HudiRead.snapshot(spark, t.toString))
    assert(rows === Seq(("k1", "final", T4), ("k4", "gear", T2),
      ("k7", "cam", T2)))
    // time travel between the two delta commits sees the T2 state
    assert(morRows(HudiRead.snapshot(spark, t.toString, asOf = Some(T2)))
      .filter(_._1 == "k1") === Seq(("k1", "gadget", T2)))
  }

  test("plan contract: MOR merge broadcasts the (small) log side — the " +
       "base scan never shuffles") {
    val t = buildMorTable()
    val df = HudiRead.snapshot(spark, t.toString)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "MOR anti-join did not broadcast the log side:\n" + plan)
    assert(!plan.contains("SortMergeJoin"),
      "MOR merge shuffled the base on record key despite a small log side:\n" + plan)
  }

  test("log format round-trips blocks byte-faithfully, tolerates a torn tail") {
    val block = HudiLogFormat.avroDataBlock(T2, MorAvroSchema,
      Seq(avroRec("k1", T2, 1L, "a"), avroRec("k2", T2, 2L, "b")))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    HudiLogFormat.writeBlock(out, block)
    HudiLogFormat.writeBlock(out, HudiLogFormat.LogBlock(
      HudiLogFormat.TypeCommand,
      Map(HudiLogFormat.HeaderInstantTime -> T3,
        HudiLogFormat.HeaderTargetInstantTime -> T2), Array.emptyByteArray))
    val full = bos.toByteArray
    val blocks = HudiLogFormat.readBlocks(new java.io.ByteArrayInputStream(full))
    assert(blocks.size === 2)
    assert(blocks(0).blockType === HudiLogFormat.TypeAvroData)
    val recs = HudiLogFormat.avroRecords(blocks(0))
    assert(recs.map(_.get("item").toString) === Seq("a", "b"))
    assert(blocks(1).header(HudiLogFormat.HeaderTargetInstantTime) === T2)
    // a torn trailing block (writer died mid-append) terminates silently
    val torn = full ++ HudiLogFormat.Magic ++ Array[Byte](0, 0, 0)
    assert(HudiLogFormat.readBlocks(
      new java.io.ByteArrayInputStream(torn)).size === 2)
    // rollbacks void the targeted instant
    assert(HudiLogFormat.effectiveBlocks(blocks).isEmpty)
  }

  // ---- listing-free discovery from commit metadata --------------------

  test("commit metadata names the same file set the listing finds (COW + MOR)") {
    import graft.sink.{HudiCowWrite, HudiMorWrite}
    def sets(table: String): (Set[(String, String)], Set[(String, String)]) = {
      val meta = HudiRead.filesFromCommitMetadata(spark, table)
      assert(meta.isDefined, s"graft-written table $table should be metadata-discoverable")
      (meta.get.map(f => (f.rel, f.name)).toSet,
        ParallelListing.listFiles(spark, table, _ == ".hoodie", 100000)
          .map(f => (f.rel, f.name)).toSet)
    }
    // COW: seed + upsert (old AND new bases must both be named)
    val cow = Files.createTempDirectory("hudi-meta-cow").toString
    HudiCowWrite.upsert((1L to 40L).map(i => (i, s"v$i")).toDF("id", "item"),
      cow, "id", T1)
    HudiCowWrite.upsert((20L to 60L).map(i => (i, s"u$i")).toDF("id", "item"),
      cow, "id", T2)
    val (cowMeta, cowListed) = sets(cow)
    assert(cowMeta === cowListed, "COW metadata view drifted from the listing")
    // MOR: base + distributed log appends across partitions
    val mor = Files.createTempDirectory("hudi-meta-mor").toString
    val rows = spark.range(0, 40L)
      .selectExpr("CAST(id AS STRING) AS _hoodie_record_key",
        s"'$T1' AS _hoodie_commit_time", "false AS _hoodie_is_deleted",
        "id", "concat('part=', CAST(id % 4 AS STRING)) AS __part")
    assert(HudiMorWrite.appendLogDistributed(rows, mor, "__part", T1))
    assert(HudiMorWrite.appendLogDistributed(
      rows.withColumn("_hoodie_commit_time",
        org.apache.spark.sql.functions.lit(T2)), mor, "__part", T2))
    val (morMeta, morListed) = sets(mor)
    assert(morMeta === morListed, "MOR metadata view drifted from the listing")
    // a graft CLEAN records its deletions: the metadata path SURVIVES it
    // (deleted slices subtracted) and stays equivalent to the listing
    val removed = graft.sink.HudiClean.clean(spark, cow, T3)
    assert(removed > 0, "the upsert left old slices for the clean to take")
    val (cowMeta2, cowListed2) = sets(cow)
    assert(cowMeta2 === cowListed2,
      "post-clean metadata view drifted from the listing")
    assert(HudiRead.snapshot(spark, cow).count() === 60L)
    // a foreign "{}" commit on the timeline forces the listing fallback
    Files.writeString(Paths.get(cow, ".hoodie", s"$T4.commit"), "{}")
    assert(HudiRead.filesFromCommitMetadata(spark, cow).isEmpty,
      "a stats-less commit must disable the metadata path")
    assert(HudiRead.snapshot(spark, cow).count() === 60L, "fallback still reads")
    // ...and a clean marker WITHOUT deletedPaths (legacy/foreign) does too
    val mor2 = Files.createTempDirectory("hudi-meta-legacy-clean").toString
    Files.createDirectories(Paths.get(mor2, ".hoodie"))
    graft.sink.HudiCowWrite.upsert(
      (1L to 5L).map(i => (i, s"v$i")).toDF("id", "item"), mor2, "id", T1)
    Files.writeString(Paths.get(mor2, ".hoodie", s"$T2.clean"),
      """{"minSafeCeiling":null}""")
    assert(HudiRead.filesFromCommitMetadata(spark, mor2).isEmpty,
      "a clean without recorded deletions must disable the metadata path")
  }

  test("chunked MOR appends: many same-instant blocks per log file merge correctly") {
    import graft.sink.HudiMorWrite
    val root = Files.createTempDirectory("hudi-multiblock").toString
    def rows(instant: String, range: (Long, Long), mul: Long) =
      spark.range(range._1, range._2)
        .selectExpr("CAST(id AS STRING) AS _hoodie_record_key",
          s"'$instant' AS _hoodie_commit_time", "false AS _hoodie_is_deleted",
          s"id * $mul AS v", "'part=0' AS __part")
    // maxBlockRecords=4 over 25 rows: the stream cuts ceil(25/4)=7 blocks
    // into ONE log file — task memory is a block, never the batch
    assert(HudiMorWrite.appendLogDistributed(rows(T1, (0L, 25L), 1L),
      root, "__part", T1, maxBlockRecords = 4))
    val logFile = Files.list(Paths.get(root, "part=0")).toArray
      .map(_.toString)
      .find(p => p.contains(".log.") && !p.endsWith(".crc")).get
    val in = new org.apache.hadoop.fs.Path(logFile)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .open(new org.apache.hadoop.fs.Path(logFile))
    val blocks = try HudiLogFormat.readBlocks(in) finally in.close()
    assert(blocks.length === 7, s"expected 7 chunked blocks, got ${blocks.length}")
    assert(HudiRead.snapshot(spark, root).count() === 25L)
    // latest-wins still holds ACROSS chunked deltas: rewrite 10 keys
    assert(HudiMorWrite.appendLogDistributed(rows(T2, (5L, 15L), 100L),
      root, "__part", T2, maxBlockRecords = 3))
    val got = HudiRead.snapshot(spark, root)
      .selectExpr("CAST(_hoodie_record_key AS LONG) AS k", "v")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 25)
    assert(got(7L) === 700L && got(3L) === 3L && got(20L) === 20L)
  }

  test("snapshot reads do ZERO data-directory listings on a metadata-discoverable table") {
    import graft.sink.HudiCowWrite
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.countfs.impl", classOf[CountingLocalFs].getName)
    val local = Files.createTempDirectory("hudi-meta-zerolist").toString
    val root = s"countfs://$local"
    HudiCowWrite.upsert((1L to 30L).map(i => (i, s"v$i")).toDF("id", "item"),
      root, "id", T1)
    HudiCowWrite.upsert((10L to 45L).map(i => (i, s"u$i")).toDF("id", "item"),
      root, "id", T2)
    CountingLocalFs.reset()
    val n = HudiRead.snapshot(spark, root).count()
    assert(n === 45L)
    val dataDirListings = CountingLocalFs.listedDirs.asScala.toSeq
      .filter(p => p.startsWith(local) && !p.contains("/.hoodie"))
    assert(dataDirListings.isEmpty,
      s"snapshot listed data directories: $dataDirListings")
    // the SAME read on a listing-fallback table (stats-less commit) does
    // list — proving the counter actually observes the fallback path
    Files.writeString(Paths.get(local, ".hoodie", s"$T4.commit"), "{}")
    CountingLocalFs.reset()
    assert(HudiRead.snapshot(spark, root).count() === 45L)
    assert(CountingLocalFs.listedDirs.asScala.toSeq
      .exists(p => p.startsWith(local) && !p.contains("/.hoodie")),
      "fallback read should have listed data dirs (counter is live)")
  }
}

/** [[org.apache.hadoop.fs.RawLocalFileSystem]] under the `countfs://`
  * scheme, recording every DIRECTORY listStatus — the instrument behind
  * the listing-free-discovery contract. */
class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("countfs:///")
  override def getScheme: String = "countfs"
  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    val isDir = try getFileStatus(f).isDirectory
                catch { case _: java.io.IOException => false }
    if (isDir) CountingLocalFs.listedDirs.add(f.toUri.getPath): Unit
    super.listStatus(f)
  }
}

object CountingLocalFs {
  val listedDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = listedDirs.clear()
}

