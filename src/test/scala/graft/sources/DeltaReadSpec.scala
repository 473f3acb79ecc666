package graft.sources

import java.nio.file.{Files, Path}

import graft.SparkSuite

/** [[DeltaRead]] against a hand-built `_delta_log`: add/remove replay,
  * partition-value reconstruction, time travel, and the protocol gate. */
class DeltaReadSpec extends SparkSuite {

  import spark.implicits._

  /** Writes the file and returns its TRUE size — the log must record it
    * faithfully, because the reader trusts `add.size` for parquet footer
    * location (that's what lets it build the scan with zero per-file
    * filesystem calls, like every real Delta writer/reader pair). */
  private def writeParquet(dir: Path, rel: String,
                           rows: Seq[(Long, String)]): Long = {
    val tmp = Files.createTempDirectory("delta-part")
    rows.toDF("id", "item").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val target = dir.resolve(rel)
    Files.createDirectories(target.getParent)
    Files.copy(part, target)
    Files.size(target)
  }

  private def log(dir: Path, version: Long, lines: String*): Unit = {
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"$version%020d.json"),
      lines.mkString("\n") + "\n")
  }

  private def buildTable(): Path = {
    val root = Files.createTempDirectory("delta-table")
    // v0: metadata (partitioned by dt) + two files
    val szA = writeParquet(root, "dt=2024-01-01/part-a.parquet", Seq((1L, "widget"), (2L, "bolt")))
    val szB = writeParquet(root, "dt=2024-01-02/part-b.parquet", Seq((3L, "nut")))
    log(root, 0L,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"metaData":{"id":"m1","partitionColumns":["dt"],"format":{"provider":"parquet"}}}""",
      s"""{"add":{"path":"dt=2024-01-01/part-a.parquet","partitionValues":{"dt":"2024-01-01"},"size":$szA,"modificationTime":1,"dataChange":true}}""",
      s"""{"add":{"path":"dt=2024-01-02/part-b.parquet","partitionValues":{"dt":"2024-01-02"},"size":$szB,"modificationTime":1,"dataChange":true}}""")
    // v1: rewrite part-a (update widget→gadget): remove + add
    val szC = writeParquet(root, "dt=2024-01-01/part-c.parquet", Seq((1L, "gadget"), (2L, "bolt")))
    log(root, 1L,
      """{"remove":{"path":"dt=2024-01-01/part-a.parquet","dataChange":true}}""",
      s"""{"add":{"path":"dt=2024-01-01/part-c.parquet","partitionValues":{"dt":"2024-01-01"},"size":$szC,"modificationTime":2,"dataChange":true}}""")
    root
  }

  test("snapshot replays add/remove and reconstructs partition columns") {
    val t = buildTable()
    val rows = DeltaRead.snapshot(spark, t.toString)
      .select("id", "item", "dt")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "gadget", "2024-01-01"),
      (2L, "bolt", "2024-01-01"), (3L, "nut", "2024-01-02")))
  }

  test("versionAsOf time travel sees the pre-rewrite file set") {
    val t = buildTable()
    val rows = DeltaRead.snapshot(spark, t.toString, versionAsOf = Some(0L))
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")))
    assert(DeltaRead.latestVersion(spark, t.toString) === 1L)
  }

  test("unsupported reader features fail loudly BY NAME, not silently mis-read") {
    val t = buildTable()
    log(t, 2L, """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors","variantType"]}}""")
    val e = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, t.toString))
    assert(e.getMessage.contains("variantType"))
    assert(!e.getMessage.startsWith("requirement failed: deletionVectors"),
      "supported features must not be named as the problem")
    // but time travel BEFORE the upgrade still works
    assert(DeltaRead.snapshot(spark, t.toString, versionAsOf = Some(1L))
      .count() === 3L)
    // reader version 4+ (unknown) is a loud gate
    val t2 = buildTable()
    log(t2, 2L, """{"protocol":{"minReaderVersion":4,"minWriterVersion":8}}""")
    val e2 = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, t2.toString))
    assert(e2.getMessage.contains("reader version 4"))
  }

  // ---- column mapping ----

  private val MappedSchemaString = {
    def f(name: String, phys: String, tpe: String, id: Int) =
      s"""{"name":"$name","type":"$tpe","nullable":true,"metadata":{""" +
        s""""delta.columnMapping.physicalName":"$phys","delta.columnMapping.id":$id}}"""
    (s"""{"type":"struct","fields":[${f("id", "col-aaa", "long", 1)},""" +
      s"""${f("item", "col-bbb", "string", 2)},${f("dt", "col-ddd", "string", 3)}]}""")
      .replace("\"", "\\\"")
  }

  /** `name`-mode table: parquet columns are col-aaa/col-bbb, the
    * partition column dt's partitionValues key is its PHYSICAL name. */
  private def buildMappedTable(): Path = {
    val root = Files.createTempDirectory("delta-mapped")
    val tmp = Files.createTempDirectory("delta-mapped-p")
    Seq((1L, "widget"), (2L, "bolt")).toDF("col-aaa", "col-bbb").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(root.resolve("d1"))
    Files.copy(part, root.resolve("d1/f1.parquet"))
    val sz = Files.size(root.resolve("d1/f1.parquet"))
    log(root, 0L,
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m1","partitionColumns":["dt"],"schemaString":"$MappedSchemaString","format":{"provider":"parquet"},"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"}}}""",
      s"""{"add":{"path":"d1/f1.parquet","partitionValues":{"col-ddd":"2024-06-01"},"size":$sz,"modificationTime":1,"dataChange":true}}""")
    root
  }

  test("column mapping (name mode): physical parquet names read back logical") {
    val t = buildMappedTable()
    val df = DeltaRead.snapshot(spark, t.toString)
    assert(df.schema.fieldNames.toSeq === Seq("id", "item", "dt"))
    val rows = df.selectExpr("id", "item", "dt")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "widget", "2024-06-01"), (2L, "bolt", "2024-06-01")))
  }

  test("column mapping survives checkpoint + vacuum (configuration round-trips)") {
    val t = buildMappedTable()
    graft.sink.DeltaWrite.checkpoint(spark, t.toString)
    graft.sink.DeltaWrite.vacuumLog(spark, t.toString)
    val rows = DeltaRead.snapshot(spark, t.toString)
      .selectExpr("id", "item", "dt")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "widget", "2024-06-01"), (2L, "bolt", "2024-06-01")))
  }

  test("filters push through the union + partition-literal plumbing to parquet") {
    val t = buildTable()
    val df = DeltaRead.snapshot(spark, t.toString)
      .where($"id" > 1L).select("id", "item")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      "data-column filter did not reach the parquet scans:\n" + plan)
    assert(df.count() === 2L)
  }

  test("a non-Delta directory fails with an actionable message") {
    val plain = Files.createTempDirectory("not-delta").toString
    val e = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, plain))
    assert(e.getMessage.contains("not a Delta table"))
  }

  private val SchemaString =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"item","type":"string","nullable":true,"metadata":{}},
      |{"name":"bucket","type":"integer","nullable":true,"metadata":{}},
      |{"name":"dt","type":"date","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "").replace("\"", "\\\"")

  test("partition columns come back TYPED per schemaString, in declared order") {
    val root = Files.createTempDirectory("delta-typed")
    val sz1 = writeParquet(root, "bucket=7/dt=2024-01-01/f1.parquet", Seq((1L, "widget")))
    val sz2 = writeParquet(root, "bucket=9/dt=2024-02-03/f2.parquet", Seq((2L, "bolt")))
    log(root, 0L,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m1","partitionColumns":["bucket","dt"],"schemaString":"$SchemaString","format":{"provider":"parquet"}}}""",
      s"""{"add":{"path":"bucket=7/dt=2024-01-01/f1.parquet","partitionValues":{"bucket":"7","dt":"2024-01-01"},"size":$sz1,"modificationTime":1,"dataChange":true}}""",
      s"""{"add":{"path":"bucket=9/dt=2024-02-03/f2.parquet","partitionValues":{"bucket":"9","dt":"2024-02-03"},"size":$sz2,"modificationTime":1,"dataChange":true}}""")
    val df = DeltaRead.snapshot(spark, root.toString)
    // declared column order, not data-then-partition order
    assert(df.schema.fieldNames.toSeq === Seq("id", "item", "bucket", "dt"))
    assert(df.schema("bucket").dataType === org.apache.spark.sql.types.IntegerType)
    assert(df.schema("dt").dataType === org.apache.spark.sql.types.DateType)
    val rows = df.selectExpr("id", "bucket", "cast(dt as string)")
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, 7, "2024-01-01"), (2L, 9, "2024-02-03")))
  }

  test("percent-encoded add.path is URI-decoded before resolution") {
    val root = Files.createTempDirectory("delta-enc")
    val sz = writeParquet(root, "dt=2024-01-01/part a.parquet", Seq((5L, "spaced")))
    log(root, 0L,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"metaData":{"id":"m1","partitionColumns":["dt"],"format":{"provider":"parquet"}}}""",
      s"""{"add":{"path":"dt=2024-01-01/part%20a.parquet","partitionValues":{"dt":"2024-01-01"},"size":$sz,"modificationTime":1,"dataChange":true}}""")
    val rows = DeltaRead.snapshot(spark, root.toString)
      .select("id", "item").as[(Long, String)].collect().toSeq
    assert(rows === Seq((5L, "spaced")))
  }

  test("plan contract: ONE parquet scan regardless of partition-tuple count, " +
       "and partition predicates prune FILES at planning time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = Files.createTempDirectory("delta-many")
    // one physical file, copied into 120 partition directories — the
    // partition VALUES live in the log, which is what's under test
    val sz = writeParquet(root, "dt=d000/f.parquet", Seq((1L, "x"), (2L, "y")))
    val src = root.resolve("dt=d000/f.parquet")
    val adds = (0 until 120).map { i =>
      val dtVal = f"d$i%03d"
      val rel = s"dt=$dtVal/f.parquet"
      if (i != 0) {
        Files.createDirectories(root.resolve(rel).getParent)
        Files.copy(src, root.resolve(rel))
      }
      s"""{"add":{"path":"$rel","partitionValues":{"dt":"$dtVal"},"size":$sz,"modificationTime":1,"dataChange":true}}"""
    }
    log(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"metaData":{"id":"m1","partitionColumns":["dt"],"format":{"provider":"parquet"}}}""") ++ adds: _*)
    val df = DeltaRead.snapshot(spark, root.toString)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size === 1,
      s"expected ONE scan for 120 partition tuples, got ${scans.size} — " +
      "plan size must be O(1) in partition count")
    assert(df.count() === 240L)
    assert(df.select("dt").distinct().count() === 120L)

    // partition pruning: a dt predicate must shrink the FILE list, not
    // just filter rows post-scan
    val pruned = df.where($"dt" === "d007")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(pruned.count() === 2L)
    assert(scan.partitionFilters.nonEmpty,
      "the dt predicate was not recognized as a partition filter")
    val listed = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).flatMap(_.files)
    assert(listed.size === 1,
      s"partition filter did not prune the file list at planning time " +
      s"(listed ${listed.size} of 120 files)")
  }

  private def sizeOf(root: Path, rel: String): Long = Files.size(root.resolve(rel))

  private def writeCheckpoint(root: Path, version: Long,
                              rows: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = Files.createTempDirectory("delta-cp")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val logDir = root.resolve("_delta_log")
    Files.copy(part, logDir.resolve(f"$version%020d.checkpoint.parquet"))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      s"""{"version":$version,"size":${rows.count()}}""")
  }

  test("checkpoint replay: vacuumed early JSON versions stay readable") {
    val t = buildTable() // v0 (2 adds) + v1 (remove part-a, add part-c)
    // v2: add one more file
    val szD = writeParquet(t, "dt=2024-01-03/part-d.parquet", Seq((9L, "gear")))
    log(t, 2L,
      s"""{"add":{"path":"dt=2024-01-03/part-d.parquet","partitionValues":{"dt":"2024-01-03"},"size":$szD,"modificationTime":3,"dataChange":true}}""")
    // checkpoint at v1 = state after the rewrite: part-b + part-c live
    val cp = spark.sql(s"""
      SELECT named_struct('minReaderVersion', 1, 'minWriterVersion', 2) AS protocol,
             CAST(NULL AS STRUCT<id: STRING, partitionColumns: ARRAY<STRING>,
                                 schemaString: STRING>) AS metaData,
             CAST(NULL AS STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>,
                                 size: BIGINT, modificationTime: BIGINT>) AS add
      UNION ALL
      SELECT NULL, named_struct('id', 'm1',
                                'partitionColumns', array('dt'),
                                'schemaString', CAST(NULL AS STRING)), NULL
      UNION ALL
      SELECT NULL, NULL, named_struct('path', 'dt=2024-01-02/part-b.parquet',
        'partitionValues', map('dt', '2024-01-02'), 'size', ${sizeOf(t, "dt=2024-01-02/part-b.parquet")}L, 'modificationTime', 1L)
      UNION ALL
      SELECT NULL, NULL, named_struct('path', 'dt=2024-01-01/part-c.parquet',
        'partitionValues', map('dt', '2024-01-01'), 'size', ${sizeOf(t, "dt=2024-01-01/part-c.parquet")}L, 'modificationTime', 2L)
    """)
    writeCheckpoint(t, 1L, cp)
    // vacuum the JSON the checkpoint covers
    Files.delete(t.resolve("_delta_log").resolve(f"${0L}%020d.json"))
    Files.delete(t.resolve("_delta_log").resolve(f"${1L}%020d.json"))
    val rows = DeltaRead.snapshot(spark, t.toString)
      .select("id", "item", "dt").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "gadget", "2024-01-01"), (2L, "bolt", "2024-01-01"),
      (3L, "nut", "2024-01-02"), (9L, "gear", "2024-01-03")))
    // time travel to the checkpoint version itself also works
    assert(DeltaRead.snapshot(spark, t.toString, versionAsOf = Some(1L))
      .count() === 3L)
    // but BEFORE the checkpoint is honestly unreadable, with the floor named
    val e = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, t.toString, versionAsOf = Some(0L)))
    assert(e.getMessage.contains("oldest readable"))
  }

  test("snapshotAt (timestampAsOf): commit-file mtimes pick the version") {
    val t = buildTable()
    val logDir = t.resolve("_delta_log")
    java.nio.file.Files.setLastModifiedTime(
      logDir.resolve(f"${0L}%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(10000L))
    java.nio.file.Files.setLastModifiedTime(
      logDir.resolve(f"${1L}%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(20000L))
    assert(DeltaRead.versionAtTimestamp(spark, t.toString, 15000L) === 0L)
    // v0 = pre-rewrite: widget still present
    val rows = DeltaRead.snapshotAt(spark, t.toString, 15000L)
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")))
    assert(DeltaRead.versionAtTimestamp(spark, t.toString, 99999L) === 1L)
    val e = intercept[IllegalArgumentException](
      DeltaRead.versionAtTimestamp(spark, t.toString, 5000L))
    assert(e.getMessage.contains("no Delta commit"))
  }

  // ---- v2 checkpoints ----

  /** v2-checkpoint the buildTable() state at v1 (part-b + part-c live):
    * UUID-named manifest (parquet or json) + one sidecar parquet under
    * `_sidecars/` carrying the add actions, early JSON vacuumed. */
  private def v2Checkpoint(t: Path, jsonManifest: Boolean): Unit = {
    val logDir = t.resolve("_delta_log")
    val sidecarDir = logDir.resolve("_sidecars")
    Files.createDirectories(sidecarDir)
    val sc = spark.sql(s"""
      SELECT named_struct('path', 'dt=2024-01-02/part-b.parquet',
        'partitionValues', map('dt', '2024-01-02'),
        'size', ${sizeOf(t, "dt=2024-01-02/part-b.parquet")}L, 'modificationTime', 1L) AS add
      UNION ALL
      SELECT named_struct('path', 'dt=2024-01-01/part-c.parquet',
        'partitionValues', map('dt', '2024-01-01'),
        'size', ${sizeOf(t, "dt=2024-01-01/part-c.parquet")}L, 'modificationTime', 2L)
    """)
    val tmp = Files.createTempDirectory("delta-v2sc")
    sc.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part, sidecarDir.resolve("sc-1.parquet"))
    val uuid = "3a0d65cd-4056-49b8-937b-95f9e3ee90b5"
    if (jsonManifest) {
      Files.writeString(logDir.resolve(f"${1L}%020d.checkpoint.$uuid.json"),
        Seq("""{"checkpointMetadata":{"version":1}}""",
          """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
          """{"metaData":{"id":"m1","partitionColumns":["dt"],"format":{"provider":"parquet"}}}""",
          """{"sidecar":{"path":"sc-1.parquet","sizeInBytes":1}}""")
          .mkString("", "\n", "\n"))
    } else {
      val mf = spark.sql("""
        SELECT named_struct('minReaderVersion', 3, 'minWriterVersion', 7,
                 'readerFeatures', array('v2Checkpoint'),
                 'writerFeatures', array('v2Checkpoint')) AS protocol,
               CAST(NULL AS STRUCT<id: STRING, partitionColumns: ARRAY<STRING>,
                                   schemaString: STRING>) AS metaData,
               CAST(NULL AS STRUCT<path: STRING, sizeInBytes: BIGINT>) AS sidecar
        UNION ALL
        SELECT NULL, named_struct('id', 'm1', 'partitionColumns', array('dt'),
                                  'schemaString', CAST(NULL AS STRING)), NULL
        UNION ALL
        SELECT NULL, NULL, named_struct('path', 'sc-1.parquet', 'sizeInBytes', 1L)
      """)
      val tmp2 = Files.createTempDirectory("delta-v2mf")
      mf.coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
      val p2 = Files.list(tmp2).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(p2, logDir.resolve(f"${1L}%020d.checkpoint.$uuid.parquet"))
    }
    Files.delete(logDir.resolve(f"${0L}%020d.json"))
    Files.delete(logDir.resolve(f"${1L}%020d.json"))
  }

  test("v2 checkpoint (parquet manifest + sidecar) replays after vacuum") {
    val t = buildTable()
    v2Checkpoint(t, jsonManifest = false)
    val rows = DeltaRead.snapshot(spark, t.toString)
      .select("id", "item", "dt").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "gadget", "2024-01-01"),
      (2L, "bolt", "2024-01-01"), (3L, "nut", "2024-01-02")))
  }

  test("v2 checkpoint (JSON manifest) replays, sidecar removes are tombstones") {
    val t = buildTable()
    v2Checkpoint(t, jsonManifest = true)
    assert(DeltaRead.snapshot(spark, t.toString).count() === 3L)
    // a missing sidecar fails loudly by path
    Files.delete(t.resolve("_delta_log/_sidecars/sc-1.parquet"))
    val e = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, t.toString))
    assert(e.getMessage.contains("sidecar missing"))
  }

  // ---- deletion vectors ----

  test("deleteWhere attaches DVs: rows vanish, no data file is rewritten") {
    val root = Files.createTempDirectory("delta-dv").resolve("t").toString
    val df = (1L to 100L).map(i => (i, s"item-$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "item", "par")
    graft.sink.DeltaWrite.create(df, root, Seq("par"))
    val filesBefore = Files.walk(java.nio.file.Paths.get(root))
      .filter(_.toString.endsWith(".parquet")).count()
    graft.sink.DeltaWrite.deleteWhere(spark, root, "id % 10 = 3")
    val filesAfter = Files.walk(java.nio.file.Paths.get(root))
      .filter(_.toString.endsWith(".parquet")).count()
    assert(filesAfter === filesBefore, "a DV delete must not rewrite data files")
    val got = DeltaRead.snapshot(spark, root).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got === (1L to 100L).filterNot(_ % 10 == 3))
    // a SECOND delete merges with the existing DVs instead of replacing them
    graft.sink.DeltaWrite.deleteWhere(spark, root, "id % 10 = 7")
    val got2 = DeltaRead.snapshot(spark, root).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got2 === (1L to 100L).filterNot(i => i % 10 == 3 || i % 10 == 7))
    // versionAsOf before the deletes still sees everything
    assert(DeltaRead.snapshot(spark, root, versionAsOf = Some(0L)).count() === 100L)
    // plan contract: the data side stays ONE parquet scan (the DV build
    // side is an RDD of expanded row indexes), merged by ONE anti join
    val plan = DeltaRead.snapshot(spark, root).queryExecution
      .executedPlan.toString
    assert("FileScan parquet".r.findAllMatchIn(plan).size === 1,
      "DV merge must not multiply parquet scans:\n" + plan)
    assert(plan.contains("LeftAnti"), "DV merge must be an anti join:\n" + plan)
  }

  test("DVs survive checkpoint + log vacuum (descriptor round-trips)") {
    val root = Files.createTempDirectory("delta-dvcp").resolve("t").toString
    val df = (1L to 50L).map(i => (i, s"i$i")).toDF("id", "item")
    graft.sink.DeltaWrite.create(df, root, Nil)
    graft.sink.DeltaWrite.deleteWhere(spark, root, "id <= 10")
    graft.sink.DeltaWrite.checkpoint(spark, root)
    graft.sink.DeltaWrite.vacuumLog(spark, root)
    // the JSON versions are gone; the checkpoint must carry the DV
    val got = DeltaRead.snapshot(spark, root).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got === (11L to 50L))
  }

  test("inline ('i') deletion vectors decode from the log itself") {
    val root = Files.createTempDirectory("delta-dvi")
    val sz = writeParquet(root, "f1.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    val inlineData = DeletionVectors.serializeRows(Seq(0L, 2L))
    val inline = DeletionVectors.z85EncodePadded(inlineData)
    log(root, 0L,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      """{"metaData":{"id":"m1","partitionColumns":[],"format":{"provider":"parquet"}}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true,""" +
        s""""deletionVector":{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${inlineData.length},"cardinality":2}}}""")
    val rows = DeltaRead.snapshot(spark, root.toString)
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((2L, "b"), (4L, "d")))
  }
}
