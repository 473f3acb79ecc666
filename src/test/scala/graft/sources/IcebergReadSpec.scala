package graft.sources

import java.nio.file.{Files, Path}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSuite

/** [[IcebergRead]] against a hand-built Iceberg layout: metadata JSON
  * versions, Avro manifest lists and manifests (spec field names),
  * snapshot time travel, DELETED entry filtering, and the v2 delete-file
  * gate. */
class IcebergReadSpec extends SparkSuite {

  import spark.implicits._

  private val ManifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"manifest_length","type":"long"},
      {"name":"partition_spec_id","type":"int"},
      {"name":"added_snapshot_id","type":"long"}]}""")

  private val DataFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"r2","fields":[
      {"name":"content","type":"int"},
      {"name":"file_path","type":"string"},
      {"name":"file_format","type":"string"},
      {"name":"record_count","type":"long"},
      {"name":"file_size_in_bytes","type":"long"}]}""")

  private val ManifestEntrySchema = {
    val s = new Schema.Parser()
    s.parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"snapshot_id","type":"long"},
        {"name":"data_file","type":${DataFileSchema.toString}}]}""")
  }

  private def writeAvro(path: Path, schema: Schema,
                        records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    records.foreach(w.append)
    w.close()
  }

  private def entry(status: Int, filePath: String, content: Int = 0): GenericRecord = {
    val df = new GenericData.Record(DataFileSchema)
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", 1L)
    df.put("file_size_in_bytes", 1L)
    val e = new GenericData.Record(ManifestEntrySchema)
    e.put("status", status)
    e.put("snapshot_id", 1L)
    e.put("data_file", df)
    e
  }

  private def manifestRef(path: String): GenericRecord = {
    val m = new GenericData.Record(ManifestListSchema)
    m.put("manifest_path", path)
    m.put("manifest_length", 1L)
    m.put("partition_spec_id", 0)
    m.put("added_snapshot_id", 1L)
    m
  }

  private def writeParquet(dir: Path, name: String,
                           rows: Seq[(Long, String)]): String = {
    val tmp = Files.createTempDirectory("ice-part")
    rows.toDF("id", "item").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(dir)
    val target = dir.resolve(name)
    Files.copy(part, target)
    target.toString
  }

  /** Two snapshots: s1 = {fileA}, s2 = fileA deleted + fileB added. */
  private def buildTable(withDeleteFile: Boolean = false,
                         deleteContent: Int = 1): String = {
    val root = Files.createTempDirectory("iceberg-table")
    val meta = root.resolve("metadata")
    val data = root.resolve("data")
    Files.createDirectories(meta)
    val fileA = writeParquet(data, "a.parquet", Seq((1L, "widget"), (2L, "bolt")))
    val fileB = writeParquet(data, "b.parquet", Seq((1L, "gadget"), (2L, "bolt"), (3L, "nut")))
    // snapshot 1
    val m1 = meta.resolve("m1.avro")
    writeAvro(m1, ManifestEntrySchema, Seq(entry(1, fileA)))
    val ml1 = meta.resolve("snap-1.avro")
    writeAvro(ml1, ManifestListSchema, Seq(manifestRef(m1.toString)))
    // snapshot 2: A deleted, B added (+ optionally a v2 delete file)
    val m2 = meta.resolve("m2.avro")
    val entries2 = Seq(entry(2, fileA), entry(1, fileB)) ++
      (if (withDeleteFile) Seq(entry(1, fileB.replace(".parquet", "-del.parquet"),
        content = deleteContent)) else Nil)
    writeAvro(m2, ManifestEntrySchema, entries2)
    val ml2 = meta.resolve("snap-2.avro")
    writeAvro(ml2, ManifestListSchema, Seq(manifestRef(m2.toString)))
    Files.writeString(meta.resolve("v1.metadata.json"),
      s"""{"format-version":2,"current-snapshot-id":1,
        "snapshots":[{"snapshot-id":1,"manifest-list":"$ml1"}]}""")
    Files.writeString(meta.resolve("v2.metadata.json"),
      s"""{"format-version":2,"current-snapshot-id":2,
        "snapshots":[{"snapshot-id":1,"timestamp-ms":1000,"manifest-list":"$ml1"},
                     {"snapshot-id":2,"timestamp-ms":2000,"manifest-list":"$ml2"}]}""")
    Files.writeString(meta.resolve("version-hint.text"), "2")
    root.toString
  }

  test("snapshot reads the current snapshot; DELETED entries drop files") {
    val t = buildTable()
    assert(IcebergRead.snapshots(spark, t) === Seq(1L, 2L))
    val rows = IcebergRead.snapshot(spark, t)
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "gadget"), (2L, "bolt"), (3L, "nut"))) // fileB only
  }

  test("snapshotId time travel reads the superseded file set") {
    val t = buildTable()
    val rows = IcebergRead.snapshot(spark, t, snapshotId = Some(1L))
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "widget"), (2L, "bolt")))
    val e = intercept[IllegalArgumentException](
      IcebergRead.snapshot(spark, t, snapshotId = Some(99L)))
    assert(e.getMessage.contains("not present"))
  }

  test("an equality-delete entry without equality_ids fails loudly") {
    // a manifest written without the equality_ids field is unreadable —
    // silently ignoring the delete file would resurrect deleted rows
    val t = buildTable(withDeleteFile = true, deleteContent = 2)
    val e = intercept[IllegalArgumentException](IcebergRead.snapshot(spark, t))
    assert(e.getMessage.contains("equality_ids"))
    // the pre-delete snapshot still reads
    assert(IcebergRead.snapshot(spark, t, snapshotId = Some(1L)).count() === 2L)
  }

  // ---- v2 equality deletes (via IcebergWrite.commitEntries) ----

  private val idItemSchema = Seq((1, "id", "long"), (2, "item", "string"))

  /** data@seq1 = {1 widget, 2 bolt, 3 null-item}; eq-delete@seq2 on `item`
    * = {widget, null}; data@seq3 re-inserts {1 widget'}. */
  private def buildEqTable(): String = {
    val root = Files.createTempDirectory("iceberg-eq")
    val data = root.resolve("data")
    val f1 = {
      val tmp = Files.createTempDirectory("ice-eq1")
      Seq((1L, Some("widget")), (2L, Some("bolt")), (3L, None))
        .toDF("id", "item").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.createDirectories(data)
      Files.copy(part, data.resolve("f1.parquet")); data.resolve("f1.parquet").toString
    }
    val f3 = writeParquet(data, "f3.parquet", Seq((1L, "widget-v2")))
    val del = {
      val tmp = Files.createTempDirectory("ice-eqd")
      Seq(Some("widget"), Option.empty[String]).toDF("item")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, data.resolve("d2.parquet")); data.resolve("d2.parquet").toString
    }
    graft.sink.IcebergWrite.commitEntries(spark, root.toString, Seq(
      graft.sink.IcebergWrite.FileEntry(f1, 0, 1L),
      graft.sink.IcebergWrite.FileEntry(del, 2, 2L, equalityIds = Seq(2)),
      graft.sink.IcebergWrite.FileEntry(f3, 0, 3L)),
      schemaFields = idItemSchema)
    root.toString
  }

  test("v2 EQUALITY deletes merge: null-safe match, strict seq scoping") {
    val t = buildEqTable()
    val rows = IcebergRead.snapshot(spark, t)
      .selectExpr("id", "coalesce(item, '<null>') AS item")
      .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // seq-1 'widget' and the null-item row die (delete@seq2, null-safe);
    // 'bolt' survives; the seq-3 re-insert of id=1 survives (3 ≥ 2)
    assert(rows === Seq((1L, "widget-v2"), (2L, "bolt")))
  }

  test("plan contract: delete merges keep ONE data scan + anti joins") {
    val t = buildEqTable()
    val plan = IcebergRead.snapshot(spark, t)
      .queryExecution.executedPlan.toString
    // data side: one multi-file parquet scan; one anti join per delete
    // class present (here: one equality group)
    assert("FileScan parquet".r.findAllMatchIn(plan).size === 2,
      "expected exactly the data scan + the delete-file scan:\n" + plan)
    assert("LeftAnti".r.findAllMatchIn(plan).size === 1,
      "equality-delete merge must be one anti join:\n" + plan)
  }

  test("equality deletes on NESTED struct fields resolve by path") {
    import org.apache.spark.sql.functions.{col, struct}
    val root = Files.createTempDirectory("iceberg-eqnest")
    val data = root.resolve("data")
    Files.createDirectories(data)
    def onePart(dir: Path, name: String,
                df: org.apache.spark.sql.DataFrame): String = {
      val tmp = Files.createTempDirectory("ice-nest")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, dir.resolve(name))
      dir.resolve(name).toString
    }
    // data: (id, meta{zip}) — delete on field id 3 = meta.zip
    val f1 = onePart(data, "f1.parquet",
      Seq((1L, "z1"), (2L, "z2"), (3L, "z1")).toDF("id", "zip")
        .select(col("id"), struct(col("zip")).as("meta")))
    val del = onePart(data, "d.parquet",
      Seq(Tuple1("z1")).toDF("zip").select(struct(col("zip")).as("meta")))
    val nestedSchema = Seq(
      (1, "id", "long"),
      (2, "meta", """{"type":"struct","fields":[
        {"id":3,"name":"zip","required":false,"type":"string"}]}"""))
    graft.sink.IcebergWrite.commitEntries(spark, root.toString, Seq(
      graft.sink.IcebergWrite.FileEntry(f1, 0, 1L),
      graft.sink.IcebergWrite.FileEntry(del, 2, 2L, equalityIds = Seq(3))),
      schemaFields = nestedSchema)
    val rows = IcebergRead.snapshot(spark, root.toString)
      .select("id").as[Long].collect().sorted.toSeq
    assert(rows === Seq(2L),
      "rows whose meta.zip matches the nested equality delete must drop")
  }

  test("equality-delete field ids resolve through the metadata schema") {
    val root = Files.createTempDirectory("iceberg-eqbad")
    val data = root.resolve("data")
    val f1 = writeParquet(data, "f1.parquet", Seq((1L, "widget")))
    val del = writeParquet(data, "d.parquet", Seq((1L, "widget")))
    graft.sink.IcebergWrite.commitEntries(spark, root.toString, Seq(
      graft.sink.IcebergWrite.FileEntry(f1, 0, 1L),
      graft.sink.IcebergWrite.FileEntry(del, 2, 2L, equalityIds = Seq(99))),
      schemaFields = idItemSchema)
    val e = intercept[IllegalArgumentException](
      IcebergRead.snapshot(spark, root.toString))
    assert(e.getMessage.contains("field id 99"))
  }

  test("v2 POSITION deletes are merged: deleted (file, pos) rows drop out") {
    val t = buildTable(withDeleteFile = true, deleteContent = 1)
    // the delete parquet targets fileB row 0 ("gadget") by its MANIFEST
    // path spelling; _metadata.file_path is the qualified URI, so this
    // also exercises the qualified→manifest bridge
    val fileB = java.nio.file.Paths.get(t, "data", "b.parquet").toString
    val delPath = java.nio.file.Paths.get(t, "data", "b-del.parquet")
    val tmp = Files.createTempDirectory("ice-del")
    Seq((fileB, 0L)).toDF("file_path", "pos")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part, delPath)
    val rows = IcebergRead.snapshot(spark, t)
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((2L, "bolt"), (3L, "nut")),
      "position delete of (b.parquet, 0) must drop exactly the 'gadget' row")
    // time travel BEFORE the delete still sees the full snapshot-1 set
    assert(IcebergRead.snapshot(spark, t, snapshotId = Some(1L)).count() === 2L)
  }

  test("snapshotAt picks the newest snapshot at or before the timestamp") {
    val t = buildTable()
    // between the two snapshots → snapshot 1 (fileA)
    assert(IcebergRead.snapshotIdAtTimestamp(spark, t, 1500L) === 1L)
    assert(IcebergRead.snapshotAt(spark, t, 1500L).count() === 2L)
    // at/after the second → snapshot 2 (fileB)
    assert(IcebergRead.snapshotIdAtTimestamp(spark, t, 2000L) === 2L)
    assert(IcebergRead.snapshotAt(spark, t, 99999L).count() === 3L)
    // before the first → loud
    val e = intercept[IllegalArgumentException](
      IcebergRead.snapshotIdAtTimestamp(spark, t, 999L))
    assert(e.getMessage.contains("no Iceberg snapshot"))
  }

  // ---- incremental append scan (multi-snapshot commitEntries) ----

  test("incremental append scan reads exactly the appended files") {
    import graft.sink.IcebergWrite
    import graft.sink.IcebergWrite.FileEntry
    val root = Files.createTempDirectory("iceberg-inc").toString
    val data = java.nio.file.Paths.get(root, "data")
    val f1 = writeParquet(data, "f1.parquet", Seq((1L, "widget")))
    val f2 = writeParquet(data, "f2.parquet", Seq((2L, "bolt")))
    val f3 = writeParquet(data, "f3.parquet", Seq((3L, "nut")))
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f1, 0, 1L)),
      schemaFields = idItemSchema, snapshotId = 1L)
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f2, 0, 2L)),
      schemaFields = idItemSchema, snapshotId = 2L)
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f3, 0, 3L)),
      schemaFields = idItemSchema, snapshotId = 3L)
    // append commits accumulate: the CURRENT snapshot sees everything
    assert(IcebergRead.snapshot(spark, root).count() === 3L)
    assert(IcebergRead.snapshots(spark, root) === Seq(1L, 2L, 3L))
    // after snapshot 1 → files 2 and 3; bounded → file 2 only
    val inc = IcebergRead.incremental(spark, root, fromSnapshotId = 1L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(inc === Seq(2L, 3L))
    val bounded = IcebergRead.incremental(spark, root, 1L, Some(2L))
      .select("id").as[Long].collect().toSeq
    assert(bounded === Seq(2L))
    // empty range
    assert(IcebergRead.incremental(spark, root, 3L).count() === 0L)
    // duplicate snapshot ids are refused
    val e = intercept[IllegalArgumentException](
      IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f1, 0, 9L)),
        schemaFields = idItemSchema, snapshotId = 2L))
    assert(e.getMessage.contains("already committed"))
  }

  test("incremental inherits null entry snapshot_id from added_snapshot_id") {
    // real Iceberg v2 writers leave manifest-entry snapshot_id NULL and
    // rely on manifest-list inheritance — entries must not be skipped
    import graft.sink.IcebergWrite
    import graft.sink.IcebergWrite.FileEntry
    val root = Files.createTempDirectory("iceberg-inherit").toString
    val data = java.nio.file.Paths.get(root, "data")
    val f1 = writeParquet(data, "f1.parquet", Seq((1L, "widget")))
    val f2 = writeParquet(data, "f2.parquet", Seq((2L, "bolt")))
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f1, 0, 1L)),
      schemaFields = idItemSchema, snapshotId = 1L, inheritSnapshotId = true)
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f2, 0, 2L)),
      schemaFields = idItemSchema, snapshotId = 2L, inheritSnapshotId = true)
    val inc = IcebergRead.incremental(spark, root, fromSnapshotId = 1L)
      .select("id").as[Long].collect().toSeq
    assert(inc === Seq(2L),
      "null-snapshot_id entries must inherit the manifest list's " +
        "added_snapshot_id, not be silently skipped")
    // the delete gate must also fire through inheritance
    val del = writeParquet(data, "d.parquet", Seq((2L, "bolt")))
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(del, 2, 3L, equalityIds = Seq(1))),
      schemaFields = idItemSchema, snapshotId = 3L, inheritSnapshotId = true)
    val e = intercept[IllegalArgumentException](
      IcebergRead.incremental(spark, root, 2L))
    assert(e.getMessage.contains("not append-only"))
  }

  test("incremental refuses a snapshot whose summary.operation != append") {
    // a delete/overwrite snapshot may express itself purely by dropping
    // manifests from its list — no status-2 entry, no delete file — so
    // the summary gate is the only detector
    import graft.sink.IcebergWrite
    import graft.sink.IcebergWrite.FileEntry
    val root = Files.createTempDirectory("iceberg-op").toString
    val data = java.nio.file.Paths.get(root, "data")
    val f1 = writeParquet(data, "f1.parquet", Seq((1L, "widget")))
    val f2 = writeParquet(data, "f2.parquet", Seq((2L, "bolt")))
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f1, 0, 1L)),
      schemaFields = idItemSchema, snapshotId = 1L)
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f2, 0, 2L)),
      schemaFields = idItemSchema, snapshotId = 2L, operation = "overwrite")
    val e = intercept[IllegalArgumentException](
      IcebergRead.incremental(spark, root, 1L))
    assert(e.getMessage.contains("summary.operation=overwrite"))
  }

  test("incremental refuses non-append history (deletes in range)") {
    import graft.sink.IcebergWrite
    import graft.sink.IcebergWrite.FileEntry
    val root = Files.createTempDirectory("iceberg-incdel").toString
    val data = java.nio.file.Paths.get(root, "data")
    val f1 = writeParquet(data, "f1.parquet", Seq((1L, "widget")))
    val del = writeParquet(data, "d.parquet", Seq((1L, "widget")))
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f1, 0, 1L)),
      schemaFields = idItemSchema, snapshotId = 1L)
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(del, 2, 2L, equalityIds = Seq(1))),
      schemaFields = idItemSchema, snapshotId = 2L)
    val e = intercept[IllegalArgumentException](
      IcebergRead.incremental(spark, root, 1L))
    assert(e.getMessage.contains("not append-only"))
  }

  test("a non-Iceberg directory fails with an actionable message") {
    val plain = Files.createTempDirectory("not-iceberg").toString
    val e = intercept[IllegalArgumentException](
      IcebergRead.snapshot(spark, plain))
    assert(e.getMessage.contains("not an Iceberg table"))
  }
}
