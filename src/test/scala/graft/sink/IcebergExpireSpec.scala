package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.IcebergRead

/** [[IcebergExpire]] — snapshot expiration: metadata keeps only the
  * retained tail, expired-only manifests/lists/data files are reaped,
  * anything a kept snapshot still references survives. */
class IcebergExpireSpec extends SparkSuite {

  import spark.implicits._

  private def writeParquet(dir: java.nio.file.Path, name: String,
                           rows: Seq[(Long, String)]): String = {
    val tmp = Files.createTempDirectory("ice-exp")
    rows.toDF("id", "item").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(dir)
    val target = dir.resolve(name)
    Files.copy(part, target)
    target.toString
  }

  private val schema = Seq((1, "id", "long"), (2, "item", "string"))

  test("carried-forward history: expiry drops only the old manifest lists") {
    // commitEntries carries prior manifests into every new list, so the
    // data files stay referenced by the kept snapshots — expiry must
    // reap ONLY the expired snapshots' manifest LISTS
    val root = Files.createTempDirectory("iceberg-expire").toString
    val data = java.nio.file.Paths.get(root, "data")
    (1 to 3).foreach { i =>
      IcebergWrite.commitEntries(spark, root,
        Seq(IcebergWrite.FileEntry(
          writeParquet(data, s"f$i.parquet", Seq((i.toLong, s"item$i"))), 0,
          i.toLong)),
        schema, snapshotId = i.toLong)
    }
    val (expired, deleted) = IcebergExpire.expireSnapshots(spark, root, retain = 2)
    assert(expired === 1)
    assert(deleted === 1, "only snapshot 1's manifest list is orphaned")
    assert(IcebergRead.snapshots(spark, root) === Seq(2L, 3L))
    assert(IcebergRead.snapshot(spark, root).count() === 3L,
      "the current snapshot still reads all carried files")
    val e = intercept[IllegalArgumentException](
      IcebergRead.snapshot(spark, root, snapshotId = Some(1L)))
    assert(e.getMessage.contains("not present"))
    // nothing more to expire at the same retention
    assert(IcebergExpire.expireSnapshots(spark, root, retain = 2) === ((0, 0)))
  }

  test("overwrite history: expiry reaps orphaned manifests AND data files") {
    // hand-built metadata where snapshot 2's list does NOT carry
    // snapshot 1's manifest (an overwrite) — expiring snapshot 1 must
    // delete its manifest list, manifest, and data file
    import org.apache.avro.generic.GenericData
    val root = Files.createTempDirectory("iceberg-expire-ow")
    val meta = root.resolve("metadata")
    val data = root.resolve("data")
    Files.createDirectories(meta)
    val fileA = writeParquet(data, "a.parquet", Seq((1L, "old")))
    val fileB = writeParquet(data, "b.parquet", Seq((2L, "new")))
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"snapshot_id","type":"long"},
        {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int"},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"}]}}]}""")
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"added_snapshot_id","type":"long"}]}""")
    def avro(path: java.nio.file.Path, schema: org.apache.avro.Schema,
             recs: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
      val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter(schema))
      w.create(schema, path.toFile)
      recs.foreach(w.append)
      w.close()
    }
    def entry(file: String, sid: Long) = {
      val df = new GenericData.Record(entrySchema.getField("data_file").schema)
      df.put("content", 0); df.put("file_path", file); df.put("file_format", "PARQUET")
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("snapshot_id", sid); e.put("data_file", df)
      e
    }
    def mref(m: String, sid: Long) = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", m); r.put("added_snapshot_id", sid)
      r
    }
    avro(meta.resolve("m1.avro"), entrySchema, Seq(entry(fileA, 1L)))
    avro(meta.resolve("m2.avro"), entrySchema, Seq(entry(fileB, 2L)))
    avro(meta.resolve("snap-1.avro"), listSchema,
      Seq(mref(meta.resolve("m1.avro").toString, 1L)))
    avro(meta.resolve("snap-2.avro"), listSchema,
      Seq(mref(meta.resolve("m2.avro").toString, 2L)))
    Files.writeString(meta.resolve("v1.metadata.json"),
      s"""{"format-version":2,"current-snapshot-id":2,"snapshots":[
        {"snapshot-id":1,"timestamp-ms":1000,"manifest-list":"${meta.resolve("snap-1.avro")}"},
        {"snapshot-id":2,"timestamp-ms":2000,"manifest-list":"${meta.resolve("snap-2.avro")}"}]}""")
    Files.writeString(meta.resolve("version-hint.text"), "1")

    val (expired, deleted) = IcebergExpire.expireSnapshots(spark, root.toString, 1)
    assert(expired === 1)
    assert(deleted === 3, "snap-1 list + m1 + fileA must all be reaped")
    assert(!Files.exists(java.nio.file.Paths.get(fileA)))
    assert(Files.exists(java.nio.file.Paths.get(fileB)))
    assert(IcebergRead.snapshot(spark, root.toString).count() === 1L)
    assert(IcebergRead.snapshots(spark, root.toString) === Seq(2L))
  }

  test("refuses to expire the current snapshot") {
    val root = Files.createTempDirectory("iceberg-expire-cur").toString
    val data = java.nio.file.Paths.get(root, "data")
    IcebergWrite.commitEntries(spark, root,
      Seq(IcebergWrite.FileEntry(
        writeParquet(data, "f1.parquet", Seq((1L, "x"))), 0, 1L)),
      schema, snapshotId = 1L)
    // retain=1 with one snapshot = nothing to do, never an error
    assert(IcebergExpire.expireSnapshots(spark, root, 1) === ((0, 0)))
  }
}
