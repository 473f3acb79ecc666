package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite
import graft.sink.IcebergWrite
import graft.sink.IcebergWrite.FileEntry

/** `spark.readStream.format("graft-iceberg")` — append-history tail
  * cursored by SNAPSHOT ID over the metadata/manifest chain (ids are
  * stable under snapshot expiration; ordinals are not). */
class IcebergStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private val schema = Seq((1, "id", "long"), (2, "item", "string"))

  /** Simulate snapshot EXPIRATION: rewrite the metadata with `ids`
    * removed from the snapshots array (new version + hint bump), exactly
    * what expire_snapshots leaves behind. */
  private def expireSnapshots(root: String, ids: Set[Long]): Unit = {
    // write through the Hadoop fs (like IcebergWrite) — LocalFileSystem
    // keeps .crc sidecars that a raw NIO rewrite would invalidate
    val meta = new org.apache.hadoop.fs.Path(root, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readString(p: org.apache.hadoop.fs.Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    def writeString(p: org.apache.hadoop.fs.Path, s: String): Unit = {
      val out = fs.create(p, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    val hint = new org.apache.hadoop.fs.Path(meta, "version-hint.text")
    val v = readString(hint).trim.toLong
    val mapper = graft.sources.DocPushdown.jsonMapper
    val node = mapper.readTree(readString(
      new org.apache.hadoop.fs.Path(meta, s"v$v.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val kept = mapper.createArrayNode()
    node.get("snapshots").forEach { s =>
      if (!ids.contains(s.get("snapshot-id").asLong())) kept.add(s): Unit
    }
    node.set[com.fasterxml.jackson.databind.JsonNode]("snapshots", kept)
    writeString(new org.apache.hadoop.fs.Path(meta, s"v${v + 1}.metadata.json"),
      mapper.writeValueAsString(node))
    writeString(hint, (v + 1).toString)
  }

  private def writeParquet(dir: java.nio.file.Path, name: String,
                           rows: Seq[(Long, String)]): String = {
    val tmp = Files.createTempDirectory("ice-st")
    rows.toDF("id", "item").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(dir)
    val target = dir.resolve(name)
    Files.copy(part, target)
    target.toString
  }

  test("tailing append commits; restart resumes at the checkpointed snapshot id") {
    val root = Files.createTempDirectory("iceberg-stream").toString
    val data = java.nio.file.Paths.get(root, "data")
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f1.parquet", Seq((1L, "widget"))), 0, 1L)),
      schema, snapshotId = 11L)
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f2.parquet", Seq((2L, "bolt"))), 0, 2L)),
      schema, snapshotId = 22L)
    val ckpt = Files.createTempDirectory("iceberg-stream-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[(Long, String, String)]
    def run(): Unit = {
      val q = spark.readStream.format("graft-iceberg").option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= b.selectExpr("version", "change_type", "row")
              .as[(Long, String, String)].collect()
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val first = seen.synchronized(seen.toSeq)
    assert(first.map(_._1).sorted === Seq(11L, 22L))
    assert(first.forall(_._2 == "insert"))
    assert(first.exists(r => r._3.contains("\"item\":\"widget\"") &&
      r._3.contains("\"id\":1")))
    // grow by one snapshot; restart delivers only it
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f3.parquet", Seq((3L, "nut"))), 0, 3L)),
      schema, snapshotId = 33L)
    run()
    val all = seen.synchronized(seen.toSeq)
    assert(all.size === 3 && all.count(_._1 == 33L) === 1)
  }

  test("startingTimestamp: emit from the earliest snapshot at or after it") {
    val root = Files.createTempDirectory("iceberg-stream-ts").toString
    val data = java.nio.file.Paths.get(root, "data")
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f1.parquet", Seq((1L, "widget"))), 0, 1L)),
      schema, snapshotId = 11L, timestampMs = Some(1000L))
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f2.parquet", Seq((2L, "bolt"))), 0, 2L)),
      schema, snapshotId = 22L, timestampMs = Some(2000L))
    val q = spark.readStream.format("graft-iceberg").option("path", root)
      .option("startingTimestamp", "1500").load()
      .writeStream.format("memory").queryName("ice_tail_ts")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val versions = spark.table("ice_tail_ts").selectExpr("version")
      .as[Long].collect().toSeq
    assert(versions === Seq(22L),
      s"only snapshot 22 (timestamp >= 1500) must emit, got $versions")
    // a timestamp past every snapshot starts after the tip
    val q2 = spark.readStream.format("graft-iceberg").option("path", root)
      .option("startingTimestamp", "9999").load()
      .writeStream.format("memory").queryName("ice_tail_ts2")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("ice_tail_ts2").count() === 0L)
  }

  test("restart survives expiry of EARLIER snapshots (id cursor, not ordinal)") {
    val root = Files.createTempDirectory("iceberg-stream-exp").toString
    val data = java.nio.file.Paths.get(root, "data")
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f1.parquet", Seq((1L, "widget"))), 0, 1L)),
      schema, snapshotId = 11L)
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f2.parquet", Seq((2L, "bolt"))), 0, 2L)),
      schema, snapshotId = 22L)
    val ckpt = Files.createTempDirectory("iceberg-stream-exp-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-iceberg").option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.selectExpr("version").as[Long].collect() }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.synchronized(seen.sorted.toSeq) === Seq(11L, 22L))
    // expire the FIRST snapshot (shifts every ordinal left) and append;
    // the id cursor must deliver exactly the new snapshot — an ordinal
    // cursor would silently skip it or replay 22
    expireSnapshots(root, Set(11L))
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f3.parquet", Seq((3L, "nut"))), 0, 3L)),
      schema, snapshotId = 33L)
    run()
    assert(seen.synchronized(seen.sorted.toSeq) === Seq(11L, 22L, 33L))
  }

  test("restart fails loudly when the CHECKPOINTED snapshot has expired") {
    val root = Files.createTempDirectory("iceberg-stream-expbad").toString
    val data = java.nio.file.Paths.get(root, "data")
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f1.parquet", Seq((1L, "widget"))), 0, 1L)),
      schema, snapshotId = 11L)
    val ckpt = Files.createTempDirectory("iceberg-stream-expbad-ckpt").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-iceberg").option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // the cursor now holds id 11; expire it and commit more
    expireSnapshots(root, Set(11L))
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f2.parquet", Seq((2L, "bolt"))), 0, 2L)),
      schema, snapshotId = 22L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](run())
    assert(e.toString.contains("no longer in the table metadata") ||
      Option(e.getCause).exists(_.toString.contains("no longer in the table metadata")))
  }

  test("a legacy ORDINAL checkpoint offset is refused with a migration hint") {
    val e = intercept[IllegalStateException](IcebergStreamOffset.parse("1"))
    assert(e.getMessage.toLowerCase.contains("ordinal"))
    // round-trip of the current format
    assert(IcebergStreamOffset.parse(
      IcebergStreamOffset(Some(42L)).json()) === IcebergStreamOffset(Some(42L)))
    assert(IcebergStreamOffset.parse(
      IcebergStreamOffset(None).json()) === IcebergStreamOffset(None))
  }

  test("upsert/delete snapshots emit changelog rows (the mirror-chain shape)") {
    val root = Files.createTempDirectory("iceberg-stream-chg").toString
    val data = java.nio.file.Paths.get(root, "data")
    // snap 1: plain append of ids 1, 2
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f1.parquet",
        Seq((1L, "widget"), (2L, "bolt"))), 0, 1L)),
      schema, snapshotId = 1L)
    // snap 2: IcebergWrite.upsert — data + equality-delete at one seq
    assert(IcebergWrite.upsert(Seq((2L, "bolt-v2")).toDF("id", "item"),
      root, Seq("id"), schema, snapshotId = 2L, sequenceNumber = 2L))
    // snap 3: hard delete of id 1
    assert(IcebergWrite.deleteKeys(Seq(Tuple1(1L)).toDF("id"),
      root, Seq("id"), schema, snapshotId = 3L, sequenceNumber = 3L))
    val q = spark.readStream.format("graft-iceberg").option("path", root).load()
      .writeStream.format("memory").queryName("ice_tail_chg")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("ice_tail_chg")
      .selectExpr("version", "change_type", "row")
      .as[(Long, String, String)].collect().toSeq
    assert(rows.filter(_._1 == 1L).map(_._2).sorted === Seq("insert", "insert"))
    val v2 = rows.filter(_._1 == 2L)
    assert(v2.map(_._2).sorted === Seq("delete", "upsert"))
    assert(v2.find(_._2 == "upsert").exists(_._3.contains("bolt-v2")))
    assert(v2.find(_._2 == "delete").exists(r =>
      r._3.contains("\"id\":2") && !r._3.contains("item")),
      "delete rows carry exactly the equality-delete key tuple")
    assert(rows.filter(_._1 == 3L).map(_._2) === Seq("delete"))
    assert(rows.find(_._1 == 3L).exists(_._3.contains("\"id\":1")))
  }

  test("a manifest-dropping snapshot (rewrite) fails the stream loudly") {
    val root = Files.createTempDirectory("iceberg-stream-drop").toString
    val data = java.nio.file.Paths.get(root, "data")
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f1.parquet", Seq((1L, "widget"))), 0, 1L)),
      schema, snapshotId = 1L)
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f2.parquet", Seq((2L, "bolt"))), 0, 2L)),
      schema, snapshotId = 2L)
    // synthesize snapshot 3 whose manifest list is snap 1's — it DROPS
    // snapshot 2's manifest (exactly what a rewrite/compaction leaves)
    val meta = new org.apache.hadoop.fs.Path(root, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readString(p: org.apache.hadoop.fs.Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    def writeString(p: org.apache.hadoop.fs.Path, s: String): Unit = {
      val out = fs.create(p, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    val hint = new org.apache.hadoop.fs.Path(meta, "version-hint.text")
    val v = readString(hint).trim.toLong
    val mapper = graft.sources.DocPushdown.jsonMapper
    val node = mapper.readTree(readString(
      new org.apache.hadoop.fs.Path(meta, s"v$v.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snapsArr = node.get("snapshots")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val snap1List = snapsArr.get(0).get("manifest-list").asText()
    val rewrite = mapper.createObjectNode()
    rewrite.put("snapshot-id", 3L)
    rewrite.put("timestamp-ms", 3L)
    rewrite.set[com.fasterxml.jackson.databind.JsonNode]("summary",
      mapper.readTree("""{"operation":"replace"}"""))
    rewrite.put("manifest-list", snap1List)
    snapsArr.add(rewrite)
    node.put("current-snapshot-id", 3L)
    writeString(new org.apache.hadoop.fs.Path(meta, s"v${v + 1}.metadata.json"),
      mapper.writeValueAsString(node))
    writeString(hint, (v + 1).toString)

    val q = spark.readStream.format("graft-iceberg").option("path", root).load()
      .writeStream.format("memory").queryName("ice_tail_drop")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(2000)
    }
    q.stop()
    assert(e.toString.contains("drops manifest") ||
      Option(e.getCause).exists(_.toString.contains("drops manifest")))
  }
}
