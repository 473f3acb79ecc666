package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite
import graft.sources.DeltaRead

/** `spark.readStream.format("graft-delta")` — streaming tail of a Delta
  * table's change feed by log version: per-changed-file partitions,
  * synthesized insert/delete change types, checkpointed resume. */
class DeltaStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private def mkTable(): String = {
    val root = Files.createTempDirectory("delta-stream").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
        .toDF("id", "item", "par"), root, Seq("par"))
    root
  }

  test("tailing emits CDF rows per version with partition values merged") {
    val root = mkTable()
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a"), (4L, "gear", "a")).toDF("id", "item", "par"),
      root, "par", "a")
    val q = spark.readStream.format("graft-delta").option("path", root).load()
      .writeStream.format("memory").queryName("delta_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("delta_tail")
      .selectExpr("version", "change_type", "row")
      .as[(Long, String, String)].collect().toSeq
    // v0: 3 inserts; v1: 2 deletes (old partition-a rows) + 2 inserts
    assert(rows.count(r => r._1 == 0L && r._2 == "insert") === 3)
    assert(rows.count(r => r._1 == 1L && r._2 == "delete") === 2)
    assert(rows.count(r => r._1 == 1L && r._2 == "insert") === 2)
    // rows are JSON with data AND partition columns
    val gear = rows.find(r => r._3.contains("\"gear\"")).get
    assert(gear._2 === "insert" && gear._1 === 1L)
    assert(gear._3.contains("\"par\":\"a\"") && gear._3.contains("\"id\":4"))
  }

  test("restart resumes after the checkpointed version; startingVersion=latest") {
    val root = mkTable()
    val ckpt = Files.createTempDirectory("delta-stream-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[(Long, String)]
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta").option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= b.selectExpr("version", "change_type")
              .as[(Long, String)].collect()
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.synchronized(seen.size) === 3) // v0 inserts
    // grow the table, restart: only v1 arrives
    graft.sink.DeltaWrite.replacePartition(
      Seq((9L, "cog", "b")).toDF("id", "item", "par"), root, "par", "b")
    run()
    val all = seen.synchronized(seen.toSeq)
    assert(all.count(_._1 == 0L) === 3, "v0 must not replay")
    assert(all.count(_._1 == 1L) === 2) // 1 delete + 1 insert
    // startingVersion=latest skips history
    val q2 = spark.readStream.format("graft-delta").option("path", root)
      .option("startingVersion", "latest").load()
      .writeStream.format("memory").queryName("delta_tail_latest")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("delta_tail_latest").count() === 0L)
  }

  test("column-mapped tables tail with LOGICAL json keys (top-level rename)") {
    // name-mode fixture: files carry col-aaa/col-bbb, partition values
    // keyed by col-ddd — the tail must emit id/item/dt
    val root = Files.createTempDirectory("delta-stream-mapped")
    def schemaString = {
      def f(name: String, phys: String, tpe: String, id: Int) =
        s"""{"name":"$name","type":"$tpe","nullable":true,"metadata":{""" +
          s""""delta.columnMapping.physicalName":"$phys","delta.columnMapping.id":$id}}"""
      (s"""{"type":"struct","fields":[${f("id", "col-aaa", "long", 1)},""" +
        s"""${f("item", "col-bbb", "string", 2)},${f("dt", "col-ddd", "string", 3)}]}""")
        .replace("\"", "\\\"")
    }
    val tmp = Files.createTempDirectory("dsm-p")
    Seq((1L, "widget"), (2L, "bolt")).toDF("col-aaa", "col-bbb").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(root.resolve("d1"))
    Files.copy(part, root.resolve("d1/f1.parquet"))
    val sz = Files.size(root.resolve("d1/f1.parquet"))
    val logDir = root.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"${0L}%020d.json"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" + "\n" +
        s"""{"metaData":{"id":"m1","partitionColumns":["dt"],"schemaString":"$schemaString","format":{"provider":"parquet"},"configuration":{"delta.columnMapping.mode":"name"}}}""" + "\n" +
        s"""{"add":{"path":"d1/f1.parquet","partitionValues":{"col-ddd":"2024-06-01"},"size":$sz,"modificationTime":1,"dataChange":true}}""" + "\n")
    val q = spark.readStream.format("graft-delta").option("path", root.toString)
      .load()
      .writeStream.format("memory").queryName("delta_tail_mapped")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("delta_tail_mapped")
      .selectExpr("version", "change_type", "row")
      .as[(Long, String, String)].collect().toSeq
    assert(rows.size === 2)
    val widget = rows.find(_._3.contains("widget")).get
    assert(widget._2 === "insert")
    assert(widget._3.contains("\"id\":1") && widget._3.contains("\"item\":\"widget\"")
      && widget._3.contains("\"dt\":\"2024-06-01\""),
      s"json must carry LOGICAL keys: ${widget._3}")
    assert(!widget._3.contains("col-aaa") && !widget._3.contains("col-ddd"),
      s"physical names must not leak: ${widget._3}")
  }

  test("startingTimestamp: emit from the earliest commit at or after it") {
    val root = mkTable() // v0 committed "now"
    graft.sink.DeltaWrite.replacePartition(
      Seq((4L, "gear", "b")).toDF("id", "item", "par"), root, "par", "b")
    // pin v1's commit file mtime into the future; start between v0 and v1
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    val v1 = logDir.resolve(f"${1L}%020d.json")
    val cut = java.nio.file.Files.getLastModifiedTime(v1).toMillis + 100000L
    java.nio.file.Files.setLastModifiedTime(v1,
      java.nio.file.attribute.FileTime.fromMillis(cut + 50000L))
    val q = spark.readStream.format("graft-delta").option("path", root)
      .option("startingTimestamp", cut.toString).load()
      .writeStream.format("memory").queryName("delta_tail_ts")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val versions = spark.table("delta_tail_ts").selectExpr("version")
      .as[Long].collect().toSeq
    assert(versions.nonEmpty && versions.forall(_ == 1L),
      s"only v1 (committed after the timestamp) must emit, got $versions")
    // a timestamp past every commit starts after the tip
    val q2 = spark.readStream.format("graft-delta").option("path", root)
      .option("startingTimestamp", (cut + 900000L).toString).load()
      .writeStream.format("memory").queryName("delta_tail_ts2")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("delta_tail_ts2").count() === 0L)
  }

  test("a DV commit in the tail fails the stream loudly") {
    val root = mkTable()
    graft.sink.DeltaWrite.deleteWhere(spark, root, "id = 2")
    val q = spark.readStream.format("graft-delta").option("path", root).load()
      .writeStream.format("memory").queryName("delta_tail_dv")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(2000)
    }
    q.stop()
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert(e.toString.contains("deletion vectors without cdc") ||
      rootMsg(e).contains("deletion vectors without cdc"))
  }
}
