package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite
import graft.sink.IcebergWrite
import graft.sink.IcebergWrite.FileEntry

/** `spark.readStream.format("graft-iceberg")` — append-history tail by
  * snapshot ordinal over the metadata/manifest chain. */
class IcebergStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private val schema = Seq((1, "id", "long"), (2, "item", "string"))

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

  test("tailing append commits; restart resumes at the checkpointed ordinal") {
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

  test("a delete snapshot in the tail fails the stream loudly") {
    val root = Files.createTempDirectory("iceberg-stream-del").toString
    val data = java.nio.file.Paths.get(root, "data")
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "f1.parquet", Seq((1L, "widget"))), 0, 1L)),
      schema, snapshotId = 1L)
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(writeParquet(data, "d.parquet", Seq((1L, "widget"))), 2, 2L,
        equalityIds = Seq(1))),
      schema, snapshotId = 2L)
    val q = spark.readStream.format("graft-iceberg").option("path", root).load()
      .writeStream.format("memory").queryName("ice_tail_del")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(2000)
    }
    q.stop()
    assert(e.toString.contains("not append-only") ||
      Option(e.getCause).exists(_.toString.contains("not append-only")))
  }
}
