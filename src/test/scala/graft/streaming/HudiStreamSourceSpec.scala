package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite
import graft.sink.HudiMorWrite

/** `spark.readStream.format("graft-hudi")` — COW timeline tail by
  * completed instant: per-base-file partitions with the
  * `_hoodie_commit_time` row filter (carried-over rows keep their
  * original commit time and must NOT re-emit), checkpointed resume, and
  * the MOR gate. */
class HudiStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private val T1 = "20240101000000000"
  private val T2 = "20240102000000000"
  private val T3 = "20240103000000000"

  /** COW commits: T1 = {1 widget, 2 bolt}; T2 rewrites the group with
    * row 1 updated (T2) and row 2 CARRIED (still stamped T1). */
  private def mkTable(): String = {
    val root = Files.createTempDirectory("hudi-stream").toString
    def rows(data: Seq[(String, String, Long, String)]) =
      data.toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item")
        .selectExpr("_hoodie_record_key", "_hoodie_commit_time", "id", "item")
    HudiMorWrite.writeBase(
      rows(Seq(("1", T1, 1L, "widget"), ("2", T1, 2L, "bolt"))),
      root, "part=0", "fg1", T1)
    HudiMorWrite.writeBase(
      rows(Seq(("1", T2, 1L, "widget-v2"), ("2", T1, 2L, "bolt"))),
      root, "part=0", "fg1", T2)
    root
  }

  test("COW tail: row filter drops carried-overs; restart resumes") {
    val root = mkTable()
    val ckpt = Files.createTempDirectory("hudi-stream-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[(Long, String, String)]
    def run(): Unit = {
      val q = spark.readStream.format("graft-hudi").option("path", root).load()
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
    // first batch covers ("" .. T2]: the T2 base is the visible slice —
    // widget-v2 at version T2, bolt carried with its T1 stamp
    assert(first.size === 2)
    assert(first.exists(r => r._1 == T2.toLong && r._3.contains("widget-v2")))
    assert(first.exists(r => r._1 == T1.toLong && r._3.contains("\"bolt\"")))
    assert(first.forall(_._2 == "upsert"))
    // T3 rewrites again: row 2 updated, row 1 carried (T2 stamp)
    HudiMorWrite.writeBase(
      Seq(("1", T2, 1L, "widget-v2"), ("2", T3, 2L, "bolt-v2"))
        .toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item"),
      root, "part=0", "fg1", T3)
    run()
    val all = seen.synchronized(seen.toSeq)
    assert(all.size === 3, s"only the T3 update may arrive, got $all")
    assert(all.count(r => r._3.contains("bolt-v2") && r._1 == T3.toLong) === 1)
    assert(!all.exists(r => r._3.contains("widget-v2") && r._1 != T2.toLong))
  }

  test("startingInstant=latest skips history; MOR log files gate loudly") {
    val root = mkTable()
    val q = spark.readStream.format("graft-hudi").option("path", root)
      .option("startingInstant", "latest").load()
      .writeStream.format("memory").queryName("hudi_tail_latest")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("hudi_tail_latest").count() === 0L)
    // a visible MOR log file makes the tail refuse (batch incremental
    // handles it)
    HudiMorWrite.appendLog(
      Seq(("1", T3, 1L, "widget-v3"))
        .toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item"),
      root, "part=0", "fg1", T2, T3)
    val q2 = spark.readStream.format("graft-hudi").option("path", root).load()
      .writeStream.format("memory").queryName("hudi_tail_mor")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(2000)
    }
    q2.stop()
    assert(e.toString.contains("MOR log files") ||
      Option(e.getCause).exists(_.toString.contains("MOR log files")))
  }
}
