package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite
import graft.sources.EsLoopback

/** `spark.readStream.format("graft-es")` — incremental index tailing by a
  * monotonic cursor field over the real REST protocol: server-side range
  * query, sliced parallel micro-batches, checkpointed resume. */
class EsStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private def fixtureDocs(n: Int): Seq[String] = (1 to n).map(i =>
    s"""{"seq":$i,"name":"doc$i"}""")

  test("tail by cursor: sliced range reads deliver each doc exactly once") {
    val es = new EsLoopback(fixtureDocs(12))
    try {
      val q = spark.readStream.format("graft-es")
        .option("nodes", es.url).option("index", "idx")
        .option("cursorField", "seq").option("pageSize", 4)
        .option("slices", 3)
        .load()
        .writeStream.format("memory").queryName("es_tail")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("es_tail").select("cursor").as[Long]
        .collect().toSeq.sorted
      assert(rows === (1L to 12L))
      // the range went to the SERVER as a range query
      assert(es.lastRangeBody.get().contains("\"range\"") &&
        es.lastRangeBody.get().contains("\"gt\""))
    } finally es.stop()
  }

  test("restart resumes AFTER the checkpointed cursor against a grown index") {
    val ckpt = Files.createTempDirectory("graft-es-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long]
    def run(url: String): Unit = {
      val q = spark.readStream.format("graft-es")
        .option("nodes", url).option("index", "idx")
        .option("cursorField", "seq").option("slices", 2)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("cursor").as[Long].collect() }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val es1 = new EsLoopback(fixtureDocs(5))
    try run(es1.url) finally es1.stop()
    assert(seen.synchronized(seen.sorted.toSeq) === (1L to 5L))
    val es2 = new EsLoopback(fixtureDocs(8)) // index grew to 8
    try run(es2.url) finally es2.stop()
    assert(seen.synchronized(seen.sorted.toSeq) === (1L to 8L),
      "restart re-delivered or skipped documents")
  }

  test("basic auth reaches both the probe and the slice reads") {
    val es = new EsLoopback(fixtureDocs(3))
    try {
      val q = spark.readStream.format("graft-es")
        .option("nodes", es.url).option("index", "idx")
        .option("cursorField", "seq")
        .option("user", "elastic").option("password", "pw")
        .load()
        .writeStream.format("memory").queryName("es_auth")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("es_auth").count() === 3)
      assert(es.lastAuthHeader.get().startsWith("Basic "))
    } finally es.stop()
  }
}
