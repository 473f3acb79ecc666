package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite
import graft.sources.MongoLoopback

/** `spark.readStream.format("graft-mongo")` — incremental collection
  * tailing by a monotonic cursor field over the real wire protocol
  * ([[graft.sources.MongoWire]] + [[MongoLoopback]]): server-side range
  * filtering, checkpointed exactly-once delivery across a restart, and
  * growth between micro-batches. */
class MongoStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private def fixtureDocs(n: Int): Seq[String] = (1 to n).map(i =>
    s"""{"seq":$i,"name":"doc$i","grp":"${if (i % 2 == 0) "even" else "odd"}"}""")

  private def stream(uri: String) =
    spark.readStream.format("graft-mongo")
      .option("uri", uri).option("collection", "docs")
      .option("cursorField", "seq").option("batchSize", 3)
      .load()

  test("tail by cursor: all docs delivered once; range ships server-side") {
    val m = new MongoLoopback(fixtureDocs(10))
    try {
      val q = stream(m.uri).writeStream
        .format("memory").queryName("mongo_tail").outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("mongo_tail")
        .select("cursor").as[Long].collect().toSeq.sorted
      assert(rows === (1L to 10L))
      // the range predicate went to the SERVER (find filter, not Spark)
      assert(m.lastFilter.get().contains("$gt") &&
        m.lastFilter.get().contains("$lte"))
      // docs parse downstream with from_json (the Kafka-style contract)
      val parsed = spark.table("mongo_tail").selectExpr(
        "from_json(doc, 'seq LONG, name STRING, grp STRING') AS d")
        .select("d.grp").as[String].collect()
      assert(parsed.count(_ == "even") === 5)
    } finally m.stop()
  }

  test("restart resumes AFTER the checkpointed cursor; new docs picked up") {
    // MongoLoopback snapshots its docs at construction; growth is emulated
    // by a second loopback with more docs under the same checkpoint
    val m = new MongoLoopback(fixtureDocs(6))
    val ckpt = Files.createTempDirectory("graft-mongo-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long]
    def run(uri: String): Unit = {
      val q = stream(uri).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("cursor").as[Long].collect() }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try run(m.uri) finally m.stop()
    assert(seen.synchronized(seen.sorted.toSeq) === (1L to 6L))
    // "the collection grew": a new server with 9 docs, same checkpoint —
    // only 7..9 may be delivered
    val m2 = new MongoLoopback(fixtureDocs(9))
    try run(m2.uri) finally m2.stop()
    assert(seen.synchronized(seen.sorted.toSeq) === (1L to 9L),
      "restart re-delivered or skipped documents")
  }

  test("startAfter skips the retained prefix on first start") {
    val m = new MongoLoopback(fixtureDocs(8))
    try {
      val q = spark.readStream.format("graft-mongo")
        .option("uri", m.uri).option("collection", "docs")
        .option("cursorField", "seq").option("startAfter", 5)
        .load()
        .writeStream.format("memory").queryName("mongo_skip")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("mongo_skip").select("cursor").as[Long]
        .collect().toSeq.sorted === Seq(6L, 7L, 8L))
    } finally m.stop()
  }

  test("SCRAM credentials work across driver (latestOffset) and executor " +
      "(range read) connections") {
    val m = new MongoLoopback(fixtureDocs(4), requireAuth = Some(("app", "pw")))
    try {
      val q = spark.readStream.format("graft-mongo")
        .option("uri", m.uriWith("app", "pw")).option("collection", "docs")
        .option("cursorField", "seq")
        .load()
        .writeStream.format("memory").queryName("mongo_auth")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("mongo_auth").count() === 4)
    } finally m.stop()
  }
}
