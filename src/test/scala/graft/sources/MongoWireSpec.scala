package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.apps.DocImport
import graft.core.ConfigLayer

/** Live Mongo read path against an in-process loopback server speaking
  * the real wire protocol (OP_MSG + BSON find/getMore cursors) — the
  * closest a zero-egress sandbox gets to a mongod; a real URI (plus SCRAM
  * auth) is the production delta. */
class MongoWireSpec extends SparkSuite {

  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def allMsgs(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  private def fixtureDocs: Seq[String] = (0 until 10).map(i =>
    s"""{"k":$i,"cat":"${if (i % 2 == 0) "a" else "b"}","name":"doc$i","score":${i * 1.5}}""")

  test("BSON codec round-trips the JSON-expressible types") {
    val doc = mapper.readTree(
      """{"s":"text","i":3,"l":12345678901234,"d":2.5,"b":true,"n":null,
        |"arr":[1,"two",false],"nested":{"x":1}}""".stripMargin)
    val (back, _) = MongoWire.bsonDecode(MongoWire.bsonEncode(doc), 0)
    assert(back === doc)
  }

  test("find/getMore cursor drains all pages; filter ships server-side") {
    val m = new MongoLoopback(fixtureDocs)
    try {
      val df = MongoWire.scan(spark, m.uri, "fixturedb", "docs", batchSize = 3)
      assert(df.select("k").as[Long].collect().toSet === (0L until 10L).toSet)
      assert(m.getMoreCalls.get() > 0, "pagination never used getMore")
      val filtered = MongoWire.scan(spark, m.uri, "fixturedb", "docs",
        filter = """{"cat":"a"}""", batchSize = 2)
      assert(filtered.select("k").as[Long].collect().toSet === Set(0L, 2L, 4L, 6L, 8L))
      assert(m.lastFilter.get().contains("\"cat\""))
    } finally m.stop()
  }

  test("SCRAM-SHA-256: URI credentials drive the RFC 7677 conversation " +
      "end-to-end; unauthenticated reads are refused") {
    val m = new MongoLoopback(fixtureDocs, requireAuth = Some(("app", "s3kret")))
    try {
      val denied = intercept[Exception](
        MongoWire.scan(spark, m.uri, "fixturedb", "docs").collect())
      assert(allMsgs(denied).contains("requires authentication"))
      val df = MongoWire.scan(spark, m.uriWith("app", "s3kret"),
        "fixturedb", "docs", batchSize = 3)
      assert(df.select("k").as[Long].collect().toSet === (0L until 10L).toSet)
      assert(m.getMoreCalls.get() > 0, "auth must persist across cursor paging")
    } finally m.stop()
  }

  test("SCRAM-SHA-256: a wrong password fails the server's proof check") {
    val m = new MongoLoopback(fixtureDocs, requireAuth = Some(("app", "s3kret")))
    try {
      val e = intercept[Exception](
        MongoWire.scan(spark, m.uriWith("app", "nope"),
          "fixturedb", "docs").collect())
      assert(allMsgs(e).contains("Authentication failed"))
    } finally m.stop()
  }

  test("DocImport goes live on uri+collection; pipeline runs ON the server") {
    val m = new MongoLoopback(fixtureDocs)
    try {
      val conf = ConfigLayer(Map(
        "hoodie.deltastreamer.mongodb.extra.options.uri" -> m.uri,
        "hoodie.deltastreamer.mongodb.extra.options.collection" -> "docs",
        "hoodie.deltastreamer.mongodb.extra.options.batchSize" -> "2",
        "hoodie.deltastreamer.mongodb.extra.options.pipeline" ->
          """[{"$match":{"k":{"$gte":5}}},{"$project":{"k":1,"name":1}},
            |{"$sort":{"k":-1}},{"$limit":3}]""".stripMargin))
      val df = DocImport.readSource(spark, conf, Map("resource" -> "unused"))
      assert(df.columns.toSet === Set("_id", "k", "name") || df.columns.toSet === Set("k", "name"))
      assert(df.select("k").as[Long].collect().toSeq === Seq(9L, 8L, 7L))
      // the pipeline JSON shipped over the wire — stages ran server-side
      assert(m.lastPipeline.get().contains("$match") &&
        m.lastPipeline.get().contains("$lte") === false)
      assert(m.getMoreCalls.get() > 0, "aggregate cursor never paged")
    } finally m.stop()
  }
}
