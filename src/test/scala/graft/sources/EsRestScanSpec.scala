package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.apps.EsImport
import graft.core.ConfigLayer

/** Live ES read path against an in-process loopback server speaking the
  * real `_search` + sliced-scroll wire protocol — the closest a zero-egress
  * sandbox gets to a cluster: the client code is production-shaped and only
  * the `es.nodes` URL differs. */
class EsRestScanSpec extends SparkSuite {

  import spark.implicits._

  private val mapper = new ObjectMapper()

  /** Loopback "cluster": fixture docs behind `_search`/scroll with
    * server-side slicing (`doc_idx % max == id`), `term` filtering and
    * pagination. Records the last search body + auth header so specs can
    * prove the query shipped server-side. */
  private def fixtureDocs: Seq[String] = (0 until 10).map(i =>
    s"""{"k":$i,"cat":"${if (i % 2 == 0) "a" else "b"}","name":"doc$i"}""")

  test("sliced scroll drains the whole index across partitions and pages") {
    val es = new EsLoopback(fixtureDocs)
    try {
      val df = EsRestScan.scan(spark, es.url, "idx", pageSize = 3, slices = 2)
      val rows = df.select("k", "cat").as[(Long, String)].collect().toSet
      assert(rows === (0 until 10).map(i =>
        (i.toLong, if (i % 2 == 0) "a" else "b")).toSet)
      assert(es.scrollCalls.get() > 0, "pagination never used the scroll API")
    } finally es.stop()
  }

  test("the query body ships server-side (term filter runs on the cluster)") {
    val es = new EsLoopback(fixtureDocs)
    try {
      val df = EsRestScan.scan(spark, es.url, "idx",
        query = """{"query":{"term":{"cat":"a"}}}""", pageSize = 2, slices = 2)
      assert(df.select("k").as[Long].collect().toSet === Set(0L, 2L, 4L, 6L, 8L))
      assert(es.lastSearchBody.get().contains("\"term\""),
        s"query body never reached the server: ${es.lastSearchBody.get()}")
    } finally es.stop()
  }

  test("live path trusts the server for es.query — server-only DSL types pass") {
    // a `match` query is outside the analog compiler's coverage; before
    // round 5 the live path re-compiled es.query client-side and threw on
    // it even though the cluster had already applied the filter
    val es = new EsLoopback(fixtureDocs)
    try {
      val conf = ConfigLayer(Map(
        "hoodie.deltastreamer.es.extra.options.es.nodes" -> es.url,
        "hoodie.deltastreamer.es.extra.options.es.query" ->
          """{"query":{"match":{"name":"doc"}}}"""))
      val df = EsImport.readSource(spark, conf, Map("resource" -> "idx"))
      assert(df.count() === 10L) // loopback treats match as match-all
      assert(es.lastSearchBody.get().contains("\"match\""),
        "query body never reached the server")
    } finally es.stop()
  }

  test("basic auth forwards; EsImport es.nodes routes the live path end-to-end") {
    val es = new EsLoopback(fixtureDocs)
    try {
      val conf = ConfigLayer(Map(
        "hoodie.deltastreamer.es.extra.options.es.nodes" -> es.url,
        "hoodie.deltastreamer.es.extra.options.es.query" ->
          """{"query":{"term":{"cat":"b"}}}""",
        "hoodie.deltastreamer.es.extra.options.es.scroll.size" -> "4",
        "hoodie.deltastreamer.es.extra.options.es.read.slices" -> "2",
        "hoodie.deltastreamer.es.extra.options.es.net.http.auth.user" -> "elastic",
        "hoodie.deltastreamer.es.extra.options.es.net.http.auth.pass" -> "s3cret",
        "hoodie.deltastreamer.es.extra.options.es.read.field.include" -> "k,name"))
      val df = EsImport.readSource(spark, conf, Map("resource" -> "idx"))
      // include-pruning applies on top of the live read
      assert(df.columns.toSet === Set("k", "name"))
      assert(df.select("k").as[Long].collect().toSet === Set(1L, 3L, 5L, 7L, 9L))
      val expected = java.util.Base64.getEncoder.encodeToString(
        "elastic:s3cret".getBytes(StandardCharsets.UTF_8))
      assert(es.lastAuthHeader.get() === s"Basic $expected")
    } finally es.stop()
  }
}
