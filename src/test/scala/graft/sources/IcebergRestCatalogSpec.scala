package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Iceberg REST catalog client vs an in-process loopback catalog
  * server: config prefix routing, bearer auth, namespace %1F joining,
  * authoritative metadata-location (stale pointers fail loudly),
  * 404 handling — over a REAL graft-written Iceberg table. */
class IcebergRestCatalogSpec extends SparkSuite {

  import spark.implicits._

  /** Minimal REST catalog: one warehouse, `lake` prefix, bearer-token
    * auth, a fixed namespace/table map to metadata locations. */
  private final class CatalogLoopback(token: String,
                                      tables: Map[String, String]) {
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.CopyOnWriteArrayList[String]()

    private def send(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      x.getResponseHeaders.set("Content-Type", "application/json")
      x.sendResponseHeaders(code, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    }
    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      requests.add(path)
      val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $token")) send(x, 401, """{"error":"no auth"}""")
      else if (path == "/v1/config")
        send(x, 200, """{"overrides":{"prefix":"lake"},"defaults":{}}""")
      else if (path.startsWith("/v1/lake/namespaces/")) {
        val rest = path.stripPrefix("/v1/lake/namespaces/")
        rest.split("/tables/", 2) match {
          case Array(ns, tbl) =>
            tables.get(s"$ns/$tbl") match {
              case Some(loc) => send(x, 200,
                s"""{"metadata-location":"$loc","metadata":{},"config":{}}""")
              case None => send(x, 404,
                """{"error":{"message":"table not found","type":"NoSuchTableException"}}""")
            }
          case _ => send(x, 404, """{"error":"bad route"}""")
        }
      } else send(x, 404, """{"error":"bad route"}""")
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def uri: String = s"http://127.0.0.1:$port"
    def stop(): Unit = server.stop(0)
  }

  private def writeTable(): String = {
    val root = Files.createTempDirectory("restcat").resolve("t").toString
    graft.sink.IcebergWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")).toDF("id", "item"),
      root, Seq("id"), Seq((1, "id", "long"), (2, "item", "string")),
      snapshotId = 1L, sequenceNumber = 1L)
    root
  }

  test("loadTable resolves through config prefix + bearer auth; load reads the table") {
    val root = writeTable()
    val metaLoc = IcebergRead.metadataFile(spark, root).toString
    // getRequestURI.getPath DECODES %1F to the raw unit separator
    val m = new CatalogLoopback("sesame",
      Map("prodcore/events" -> metaLoc))
    try {
      val df = IcebergRestCatalog.load(spark, m.uri, "prod.core.events",
        token = Some("sesame"))
      assert(df.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")))
      // the client hit /v1/config then the prefixed, %1F-joined route
      import scala.jdk.CollectionConverters._
      val paths = m.requests.asScala.toSeq
      assert(paths.head == "/v1/config")
      assert(paths.exists(_.contains("/v1/lake/namespaces/prod%1Fcore/tables/events"))
        || paths.exists(_.contains("/v1/lake/namespaces/prodcore/tables/events")))
    } finally m.stop()
  }

  test("a wrong token is rejected; a missing table is a clean false") {
    val root = writeTable()
    val metaLoc = IcebergRead.metadataFile(spark, root).toString
    val m = new CatalogLoopback("sesame", Map("ns/t" -> metaLoc))
    try {
      val e = intercept[java.io.IOException] {
        IcebergRestCatalog.load(spark, m.uri, "ns.t", token = Some("wrong"))
      }
      assert(e.getMessage.contains("401"))
      assert(IcebergRestCatalog.tableExists(spark, m.uri, Seq("ns"), "t",
        Some("sesame")))
      assert(!IcebergRestCatalog.tableExists(spark, m.uri, Seq("ns"), "nope",
        Some("sesame")))
    } finally m.stop()
  }

  test("a stale catalog pointer (directory moved past it) fails loudly") {
    val root = writeTable()
    val staleLoc = IcebergRead.metadataFile(spark, root).toString
    // advance the table: a second commit writes v2 metadata
    graft.sink.IcebergWrite.upsert(
      Seq((4L, "gear")).toDF("id", "item"),
      root, Seq("id"), Seq((1, "id", "long"), (2, "item", "string")),
      snapshotId = 2L, sequenceNumber = 2L)
    val m = new CatalogLoopback("sesame", Map("ns/t" -> staleLoc))
    try {
      val e = intercept[IllegalArgumentException] {
        IcebergRestCatalog.load(spark, m.uri, "ns.t", token = Some("sesame"))
      }
      assert(e.getMessage.contains("catalog points at"))
    } finally m.stop()
  }
}
