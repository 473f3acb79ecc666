package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process loopback "elasticsearch": `_search` + sliced scroll over
  * fixture docs with term/range query filtering, numeric sort, cursor
  * pagination and basic-auth capture. */
final class EsLoopback(docs: Seq[String]) {
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  private val scrolls = new java.util.concurrent.ConcurrentHashMap[String, (Seq[String], Int, Int)]()
  private val nextId = new AtomicInteger()
  val scrollCalls = new AtomicInteger()
  val lastSearchBody = new AtomicReference[String]("")
  /** last `_search` body carrying a range query (the max-cursor probe
    * overwrites lastSearchBody immediately after each micro-batch). */
  val lastRangeBody = new AtomicReference[String]("")
  val lastAuthHeader = new AtomicReference[String]("")

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
    ex.close()
  }
  private def page(state: (Seq[String], Int, Int), id: String): String = {
    val (filtered, offset, size) = state
    val hits = filtered.slice(offset, offset + size)
    scrolls.put(id, (filtered, offset + hits.length, size))
    s"""{"_scroll_id":${mapper.writeValueAsString(mapper.getNodeFactory.textNode(id))},
       |"hits":{"hits":[${hits.map(h => s"""{"_source":$h}""").mkString(",")}]}}""".stripMargin
  }
  server.createContext("/", (ex: HttpExchange) => {
    val path = ex.getRequestURI.getPath
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .foreach(lastAuthHeader.set)
    (ex.getRequestMethod, path) match {
      case ("POST", p) if p.endsWith("/_search") =>
        lastSearchBody.set(body)
        if (body.contains("\"range\"")) lastRangeBody.set(body)
        val b = mapper.readTree(body)
        val size = Option(b.get("size")).map(_.asInt).getOrElse(10)
        val (sliceId, sliceMax) = Option(b.get("slice"))
          .map(s => (s.get("id").asInt, s.get("max").asInt)).getOrElse((0, 1))
        val term = Option(b.at("/query/term")).filter(!_.isMissingNode)
          .filter(_.isObject).flatMap { t =>
            val f = t.fieldNames(); if (f.hasNext) {
              val name = f.next(); Some(name -> t.get(name).asText)
            } else None
          }
        // {"query":{"range":{f:{"gt":x,"lte":y}}}} — incremental tailing
        val range = Option(b.at("/query/range")).filter(!_.isMissingNode)
          .filter(_.isObject).flatMap { r =>
            val f = r.fieldNames(); if (f.hasNext) {
              val name = f.next(); Some(name -> r.get(name))
            } else None
          }
        def inRange(d: String): Boolean = range.forall { case (f, bounds) =>
          Option(mapper.readTree(d).get(f)).exists { vn =>
            val x = vn.asDouble
            (!bounds.has("gt") || x > bounds.get("gt").asDouble) &&
              (!bounds.has("gte") || x >= bounds.get("gte").asDouble) &&
              (!bounds.has("lt") || x < bounds.get("lt").asDouble) &&
              (!bounds.has("lte") || x <= bounds.get("lte").asDouble)
          }
        }
        val filtered0 = docs.zipWithIndex
          .filter { case (_, i) => i % sliceMax == sliceId }
          .map(_._1)
          .filter(d => term.forall { case (f, v) =>
            Option(mapper.readTree(d).get(f)).exists(_.asText == v) })
          .filter(inRange)
        // [{"f":"desc"}] / [{"f":{"order":"desc"}}] numeric sort
        val filtered = Option(b.get("sort")).filter(_.isArray)
          .filter(_.size > 0).map(_.get(0)).fold(filtered0) { spec =>
            val f = spec.fieldNames().next()
            val desc = (if (spec.get(f).isObject) spec.get(f).get("order").asText
                        else spec.get(f).asText) == "desc"
            val sorted = filtered0.sortBy(d => mapper.readTree(d).get(f).asDouble)
            if (desc) sorted.reverse else sorted
          }
        val id = s"scroll-${nextId.incrementAndGet()}"
        scrolls.put(id, (filtered, 0, size))
        respond(ex, 200, page(scrolls.get(id), id))
      case ("POST", "/_search/scroll") =>
        scrollCalls.incrementAndGet()
        val id = mapper.readTree(body).get("scroll_id").asText
        val state = scrolls.get(id)
        if (state == null) respond(ex, 404, """{"error":"no such scroll"}""")
        else respond(ex, 200, page(state, id))
      case ("DELETE", "/_search/scroll") =>
        respond(ex, 200, """{"succeeded":true}""")
      case other =>
        respond(ex, 400, s"""{"error":"unexpected ${other._1} $path"}""")
    }
  })
  server.start()
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
}

