package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S10 live-read path: a JDK-only Elasticsearch REST client speaking the
  * public `_search` + scroll wire protocol (the same exchange the
  * elasticsearch-hadoop connector performs; reference read surface:
  * `boxer-es/.../HoodieEsBatch.scala:102-109`). The zero-egress sandbox has
  * no connector jar and no cluster, so the spec drives this against an
  * in-process loopback HTTP server serving the identical protocol —
  * swapping `nodes` to a real cluster URL is the only production delta.
  *
  * Scale shape: one SLICED scroll per Spark partition (`slice: {id, max}`
  * — ES's server-side partitioner), so an index streams `slices`-wide
  * with `pageSize` docs per round-trip and nothing index-sized ever
  * collects on one executor. The query body ships to the server — filter
  * pushdown happens THERE; [[DocPushdown.esRead]] stays the client-side
  * mirror for the file-backed analog.
  */
object EsRestScan {

  private def mapper = DocPushdown.jsonMapper

  /** Scan `index` into a DataFrame of `_source` documents.
    *
    * @param query  ES search body (`{"query": {...}}` — `_source`
    *               includes honored server-side like the connector)
    * @param schema pass to skip inference (inference re-runs the scan:
    *               `spark.read.json` makes one pass for schema, one for
    *               rows — two scroll contexts)
    * @param auth   basic-auth (user, password) — `es.net.http.auth.*` */
  def scan(spark: SparkSession, nodes: String, index: String,
           query: String = """{"query":{"match_all":{}}}""",
           pageSize: Int = 500, slices: Int = 2,
           auth: Option[(String, String)] = None,
           schema: Option[StructType] = None): DataFrame = {
    require(slices >= 1, "need at least one slice")
    import spark.implicits._
    val base = nodes.stripSuffix("/")
    val docs = spark.range(0, slices, 1, slices).mapPartitions { ids =>
      ids.flatMap(id => scrollSlice(base, index, query, pageSize, id.toInt, slices, auth))
    }
    val reader = schema.foldLeft(spark.read)((r, s) => r.schema(s))
    reader.json(docs)
  }

  /** One non-scroll search round-trip, returning the raw response tree —
    * the streaming source's max-cursor probe (`sort` desc + `size` 1). */
  private[graft] def searchOnce(base: String, index: String, body: String,
                                auth: Option[(String, String)]): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(http("POST", s"${base.stripSuffix("/")}/$index/_search", body, auth))

  /** One slice's scroll as a LAZY page-at-a-time iterator: open with
    * `slice {id, max}`, fetch the next page only when the previous one is
    * consumed — one `pageSize` batch resident in the task at a time, so a
    * multi-GB index never sits in executor heap at once. The server-side
    * context is cleared when the scroll drains. (`private[graft]`: the
    * streaming source's partition reader drives it directly.) */
  private[graft] def scrollSlice(base: String, index: String, query: String,
                          pageSize: Int, sliceId: Int, slices: Int,
                          auth: Option[(String, String)]): Iterator[String] = {
    val body = mapper.readTree(query) match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o
      case _ => throw new IllegalArgumentException(s"es query must be an object: $query")
    }
    body.put("size", pageSize)
    if (slices > 1)
      body.putObject("slice").put("id", sliceId).put("max", slices)
    var resp = mapper.readTree(http("POST",
      s"$base/$index/_search?scroll=1m", mapper.writeValueAsString(body), auth))
    var scrollId = Option(resp.get("_scroll_id")).map(_.asText()).orNull
    var hits = resp.at("/hits/hits").elements()
    var open = true
    def clearContext(): Unit = {
      if (open && scrollId != null)
        try http("DELETE", s"$base/_search/scroll",
          s"""{"scroll_id":[${mapper.writeValueAsString(
            mapper.getNodeFactory.textNode(scrollId))}]}""", auth)
        catch { case _: Exception => () } // best effort, context expires anyway
      open = false
    }
    if (!hits.hasNext) clearContext() // empty result: no paging at all
    new Iterator[String] {
      override def hasNext: Boolean = {
        if (!open) return false
        if (hits.hasNext) return true
        // current page consumed and it was non-empty: page on
        require(scrollId != null, "ES response carried hits but no _scroll_id")
        resp = mapper.readTree(http("POST", s"$base/_search/scroll",
          s"""{"scroll":"1m","scroll_id":${mapper.writeValueAsString(
            mapper.getNodeFactory.textNode(scrollId))}}""", auth))
        scrollId = Option(resp.get("_scroll_id")).map(_.asText()).getOrElse(scrollId)
        hits = resp.at("/hits/hits").elements()
        if (!hits.hasNext) clearContext() // empty page = scroll drained
        open && hits.hasNext
      }
      override def next(): String = mapper.writeValueAsString(hits.next().get("_source"))
    }
  }

  private def http(method: String, url: String, body: String,
                   auth: Option[(String, String)]): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      conn.setRequestProperty("Content-Type", "application/json")
      auth.foreach { case (u, p) =>
        val token = java.util.Base64.getEncoder.encodeToString(
          s"$u:$p".getBytes(StandardCharsets.UTF_8))
        conn.setRequestProperty("Authorization", s"Basic $token")
      }
      if (body != null && body.nonEmpty) {
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        try os.write(body.getBytes(StandardCharsets.UTF_8)) finally os.close()
      }
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (in == null) "" else
        try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      if (code >= 400)
        throw new java.io.IOException(s"$method $url -> HTTP $code: ${text.take(500)}")
      text
    } finally conn.disconnect()
  }
}
