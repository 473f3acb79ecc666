package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Client for the Apache Iceberg REST CATALOG protocol (the published
  * `rest-catalog-open-api.yaml` — the catalog surface Nessie, Polaris,
  * Unity, Gravitino and Tabular-style services speak): resolve a table
  * identifier to its authoritative `metadata-location`, then read it
  * through [[IcebergRead]]'s existing snapshot/travel/changelog
  * machinery. Zero new deps — JDK HTTP, Jackson via Spark.
  *
  * Protocol subset (read path):
  *  - `GET /v1/config[?warehouse=w]` → `{overrides, defaults}`; a
  *    `prefix` override prepends a path segment to every later route
  *    (multi-tenant services route this way).
  *  - `GET /v1/{prefix}/namespaces/{ns}/tables/{table}` →
  *    `LoadTableResult{metadata-location, ...}`. Multi-level namespaces
  *    join with the unit separator `%1F` per the spec.
  *  - `Authorization: Bearer <token>` when a token is configured.
  *
  * The catalog's `metadata-location` is AUTHORITATIVE: if the table
  * directory's own resolution (version-hint / highest vN) disagrees,
  * loading fails loudly instead of silently reading a version the
  * catalog has not committed (a stale or split-brain pointer is an
  * operator problem, not something to paper over). */
object IcebergRestCatalog {

  private def mapper = DocPushdown.jsonMapper

  final case class TableRef(root: String, metadataLocation: String)

  /** Resolve `namespace`.`name` through the catalog at `uri`. */
  def loadTable(spark: SparkSession, uri: String, namespace: Seq[String],
                name: String, token: Option[String] = None,
                warehouse: Option[String] = None): TableRef = {
    require(namespace.nonEmpty, "namespace required")
    val base = uri.stripSuffix("/")
    val cfgUrl = base + "/v1/config" +
      warehouse.map(w => s"?warehouse=${enc(w)}").getOrElse("")
    val cfg = mapper.readTree(http(cfgUrl, token))
    val prefix = Seq(Option(cfg.get("overrides")), Option(cfg.get("defaults")))
      .flatten.flatMap(n => Option(n.get("prefix")).map(_.asText()))
      .headOption.filter(_.nonEmpty).map(p => s"${enc(p)}/").getOrElse("")
    val ns = namespace.map(enc).mkString("%1F")
    val res = mapper.readTree(http(
      s"$base/v1/${prefix}namespaces/$ns/tables/${enc(name)}", token))
    val loc = Option(res.get("metadata-location")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException(
        s"catalog returned no metadata-location for ${namespace.mkString(".")}.$name"))
    val m = loc.lastIndexOf("/metadata/")
    require(m > 0 && loc.endsWith(".metadata.json"),
      s"unexpected metadata-location shape: $loc")
    val root = loc.substring(0, m)
    // the catalog pointer is authoritative — a divergent on-disk
    // resolution is a stale/split-brain pointer, fail loudly
    val resolved = IcebergRead.metadataFile(spark, root).toUri.getPath
    val catalogFile = new org.apache.hadoop.fs.Path(loc).toUri.getPath
    require(resolved == catalogFile,
      s"catalog points at $catalogFile but the table directory resolves " +
        s"to $resolved — refusing to read past (or behind) the catalog's " +
        "committed version; refresh the catalog or repair the pointer")
    TableRef(root, loc)
  }

  /** Load `ident` (`ns.table`, namespaces dot-separated) as a DataFrame
    * — the catalog-addressed sibling of `IcebergRead.snapshot`. */
  def load(spark: SparkSession, uri: String, ident: String,
           token: Option[String] = None,
           warehouse: Option[String] = None): DataFrame = {
    val parts = ident.split('.')
    require(parts.length >= 2, s"ident must be ns.table, got '$ident'")
    val ref = loadTable(spark, uri, parts.init.toSeq, parts.last, token,
      warehouse)
    IcebergRead.snapshot(spark, ref.root)
  }

  def tableExists(spark: SparkSession, uri: String, namespace: Seq[String],
                  name: String, token: Option[String] = None): Boolean =
    try { loadTable(spark, uri, namespace, name, token); true }
    catch { case e: java.io.IOException if e.getMessage.contains("HTTP 404") =>
      false }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private def http(url: String, token: Option[String]): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      conn.setRequestProperty("Accept", "application/json")
      token.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (in == null) "" else
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      if (code >= 400)
        throw new java.io.IOException(s"GET $url -> HTTP $code: ${text.take(500)}")
      text
    } finally conn.disconnect()
  }
}
