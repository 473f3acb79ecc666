package graft.core

import java.io.InputStreamReader
import java.nio.charset.StandardCharsets
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Layered, typed configuration — the reference's de-facto API surface.
  *
  * Reproduces three behaviors (SURVEY.md H3/T6/W3):
  *  - properties resolution: defaults < `--props` file (local or DFS via
  *    Hadoop FS) < `--conf k=v` CLI overrides (reference: identical `init` in
  *    all five boxers, e.g. HoodieBinlogDeltaStreamer.scala:51-63);
  *  - extra-options projection: keys under a module prefix
  *    (`hoodie.deltastreamer.<src>.extra.options.`) are stripped and forwarded
  *    verbatim to the DataFrameReader, empty values dropped (reference
  *    duplicates this 4x, e.g. HoodieExcelImporter.scala:68-82 — one impl here);
  *  - per-table namespace: `${db}.${table}.<key>` resolution for the
  *    multi-table streaming sink (hoodie_table_meta.properties:1-10,
  *    docs/binlog/01.Binary Logs Ingestion.md:50).
  */
final case class ConfigLayer(entries: Map[String, String]) {

  def get(key: String): Option[String] = entries.get(key)

  def getOrElse(key: String, default: String): String =
    entries.getOrElse(key, default)

  def getBoolean(key: String, default: Boolean): Boolean =
    entries.get(key).map(_.trim.equalsIgnoreCase("true")).getOrElse(default)

  def getInt(key: String, default: Int): Int =
    entries.get(key).map(_.trim.toInt).getOrElse(default)

  /** Required-arg validation (reference H4, e.g. HoodieJDBCImporter.scala:60-73). */
  def requireKey(key: String): String =
    entries.getOrElse(key,
      throw new IllegalArgumentException(s"Missing configuration : ($key)"))

  def requireAll(keys: String*): Unit = keys.foreach(requireKey)

  /** Keys under `prefix`, prefix stripped, empty values dropped (T6). */
  def stripPrefix(prefix: String): Map[String, String] =
    entries.collect {
      case (k, v) if k.startsWith(prefix) && k.length > prefix.length && v.nonEmpty =>
        k.substring(prefix.length) -> v
    }

  /** Per-table config namespace `${db}.${table}.` (W3). */
  def tableNamespace(db: String, table: String): ConfigLayer =
    ConfigLayer(stripPrefix(s"$db.$table."))

  /** Later layer wins. */
  def ++(overrides: ConfigLayer): ConfigLayer =
    ConfigLayer(entries ++ overrides.entries)

  def +(kv: (String, String)): ConfigLayer = ConfigLayer(entries + kv)
}

object ConfigLayer {

  val empty: ConfigLayer = ConfigLayer(Map.empty)

  /** Load a .properties file from a local path or any Hadoop-visible FS
    * (the reference reads props through `FileSystem.open`, so DFS paths work). */
  def fromPropertiesFile(path: String, hadoopConf: Configuration = new Configuration()): ConfigLayer = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    try {
      val props = new Properties()
      props.load(new InputStreamReader(in, StandardCharsets.UTF_8))
      ConfigLayer(props.asScala.toMap)
    } finally in.close()
  }

  /** Parse `k=v` CLI override pairs (reference `--hoodie-conf`). */
  def fromPairs(pairs: Seq[String]): ConfigLayer =
    ConfigLayer(pairs.iterator.map { s =>
      val i = s.indexOf('=')
      require(i > 0, s"config override must be key=value, got: $s")
      s.substring(0, i).trim -> s.substring(i + 1).trim
    }.toMap)

  /** defaults < props file (if any) < CLI overrides. */
  def layered(
      defaults: ConfigLayer = empty,
      propsFile: Option[String] = None,
      overrides: ConfigLayer = empty,
      hadoopConf: Configuration = new Configuration()): ConfigLayer =
    defaults ++ propsFile.fold(empty)(fromPropertiesFile(_, hadoopConf)) ++ overrides
}
