package graft.apps

import scala.util.matching.Regex

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.core.{ConfigLayer, SparkEnv}
import graft.streaming.{BinlogOffset, CdcSource, CdcTableSpec, MultiTableSink}

/** S12/W3 — the streaming CDC app (reference
  * `HoodieBinlogDeltaStreamer`): unbounded change stream filtered by
  * database/table regex patterns, demuxed to per-table lake paths via the
  * `{db}/{table}` path template, checkpoint-resumable, processing-time
  * trigger (default 60 s, `:243-245`).
  *
  * Table registry comes from the `${db}.${table}.` config namespace
  * (hoodie_table_meta.properties:1-10) plus a `schema` DDL key per table:
  *
  * {{{
  * db1.person.schema=id LONG, v STRING, ver LONG
  * db1.person.hoodie.datasource.write.recordkey.field=id
  * db1.person.hoodie.datasource.write.precombine.field=ver
  * }}}
  */
object CdcStreamApp {

  val PathTemplateKey = "option.hoodie.path"

  /** Reference CLI parity (`--binlog-index N --binlog-file-offset P`,
    * HoodieBinlogDeltaStreamer.scala:206-219): a two-part resume position,
    * encoded into the stream's 64-bit offset. None when neither flag is
    * given; each part defaults to 0 when only the other is present. */
  def startOffset(cli: Map[String, String]): Option[BinlogOffset] = {
    val idx = cli.get("binlog-index").map(_.trim.toLong)
    val pos = cli.get("binlog-file-offset").map(_.trim.toLong)
    if (idx.isEmpty && pos.isEmpty) None
    else Some(BinlogOffset(idx.getOrElse(0L), pos.getOrElse(0L)))
  }

  /** comma list → regex alternation (reference `:85`). */
  def patternOf(commaList: String): Regex =
    commaList.split(",").map(_.trim).filter(_.nonEmpty).mkString("|").r

  /** enumerate `${db}.${table}.` table specs present in the config. */
  def tableSpecs(conf: ConfigLayer): Seq[CdcTableSpec] = {
    val names = conf.entries.keys
      .filter(_.endsWith(".schema")).map(_.stripSuffix(".schema"))
      .flatMap { qualified =>
        qualified.split("\\.", 2) match {
          case Array(db, table) => Some((db, table))
          case _ => None
        }
      }.toSeq.distinct.sorted
    names.map { case (db, table) =>
      val ns = conf.tableNamespace(db, table)
      CdcTableSpec(
        db = db, table = table,
        payloadSchema = StructType.fromDDL(ns.requireKey("schema")),
        recordKeyFields = ns.requireKey("hoodie.datasource.write.recordkey.field")
          .split(",").map(_.trim).toSeq,
        precombineField = ns.requireKey("hoodie.datasource.write.precombine.field"),
        partitionFields = ns.get("hoodie.datasource.write.partitionpath.field")
          .map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)).getOrElse(Nil),
        transformerSql = ns.get("hoodie.deltastreamer.transformer.sql"))
    }
  }

  /** The unbounded event source: `--binlog-host` selects the LIVE
    * replication-wire stream (`format("graft-binlog")`, [[graft.streaming
    * .BinlogStreamSource]]) — the reference's actual transport — with the
    * per-table column registry derived from the same `${db}.${table}.`
    * config namespace (binlogs carry positions, not names); otherwise the
    * JSON-lines directory tail. The `--binlog-index`/`--binlog-file-offset`
    * pair positions the server-side dump on the live path (and is applied
    * as a pushed-down offset filter on the file path). */
  def source(spark: org.apache.spark.sql.SparkSession, cli: Map[String, String],
             specs: Seq[CdcTableSpec]): org.apache.spark.sql.DataFrame =
    cli.get("binlog-host") match {
      case Some(host) =>
        val columnsJson = specs.map { s =>
          s""""${s.db}.${s.table}": [${s.payloadSchema.fieldNames
            .map(f => s""""$f"""").mkString(",")}]"""
        }.mkString("{", ",", "}")
        val off = startOffset(cli).getOrElse(BinlogOffset(1L, 4L))
        val basename = cli.getOrElse("binlog-basename", "binlog")
        spark.readStream.format("graft-binlog")
          .option("host", host)
          .option("port", cli.getOrElse("binlog-port", "3306"))
          .option("user", cli.getOrElse("binlog-user", "repl"))
          .option("password", cli.getOrElse("binlog-password", ""))
          .option("serverId", cli.getOrElse("binlog-server-id", "65535"))
          .option("startFile", f"$basename.${off.fileIndex}%06d")
          .option("startPos", math.max(4L, off.filePos).toString)
          .option("maxEventsPerBatch", cli.getOrElse("max-events-per-batch", "10000"))
          .option("columns", columnsJson)
          .load()
      case None => CdcSource.fileStream(spark, cli("source-dir"))
    }

  def main(args: Array[String]): Unit = {
    var cli = Map.empty[String, String]
    var overrides = Vector.empty[String]
    var debug = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--debug" => debug = true
        case "--hoodie-conf" => overrides :+= args(i + 1); i += 1
        case flag if flag.startsWith("--") => cli += flag.stripPrefix("--") -> args(i + 1); i += 1
        case other => throw new IllegalArgumentException(s"unrecognized argument: $other")
      }
      i += 1
    }
    require(cli.contains("source-dir") || cli.contains("binlog-host"),
      "Missing argument : (--source-dir or --binlog-host)")
    require(cli.contains("checkpoint"), "Missing argument : (--checkpoint)")
    val conf = ConfigLayer.layered(
      propsFile = cli.get("props"),
      overrides = ConfigLayer.fromPairs(overrides))
    val dbPattern = patternOf(cli.getOrElse("database-name-pattern", ".*"))
    val tablePattern = patternOf(cli.getOrElse("table-name-pattern", ".*"))
    val specs = tableSpecs(conf).filter(s =>
      dbPattern.matches(s.db) && tablePattern.matches(s.table))
    val appName = s"graft-cdc-streamer-${cli.getOrElse("database-name-pattern", "all")}"
    val spark = SparkEnv.appBuilder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = source(spark, cli, specs)
      .filter(col("db").rlike(dbPattern.regex) && col("table").rlike(tablePattern.regex))
    // resume from a two-part binlog position: order-preserving encoding
    // makes the resume a single pushed-down comparison
    val events = startOffset(cli).fold(raw)(o => raw.filter(col("offset") >= o.encoded))
    val sink = new MultiTableSink(
      conf.getOrElse(PathTemplateKey, cli.getOrElse("path-template", "/tmp/graft/{db}/{table}")),
      specs,
      triggerSeconds = cli.getOrElse("trigger-time", "60").toInt)
    val q = if (debug) sink.startConsole(events, cli("checkpoint"))
            else sink.start(events, cli("checkpoint"))
    q.awaitTermination()
  }
}
