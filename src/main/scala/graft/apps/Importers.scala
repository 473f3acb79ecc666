package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.ConfigLayer

/** S1-S5 — JDBC importer (reference `HoodieJDBCImporter`). Dialect
  * whitelist (`:140-150`), `--table` vs pushdown `query` (mutually
  * exclusive, S3), partitioned parallel scan + fetchsize + predicate
  * pushdown + sessionInitStatement all ride through the extra-options
  * pass-through (S2/S4/S5) straight into Spark's JDBC source. */
object JdbcImport extends BatchImportApp {

  val Dialects: Set[String] = Set("mysql", "postgresql", "db2", "sqlserver",
    "oracle", "teradata", "h2", "derby", "dm")

  override def module: String = "jdbc"
  override def requiredFlags: Seq[String] = Seq("dialect")

  override def appName(cli: Map[String, String]): String =
    s"graft-jdbc-importer [${cli.getOrElse("dialect", "?")}] [${cli.getOrElse("table", cli.getOrElse("query", "?"))}]"

  override def readSource(spark: SparkSession, conf: ConfigLayer,
                          cli: Map[String, String]): DataFrame = {
    val dialect = cli("dialect").toLowerCase
    require(Dialects.contains(dialect),
      s"Unsupported dialect : ($dialect), supported: ${Dialects.mkString(",")}")
    val extra = conf.stripPrefix(extraOptionsPrefix)
    val withTable = cli.get("table") match {
      case Some(t) =>
        require(!extra.contains("query"),
          "Options 'query' and '--table' can not be specified at the same time")
        extra + ("dbtable" -> t)
      case None => extra
    }
    require(withTable.contains("dbtable") || withTable.contains("query"),
      "Missing configuration : (--table or ...extra.options.query)")
    spark.read.format("jdbc").options(withTable).load()
  }
}

/** S6/S7 — tabular file importer (Excel-analog; reference
  * `HoodieExcelImporter`). The Excel cell-level stack (POI) is out of scope
  * (SURVEY.md §7.3) — the option surface (header, inferSchema, delimiter,
  * timestampFormat, …) is exposed on Spark's tabular readers (csv default;
  * `--format csv|json|parquet`), and `--resource` accepts globs exactly like
  * the reference's partitioned-workbook reads
  * (docs/file/01.Excel Ingestion.md:122-131). */
object FileImport extends BatchImportApp {
  override def module: String = "excel"
  override def requiredFlags: Seq[String] = Seq("resource")

  override def appName(cli: Map[String, String]): String =
    s"graft-file-importer [${cli.getOrElse("resource", "?")}]"

  override def readSource(spark: SparkSession, conf: ConfigLayer,
                          cli: Map[String, String]): DataFrame = {
    val fmt = cli.getOrElse("format", "csv")
    spark.read.format(fmt)
      .options(conf.stripPrefix(extraOptionsPrefix))
      .load(cli("resource"))
  }
}

/** S8-S11 — document importer (Mongo/ES analog; reference
  * `HoodieMongoBatch`/`HoodieEsBatch`). Reads nested JSON documents (the
  * same shapes the connectors produce), with the auto-flatten gate and the
  * full extra-options pass-through; a connector deployment swaps
  * `format("json")` for `format("mongodb"/"es")` with identical downstream
  * semantics (source-side pushdown stays an option concern, S9/S11). */
object DocImport extends BatchImportApp {
  override def module: String = "mongodb"
  override def requiredFlags: Seq[String] = Seq("resource")
  override def autoFlattenKey: Option[String] =
    Some("hoodie.deltastreamer.mongodb.auto.flatten.enable")

  override def appName(cli: Map[String, String]): String =
    s"graft-doc-importer [${cli.getOrElse("resource", "?")}]"

  override def readSource(spark: SparkSession, conf: ConfigLayer,
                          cli: Map[String, String]): DataFrame = {
    val fmt = cli.getOrElse("format", "json")
    spark.read.format(fmt)
      .options(conf.stripPrefix(extraOptionsPrefix))
      .load(cli("resource"))
  }
}
