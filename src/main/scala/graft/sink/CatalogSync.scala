package graft.sink

import org.apache.spark.sql.SparkSession

import graft.core.ConfigLayer

/** W2 — metastore sync (reference `hoodie.datasource.hive_sync.*`,
  * hudi_mongodb_batch.properties:22-29): after a lake write, register the
  * table (and discover its partitions) in the session catalog so SQL users
  * see it immediately. On a cluster with a Hive metastore the same calls
  * persist; locally they land in the in-memory/derby catalog. */
object CatalogSync {

  val EnableKey = "hoodie.datasource.hive_sync.enable"
  val MetaSyncEnableKey = "hoodie.datasource.meta.sync.enable"
  val DatabaseKey = "hoodie.datasource.hive_sync.database"
  val TableKey = "hoodie.datasource.hive_sync.table"
  val JdbcUrlKey = "hoodie.datasource.hive_sync.jdbcurl"
  val UsernameKey = "hoodie.datasource.hive_sync.username"
  val PasswordKey = "hoodie.datasource.hive_sync.password"
  val PartitionFieldsKey = "hoodie.datasource.hive_sync.partition_fields"
  val PartitionExtractorKey = "hoodie.datasource.hive_sync.partition_extractor_class"

  val NonPartitionedExtractor = "org.apache.hudi.hive.NonPartitionedExtractor"

  /** Full reference option surface (hudi_mongodb_batch.properties:22-29),
    * parsed — not just accepted. Locally the HiveServer2 JDBC route is a
    * no-op (the session catalog IS the metastore), but every key drives the
    * same decision it drives in the reference: extractor class + partition
    * fields select the partitioned-vs-flat DDL; jdbcurl/credentials are the
    * cluster deployment seam, validated here so a bad properties file fails
    * at parse time, not at cluster submit. */
  final case class HiveSyncConfig(
      enabled: Boolean,
      database: String,
      table: Option[String],
      jdbcUrl: Option[String],
      username: Option[String],
      password: Option[String],
      partitionFields: Seq[String],
      partitionExtractorClass: Option[String]) {
    /** NonPartitionedExtractor forces flat DDL regardless of layout. */
    def forcesNonPartitioned: Boolean =
      partitionExtractorClass.contains(NonPartitionedExtractor)
  }

  def parse(conf: ConfigLayer): HiveSyncConfig = {
    val jdbcUrl = conf.get(JdbcUrlKey).map(_.trim).filter(_.nonEmpty)
    jdbcUrl.foreach(u => require(u.startsWith("jdbc:"),
      s"$JdbcUrlKey must be a jdbc: URL, got: $u"))
    HiveSyncConfig(
      // both the hive_sync and the newer meta.sync switches enable the sync
      enabled = conf.getBoolean(EnableKey, default = false) ||
        conf.getBoolean(MetaSyncEnableKey, default = false),
      database = conf.getOrElse(DatabaseKey, "default"),
      table = conf.get(TableKey),
      jdbcUrl = jdbcUrl,
      username = conf.get(UsernameKey),
      password = conf.get(PasswordKey),
      partitionFields = conf.get(PartitionFieldsKey)
        .map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      partitionExtractorClass = conf.get(PartitionExtractorKey).map(_.trim))
  }

  def maybeSync(spark: SparkSession, conf: ConfigLayer, table: LakeTable): Unit = {
    val hs = parse(conf)
    if (hs.enabled) sync(
      spark,
      hs.database,
      hs.table.getOrElse(table.tableName),
      table,
      partitionFieldsOverride =
        if (hs.forcesNonPartitioned) Some(Nil)
        else if (hs.partitionFields.nonEmpty) Some(hs.partitionFields)
        else None)
  }

  def sync(spark: SparkSession, db: String, name: String, table: LakeTable,
           partitionFieldsOverride: Option[Seq[String]] = None): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$name`")
    val dataPath = s"${table.path}/data"
    val partitionFields = partitionFieldsOverride.getOrElse(table.partitionFields)
    if (partitionFields.nonEmpty && table.isPartitioned) {
      // external partitioned parquet table: declare partition columns, then
      // discover partition directories (the MSCK REPAIR path)
      val schema = spark.read.parquet(dataPath).schema
      val partCols = partitionFields
      val dataCols = schema.fields.filterNot(f => partCols.contains(f.name))
      val colsDdl = dataCols.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      val partDdl = partCols.map { p =>
        val t = schema.fields.find(_.name == p).map(_.dataType.sql).getOrElse("STRING")
        s"`$p` $t"
      }.mkString(", ")
      spark.sql(
        s"""CREATE TABLE `$db`.`$name` ($colsDdl)
           |USING PARQUET PARTITIONED BY ($partDdl)
           |LOCATION '$dataPath'""".stripMargin)
      spark.sql(s"MSCK REPAIR TABLE `$db`.`$name`")
    } else {
      spark.sql(
        s"""CREATE TABLE `$db`.`$name`
           |USING PARQUET LOCATION '$dataPath'""".stripMargin)
    }
  }
}
