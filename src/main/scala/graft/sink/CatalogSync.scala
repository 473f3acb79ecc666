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
  val DatabaseKey = "hoodie.datasource.hive_sync.database"
  val TableKey = "hoodie.datasource.hive_sync.table"

  def maybeSync(spark: SparkSession, conf: ConfigLayer, table: LakeTable): Unit =
    if (conf.getBoolean(EnableKey, default = false)) sync(
      spark,
      conf.getOrElse(DatabaseKey, "default"),
      conf.getOrElse(TableKey, table.tableName),
      table)

  def sync(spark: SparkSession, db: String, name: String, table: LakeTable): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$name`")
    val dataPath = s"${table.path}/data"
    if (table.isPartitioned) {
      // external partitioned parquet table: declare partition columns, then
      // discover partition directories (the MSCK REPAIR path)
      val schema = spark.read.parquet(dataPath).schema
      val partCols = table.partitionFields
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
