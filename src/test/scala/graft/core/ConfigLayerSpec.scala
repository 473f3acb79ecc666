package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** H3/T6/W3 — layered properties resolution, extra-options prefix strip,
  * per-table namespace. */
class ConfigLayerSpec extends AnyFunSuite {

  test("layering: defaults < props file < CLI overrides") {
    val f = Files.createTempFile("graft", ".properties")
    Files.writeString(f, "a=file\nb=file\n")
    val layered = ConfigLayer.layered(
      defaults = ConfigLayer(Map("a" -> "default", "c" -> "default")),
      propsFile = Some(f.toString),
      overrides = ConfigLayer.fromPairs(Seq("b=cli")))
    assert(layered.get("a") === Some("file"))
    assert(layered.get("b") === Some("cli"))
    assert(layered.get("c") === Some("default"))
  }

  test("prefix strip drops empty values and keeps suffix keys (T6)") {
    val c = ConfigLayer(Map(
      "hoodie.deltastreamer.excel.extra.options.header" -> "true",
      "hoodie.deltastreamer.excel.extra.options.empty" -> "",
      "hoodie.deltastreamer.excel.extra.options." -> "bare",
      "other.key" -> "x"))
    assert(c.stripPrefix("hoodie.deltastreamer.excel.extra.options.") ===
      Map("header" -> "true"))
  }

  test("per-table namespace resolution (W3)") {
    val c = ConfigLayer(Map(
      "db1.t1.hoodie.datasource.write.recordkey.field" -> "id",
      "db1.t2.hoodie.datasource.write.recordkey.field" -> "other"))
    assert(c.tableNamespace("db1", "t1").get("hoodie.datasource.write.recordkey.field")
      === Some("id"))
  }

  test("requireKey throws the reference's message shape (H4)") {
    val e = intercept[IllegalArgumentException](ConfigLayer.empty.requireKey("missing.key"))
    assert(e.getMessage.contains("missing.key"))
  }

  test("fromPairs rejects malformed overrides") {
    intercept[IllegalArgumentException](ConfigLayer.fromPairs(Seq("novalue")))
  }

  test("LakeTable.fromConfig reads the reference option names") {
    val c = ConfigLayer(Map(
      "hoodie.table.name" -> "orders",
      "hoodie.datasource.write.recordkey.field" -> "id,sub",
      "hoodie.datasource.write.precombine.field" -> "ts",
      "hoodie.datasource.write.partitionpath.field" -> "dt"))
    val t = graft.sink.LakeTable.fromConfig("/tmp/x", c)
    assert(t.tableName === "orders")
    assert(t.recordKeyFields === Seq("id", "sub"))
    assert(t.precombineField === "ts")
    assert(t.partitionFields === Seq("dt"))
    assert(t.tableType === graft.sink.LakeTable.CopyOnWrite)
  }

  test("LakeTable.fromConfig accepts the reference's short hoodie.table.type key") {
    val c = ConfigLayer(Map(
      "hoodie.datasource.write.recordkey.field" -> "id",
      "hoodie.datasource.write.precombine.field" -> "ts",
      "hoodie.table.type" -> "MERGE_ON_READ"))
    assert(graft.sink.LakeTable.fromConfig("/tmp/x", c).tableType
      === graft.sink.LakeTable.MergeOnRead)
  }

  test("CatalogSync.parse reads the full hive_sync option surface (W2)") {
    val c = ConfigLayer(Map(
      "hoodie.datasource.hive_sync.enable" -> "true",
      "hoodie.datasource.meta.sync.enable" -> "true",
      "hoodie.datasource.hive_sync.database" -> "data_import",
      "hoodie.datasource.hive_sync.table" -> "ods_statsGas",
      "hoodie.datasource.hive_sync.jdbcurl" -> "jdbc:hive2://10.0.0.1:10000",
      "hoodie.datasource.hive_sync.username" -> "hive",
      "hoodie.datasource.hive_sync.password" -> "hive",
      "hoodie.datasource.hive_sync.partition_fields" -> "dt, region",
      "hoodie.datasource.hive_sync.partition_extractor_class" ->
        "org.apache.hudi.hive.MultiPartKeysValueExtractor"))
    val hs = graft.sink.CatalogSync.parse(c)
    assert(hs.enabled)
    assert(hs.database === "data_import")
    assert(hs.table === Some("ods_statsGas"))
    assert(hs.jdbcUrl === Some("jdbc:hive2://10.0.0.1:10000"))
    assert(hs.username === Some("hive"))
    assert(hs.password === Some("hive"))
    assert(hs.partitionFields === Seq("dt", "region"))
    assert(!hs.forcesNonPartitioned)
  }

  test("CatalogSync.parse: NonPartitionedExtractor forces flat DDL; bad jdbcurl rejected") {
    val hs = graft.sink.CatalogSync.parse(ConfigLayer(Map(
      "hoodie.datasource.hive_sync.partition_extractor_class" ->
        "org.apache.hudi.hive.NonPartitionedExtractor")))
    assert(hs.forcesNonPartitioned)
    assert(!hs.enabled) // neither enable switch set
    intercept[IllegalArgumentException](graft.sink.CatalogSync.parse(
      ConfigLayer(Map("hoodie.datasource.hive_sync.jdbcurl" -> "thrift://nope"))))
  }

  test("hive_sync round-trip: the reference's own properties file parses unchanged") {
    val ref = "/root/reference/boxer-mongodb/src/test/resources/conf/hudi_mongodb_batch.properties"
    assume(new java.io.File(ref).exists, "reference checkout not present")
    val c = ConfigLayer.fromPropertiesFile(ref)
    val hs = graft.sink.CatalogSync.parse(c)
    assert(hs.enabled)
    assert(hs.database === "data_import")
    assert(hs.table === Some("ods_statsGas"))
    assert(hs.jdbcUrl.exists(_.startsWith("jdbc:hive2://")))
    assert(hs.username === Some("hive"))
    assert(hs.forcesNonPartitioned) // NonPartitionedExtractor in the file
  }
}
