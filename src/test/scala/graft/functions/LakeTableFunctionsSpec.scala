package graft.functions

import java.nio.file.Files

import graft.SparkSuite
import graft.sink.IcebergWrite.FileEntry

/** SQL-native lake reads: `SELECT ... FROM graft_delta/iceberg/hudi`
  * TVFs resolve to the readers' analyzed plans — time travel via the
  * second argument, pruning and merges identical to the programmatic
  * path. */
class LakeTableFunctionsSpec extends SparkSuite {

  import spark.implicits._

  test("graft_delta TVF: snapshot + versionAsOf from plain SQL") {
    LakeTableFunctions.ensureRegistered(spark)
    val root = Files.createTempDirectory("tvf-delta").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "b")).toDF("id", "item", "par"),
      root, Seq("par"))
    graft.sink.DeltaWrite.replacePartition(
      Seq((1L, "widget-v2", "a")).toDF("id", "item", "par"), root, "par", "a")
    val latest = spark.sql(
      s"SELECT item FROM graft_delta('$root') WHERE id = 1")
      .as[String].collect().toSeq
    assert(latest === Seq("widget-v2"))
    val v0 = spark.sql(
      s"SELECT item FROM graft_delta('$root', 0) WHERE id = 1")
      .as[String].collect().toSeq
    assert(v0 === Seq("widget"))
    // joins/aggregates over the TVF work like any relation
    val n = spark.sql(
      s"SELECT count(*) FROM graft_delta('$root') GROUP BY par ORDER BY 1")
      .as[Long].collect().toSeq
    assert(n === Seq(1L, 1L))
  }

  test("graft_iceberg and graft_hudi TVFs read their formats from SQL") {
    LakeTableFunctions.ensureRegistered(spark)
    // iceberg
    val ice = Files.createTempDirectory("tvf-ice").toString
    val tmp = Files.createTempDirectory("tvf-ice-p")
    Seq((1L, "widget")).toDF("id", "item").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    val data = java.nio.file.Paths.get(ice, "data")
    Files.createDirectories(data)
    Files.copy(part, data.resolve("f1.parquet"))
    graft.sink.IcebergWrite.commitEntries(spark, ice,
      Seq(FileEntry(data.resolve("f1.parquet").toString, 0, 1L)),
      Seq((1, "id", "long"), (2, "item", "string")), snapshotId = 11L)
    assert(spark.sql(s"SELECT item FROM graft_iceberg('$ice')")
      .as[String].collect().toSeq === Seq("widget"))
    // hudi
    val hudi = Files.createTempDirectory("tvf-hudi").toString
    graft.sink.HudiCowWrite.upsert(
      Seq((1L, "bolt")).toDF("id", "item"), hudi, "id", "20240101000000000")
    assert(spark.sql(s"SELECT item FROM graft_hudi('$hudi') WHERE id = 1")
      .as[String].collect().toSeq === Seq("bolt"))
  }

  test("graft_delta TVF resolves a STRING second arg as TIMESTAMP AS OF") {
    LakeTableFunctions.ensureRegistered(spark)
    val root = Files.createTempDirectory("tvf-ts").resolve("t").toString
    graft.sink.DeltaWrite.create(
      Seq((1L, "widget")).toDF("id", "item"), root, Nil)
    // backdate v0's commit file so a mid-2000s timestamp lands between
    // versions deterministically
    val log = java.nio.file.Paths.get(root, "_delta_log",
      f"${0L}%020d.json")
    java.nio.file.Files.setLastModifiedTime(log,
      java.nio.file.attribute.FileTime.fromMillis(
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime))
    graft.sink.DeltaWrite.append(
      Seq((2L, "bolt")).toDF("id", "item"), root)
    val atV0 = spark.sql(
      s"SELECT count(*) FROM graft_delta('$root', '2020-06-01 00:00:00')")
      .as[Long].head
    assert(atV0 === 1L, "the timestamp must resolve to version 0")
    assert(spark.sql(s"SELECT count(*) FROM graft_delta('$root')")
      .as[Long].head === 2L)
  }

  test("graft_iceberg TVF resolves a STRING second arg as a ref (tag)") {
    LakeTableFunctions.ensureRegistered(spark)
    val root = Files.createTempDirectory("tvf-ref").toString
    val fields = Seq((1, "id", "long"), (2, "item", "string"))
    graft.sink.IcebergWrite.upsert(
      Seq((1L, "widget")).toDF("id", "item"), root, Seq("id"), fields,
      snapshotId = 1L, sequenceNumber = 1L)
    graft.sink.IcebergWrite.setRef(spark, root, "v1.0", 1L)
    graft.sink.IcebergWrite.upsert(
      Seq((1L, "widget-v2"), (2L, "bolt")).toDF("id", "item"), root,
      Seq("id"), fields, snapshotId = 2L, sequenceNumber = 2L)
    val tagged = spark.sql(
      s"SELECT item FROM graft_iceberg('$root', 'v1.0')")
      .as[String].collect().toSeq
    assert(tagged === Seq("widget"), "the tag must read the pinned state")
    assert(spark.sql(s"SELECT count(*) FROM graft_iceberg('$root')")
      .as[Long].head === 2L)
  }

  test("graft_iceberg_changelog TVF: upsert/delete history from plain SQL") {
    LakeTableFunctions.ensureRegistered(spark)
    val root = Files.createTempDirectory("tvf-chg").toString
    val fields = Seq((1, "id", "long"), (2, "item", "string"))
    graft.sink.IcebergWrite.upsert(
      Seq((1L, "widget"), (2L, "bolt")).toDF("id", "item"), root,
      Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    graft.sink.IcebergWrite.deleteKeys(Seq(Tuple1(1L)).toDF("id"), root,
      Seq("id"), fields, snapshotId = 2L, sequenceNumber = 2L)
    val rows = spark.sql(
      s"""SELECT version, change_type, count(*) AS n
          FROM graft_iceberg_changelog('$root')
          GROUP BY version, change_type ORDER BY version, change_type""")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows === Seq((1L, "delete", 2L), (1L, "upsert", 2L),
      (2L, "delete", 1L)))
    // the (from, to] slice narrows to exactly the delete snapshot
    val sliced = spark.sql(
      s"""SELECT change_type, id FROM graft_iceberg_changelog('$root', 1, 2)""")
      .as[(String, Long)].collect().toSeq
    assert(sliced === Seq(("delete", 1L)))
  }
}
