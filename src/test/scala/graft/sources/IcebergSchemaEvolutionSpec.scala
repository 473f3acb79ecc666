package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType, StructField, StructType}

import graft.SparkSuite
import graft.sink.IcebergWrite
import graft.sink.IcebergWrite.FileEntry

/** Schema evolution on read: Iceberg resolves columns BY FIELD ID, so a
  * rename is metadata-only — old data files (written under the old
  * name) must surface their values under the NEW name. The reader
  * detects id-carrying files from one footer and projects through a
  * `parquet.field.id` read schema; id-less fixture files keep the
  * name-based fallback. */
class IcebergSchemaEvolutionSpec extends SparkSuite {

  import spark.implicits._

  /** Write one parquet file whose footer carries Iceberg-style field
    * ids (`parquet.field.id` metadata + the write flag). */
  private def writeWithIds(dir: java.nio.file.Path, name: String,
                           rows: Seq[(Long, String)],
                           names: (String, String)): String = {
    def meta(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id).build()
    val schema = StructType(Seq(
      StructField(names._1, LongType, nullable = true, meta(1)),
      StructField(names._2, StringType, nullable = true, meta(2))))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
    val tmp = Files.createTempDirectory("ice-evo")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(dir)
    Files.copy(part, dir.resolve(name))
    dir.resolve(name).toString
  }

  test("rename is metadata-only: old files read under the new column name") {
    val root = Files.createTempDirectory("iceberg-evolution").toString
    val data = java.nio.file.Paths.get(root, "data")
    // snapshot 1: file written under the ORIGINAL names (id, item)
    val f1 = writeWithIds(data, "f1.parquet", Seq((1L, "widget"), (2L, "bolt")),
      ("id", "item"))
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f1, 0, 1L)),
      Seq((1, "id", "long"), (2, "item", "string")), snapshotId = 11L)
    // rename item -> part_name (same field id 2)
    IcebergWrite.updateSchema(spark, root,
      Seq((1, "id", "long"), (2, "part_name", "string")))
    // snapshot 2: a file written AFTER the rename (new physical name)
    val f2 = writeWithIds(data, "f2.parquet", Seq((3L, "nut")),
      ("id", "part_name"))
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f2, 0, 2L)),
      Seq((1, "id", "long"), (2, "part_name", "string")), snapshotId = 22L)

    val out = IcebergRead.snapshot(spark, root)
    assert(out.columns.toSeq === Seq("id", "part_name"))
    val rows = out.as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(rows === Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")),
      "pre-rename files must surface values under the NEW name via field ids")
  }

  test("graft-iceberg tail emits json keys in the CURRENT schema names") {
    val root = Files.createTempDirectory("iceberg-evolution-tail").toString
    val data = java.nio.file.Paths.get(root, "data")
    val f1 = writeWithIds(data, "f1.parquet", Seq((1L, "widget")), ("id", "item"))
    IcebergWrite.commitEntries(spark, root, Seq(FileEntry(f1, 0, 1L)),
      Seq((1, "id", "long"), (2, "item", "string")), snapshotId = 11L)
    IcebergWrite.updateSchema(spark, root,
      Seq((1, "id", "long"), (2, "part_name", "string")))
    val q = spark.readStream.format("graft-iceberg").option("path", root).load()
      .writeStream.format("memory").queryName("ice_tail_renamed")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("ice_tail_renamed").selectExpr("row")
      .as[String].collect().toSeq
    assert(rows.size === 1)
    assert(rows.head.contains("\"part_name\":\"widget\"") &&
      !rows.head.contains("\"item\""),
      s"pre-rename file must emit the CURRENT name: ${rows.head}")
  }

  test("id-less files keep the name-based fallback") {
    val root = Files.createTempDirectory("iceberg-evolution-fallback").toString
    val data = java.nio.file.Paths.get(root, "data")
    // plain Spark write, no field ids in the footer
    val tmp = Files.createTempDirectory("ice-evo-plain")
    Seq((1L, "widget")).toDF("id", "item").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(data)
    Files.copy(part, data.resolve("f1.parquet"))
    IcebergWrite.commitEntries(spark, root,
      Seq(FileEntry(data.resolve("f1.parquet").toString, 0, 1L)),
      Seq((1, "id", "long"), (2, "item", "string")), snapshotId = 11L)
    val out = IcebergRead.snapshot(spark, root)
    assert(out.columns.toSeq.sorted === Seq("id", "item"))
    assert(out.count() === 1L)
  }
}
