package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.{DeltaRead, IcebergRead}

/** [[LakeConvert]] — zero-copy metadata conversion between Delta and
  * Iceberg: same parquet bytes, new metadata chain, contents identical
  * through the other format's reader; honest gates for the
  * non-convertible shapes. */
class LakeConvertSpec extends SparkSuite {

  import spark.implicits._

  private def freshDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    Files.delete(d)
    d.toString
  }

  test("deltaToIceberg: Iceberg reader sees the Delta snapshot, zero copy") {
    val root = freshDir("conv-d2i")
    val df = Seq((1L, "widget", 10.5), (2L, "bolt", 2.25), (3L, "nut", 0.75))
      .toDF("id", "item", "price")
    DeltaWrite.create(df, root, Nil)
    val dataFilesBefore = DeltaRead.tableState(spark, root, 0L).live
      .map(_.path).toSet
    LakeConvert.deltaToIceberg(spark, root)
    val viaIceberg = IcebergRead.snapshot(spark, root)
      .select("id", "item", "price").as[(Long, String, Double)]
      .collect().sorted.toSeq
    val viaDelta = DeltaRead.snapshot(spark, root)
      .select("id", "item", "price").as[(Long, String, Double)]
      .collect().sorted.toSeq
    assert(viaIceberg === viaDelta)
    // zero-copy: the Delta log still names the same files (nothing moved)
    assert(DeltaRead.tableState(spark, root, 0L).live.map(_.path).toSet
      === dataFilesBefore)
    // the Iceberg metadata resolves field ids through the converted schema
    val e = intercept[IllegalArgumentException](
      LakeConvert.deltaToIceberg(spark, root, snapshotId = 1L))
    assert(e.getMessage.contains("already committed"),
      "re-converting with the same snapshot id must refuse")
  }

  test("deltaToIceberg converts PARTITIONED tables: values ride the manifest tuples") {
    val part = freshDir("conv-part")
    DeltaWrite.create(
      Seq((1L, "widget", "a"), (2L, "bolt", "a"), (3L, "nut", "b"))
        .toDF("id", "item", "grp"), part, Seq("grp"))
    LakeConvert.deltaToIceberg(spark, part)
    // Delta hive-layout files don't CONTAIN grp — the Iceberg reader
    // must serve it from the converted manifests' partition tuples
    val df = graft.sources.IcebergRead.snapshot(spark, part)
    assert(df.columns.contains("grp"))
    assert(df.selectExpr("id", "grp").as[(Long, String)].collect().toSeq.sorted
      === Seq((1L, "a"), (2L, "a"), (3L, "b")))
    // pruning engages on the converted table too
    val pruned = df.where($"grp" === "b")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(pruned.count() === 1L)
    val listed = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).flatMap(_.files)
    assert(listed.size === 1, s"converted table must prune (${listed.size})")
  }

  test("deltaToIceberg gates: DV-carrying, column-mapped") {
    val dv = freshDir("conv-gate-dv")
    DeltaWrite.create((1L to 10L).map(i => (i, s"i$i")).toDF("id", "item"),
      dv, Nil)
    DeltaWrite.deleteWhere(spark, dv, "id <= 3")
    val e2 = intercept[IllegalArgumentException](
      LakeConvert.deltaToIceberg(spark, dv))
    assert(e2.getMessage.contains("deletion vectors"))
  }

  test("icebergToDelta: Delta reader sees the Iceberg snapshot") {
    val root = Files.createTempDirectory("conv-i2d").toString
    val data = java.nio.file.Paths.get(root, "data")
    def dataFile(name: String, rows: Seq[(Long, String)]): String = {
      val tmp = Files.createTempDirectory("conv-i2d-p")
      rows.toDF("id", "item").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.createDirectories(data)
      Files.copy(part, data.resolve(name))
      data.resolve(name).toString
    }
    IcebergWrite.commitEntries(spark, root, Seq(
      IcebergWrite.FileEntry(dataFile("f1.parquet",
        Seq((1L, "widget"), (2L, "bolt"))), 0, 1L),
      IcebergWrite.FileEntry(dataFile("f2.parquet",
        Seq((3L, "nut"))), 0, 1L)),
      schemaFields = Seq((1, "id", "long"), (2, "item", "string")))
    LakeConvert.icebergToDelta(spark, root)
    val viaDelta = DeltaRead.snapshot(spark, root)
      .select("id", "item").as[(Long, String)].collect().sorted.toSeq
    val viaIceberg = IcebergRead.snapshot(spark, root)
      .select("id", "item").as[(Long, String)].collect().sorted.toSeq
    assert(viaDelta === viaIceberg)
    assert(viaDelta === Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")))
    // an existing _delta_log refuses a second conversion
    val e = intercept[IllegalArgumentException](
      LakeConvert.icebergToDelta(spark, root))
    assert(e.getMessage.contains("already has a _delta_log"))
  }

  test("icebergToDelta gates on v2 delete files") {
    val root = Files.createTempDirectory("conv-i2d-del").toString
    val data = java.nio.file.Paths.get(root, "data")
    val tmp = Files.createTempDirectory("conv-i2d-delp")
    Seq((1L, "widget")).toDF("id", "item").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(data)
    Files.copy(part, data.resolve("f1.parquet"))
    Files.copy(part, data.resolve("d1.parquet"))
    IcebergWrite.commitEntries(spark, root, Seq(
      IcebergWrite.FileEntry(data.resolve("f1.parquet").toString, 0, 1L),
      IcebergWrite.FileEntry(data.resolve("d1.parquet").toString, 2, 2L,
        equalityIds = Seq(2))),
      schemaFields = Seq((1, "id", "long"), (2, "item", "string")))
    val e = intercept[IllegalArgumentException](
      LakeConvert.icebergToDelta(spark, root))
    assert(e.getMessage.contains("delete files"))
  }
}
