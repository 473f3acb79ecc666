package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSuite
import graft.sink.IcebergWrite
import graft.sink.IcebergWrite.FileEntry

/** Iceberg partitioned scans: manifest entries carry the file's
  * identity-transform partition tuple (the r102 `partition` struct),
  * and the snapshot reader turns those tuples into typed PARTITION
  * COLUMNS of a single StaticFileIndex scan — so partition predicates
  * prune FILES at planning time, Iceberg's scan-planning contract. */
class IcebergPartitionSpec extends SparkSuite {

  import spark.implicits._

  private val schema = Seq((1, "id", "long"), (2, "qty", "long"),
    (3, "pri", "string"))

  private def dataFile(dir: java.nio.file.Path, name: String,
                       rows: Seq[(Long, Long)]): (String, Long) = {
    val tmp = Files.createTempDirectory("ice-part")
    rows.toDF("id", "qty").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(dir)
    val target = dir.resolve(name)
    Files.copy(part, target)
    (target.toString, Files.size(target))
  }

  test("manifest partition tuples become typed partition columns; files prune") {
    val root = Files.createTempDirectory("iceberg-partitioned").toString
    val data = java.nio.file.Paths.get(root, "data")
    // data files do NOT contain the partition column — values must come
    // from the manifest tuples
    val (f1, s1) = dataFile(data, "a1.parquet", Seq((1L, 10L), (2L, 20L)))
    val (f2, s2) = dataFile(data, "a2.parquet", Seq((3L, 30L)))
    val (f3, s3) = dataFile(data, "b1.parquet", Seq((4L, 40L)))
    IcebergWrite.commitEntries(spark, root, Seq(
      FileEntry(f1, 0, 1L, partition = Seq("pri" -> "A"), sizeInBytes = s1),
      FileEntry(f2, 0, 1L, partition = Seq("pri" -> "A"), sizeInBytes = s2),
      FileEntry(f3, 0, 1L, partition = Seq("pri" -> "B"), sizeInBytes = s3)),
      schema, snapshotId = 1L)

    val df = IcebergRead.snapshot(spark, root)
    assert(df.columns.toSeq === Seq("id", "qty", "pri"), "declared order")
    val rows = df.selectExpr("id", "pri").as[(Long, String)].collect().toSeq.sorted
    assert(rows === Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B")))

    // ONE scan; a pri predicate prunes the file list at planning time
    val pruned = df.where($"pri" === "B")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    } match {
      case Seq(one) => one
      case other => fail(s"expected ONE scan, got ${other.size}")
    }
    assert(pruned.count() === 1L)
    assert(scan.partitionFilters.nonEmpty,
      "pri predicate was not recognized as a partition filter")
    val listed = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).flatMap(_.files)
    assert(listed.size === 1,
      s"partition filter did not prune files at planning time (${listed.size}/3)")
  }

  test("manifest-tuple partition columns survive the delete-merge path") {
    val root = Files.createTempDirectory("iceberg-part-del").toString
    val data = java.nio.file.Paths.get(root, "data")
    // partition column lives ONLY in the manifest tuples
    val (f1, s1) = dataFile(data, "a1.parquet", Seq((1L, 10L), (2L, 20L)))
    val (f2, s2) = dataFile(data, "b1.parquet", Seq((3L, 30L)))
    IcebergWrite.commitEntries(spark, root, Seq(
      FileEntry(f1, 0, 1L, partition = Seq("pri" -> "A"), sizeInBytes = s1),
      FileEntry(f2, 0, 1L, partition = Seq("pri" -> "B"), sizeInBytes = s2)),
      schema, snapshotId = 1L)
    // snapshot 2 adds an equality delete on id=2 — the read now routes
    // through applyDeletes, which must still serve pri from the manifests
    val delTmp = Files.createTempDirectory("ice-part-del")
    Seq(Tuple1(2L)).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(delTmp.toString)
    val delPart = Files.list(delTmp)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(data)
    val delFile = data.resolve("del1.parquet")
    Files.copy(delPart, delFile)
    IcebergWrite.commitEntries(spark, root, Seq(
      FileEntry(delFile.toString, 2, 2L, equalityIds = Seq(1),
        partition = Seq("pri" -> "A"), sizeInBytes = Files.size(delFile))),
      schema, snapshotId = 2L)
    val df = IcebergRead.snapshot(spark, root)
    assert(df.columns.toSeq === Seq("id", "qty", "pri"),
      "declared order with the partition column present, like the " +
        "no-deletes path")
    val rows = df.selectExpr("id", "qty", "pri")
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(rows === Seq((1L, 10L, "A"), (3L, 30L, "B")),
      "id 2 deleted; partition values restored from the manifest tuples")
  }

  test("unpartitioned and transform-partitioned tables fall back to the plain scan") {
    val root = Files.createTempDirectory("iceberg-part-fallback").toString
    val data = java.nio.file.Paths.get(root, "data")
    val (f1, s1) = dataFile(data, "f1.parquet", Seq((1L, 10L)))
    // partition field name "id_bucket" does not resolve in the schema
    // (a bucket[16] transform) — pruning must NOT engage, read stays correct
    IcebergWrite.commitEntries(spark, root, Seq(
      FileEntry(f1, 0, 1L, partition = Seq("id_bucket" -> 3L), sizeInBytes = s1)),
      schema, snapshotId = 1L)
    val df = IcebergRead.snapshot(spark, root)
    assert(df.selectExpr("id").as[Long].collect().toSeq === Seq(1L))
    assert(!df.columns.contains("id_bucket"),
      "a transform partition field must not surface as a column")
  }
}
