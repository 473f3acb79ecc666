package graft.sources

import java.nio.file.{Files, Path}

import graft.SparkSuite

/** [[DeltaRead]] against a hand-built `_delta_log`: add/remove replay,
  * partition-value reconstruction, time travel, and the protocol gate. */
class DeltaReadSpec extends SparkSuite {

  import spark.implicits._

  private def writeParquet(dir: Path, rel: String,
                           rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("delta-part")
    rows.toDF("id", "item").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val target = dir.resolve(rel)
    Files.createDirectories(target.getParent)
    Files.copy(part, target)
  }

  private def log(dir: Path, version: Long, lines: String*): Unit = {
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"$version%020d.json"),
      lines.mkString("\n") + "\n")
  }

  private def buildTable(): Path = {
    val root = Files.createTempDirectory("delta-table")
    // v0: metadata (partitioned by dt) + two files
    writeParquet(root, "dt=2024-01-01/part-a.parquet", Seq((1L, "widget"), (2L, "bolt")))
    writeParquet(root, "dt=2024-01-02/part-b.parquet", Seq((3L, "nut")))
    log(root, 0L,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"metaData":{"id":"m1","partitionColumns":["dt"],"format":{"provider":"parquet"}}}""",
      """{"add":{"path":"dt=2024-01-01/part-a.parquet","partitionValues":{"dt":"2024-01-01"},"size":1,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"dt=2024-01-02/part-b.parquet","partitionValues":{"dt":"2024-01-02"},"size":1,"modificationTime":1,"dataChange":true}}""")
    // v1: rewrite part-a (update widget→gadget): remove + add
    writeParquet(root, "dt=2024-01-01/part-c.parquet", Seq((1L, "gadget"), (2L, "bolt")))
    log(root, 1L,
      """{"remove":{"path":"dt=2024-01-01/part-a.parquet","dataChange":true}}""",
      """{"add":{"path":"dt=2024-01-01/part-c.parquet","partitionValues":{"dt":"2024-01-01"},"size":1,"modificationTime":2,"dataChange":true}}""")
    root
  }

  test("snapshot replays add/remove and reconstructs partition columns") {
    val t = buildTable()
    val rows = DeltaRead.snapshot(spark, t.toString)
      .select("id", "item", "dt")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "gadget", "2024-01-01"),
      (2L, "bolt", "2024-01-01"), (3L, "nut", "2024-01-02")))
  }

  test("versionAsOf time travel sees the pre-rewrite file set") {
    val t = buildTable()
    val rows = DeltaRead.snapshot(spark, t.toString, versionAsOf = Some(0L))
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "widget"), (2L, "bolt"), (3L, "nut")))
    assert(DeltaRead.latestVersion(spark, t.toString) === 1L)
  }

  test("newer reader-protocol tables fail loudly, not silently mis-read") {
    val t = buildTable()
    log(t, 2L, """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""")
    val e = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, t.toString))
    assert(e.getMessage.contains("reader version 3"))
    // but time travel BEFORE the upgrade still works
    assert(DeltaRead.snapshot(spark, t.toString, versionAsOf = Some(1L))
      .count() === 3L)
  }

  test("filters push through the union + partition-literal plumbing to parquet") {
    val t = buildTable()
    val df = DeltaRead.snapshot(spark, t.toString)
      .where($"id" > 1L).select("id", "item")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      "data-column filter did not reach the parquet scans:\n" + plan)
    assert(df.count() === 2L)
  }

  test("a non-Delta directory fails with an actionable message") {
    val plain = Files.createTempDirectory("not-delta").toString
    val e = intercept[IllegalArgumentException](
      DeltaRead.snapshot(spark, plain))
    assert(e.getMessage.contains("not a Delta table"))
  }
}
