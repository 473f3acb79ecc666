package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.SparkSuite

/** [[HudiRead]] against a hand-built REAL Hudi COW layout: `.hoodie/`
  * timeline instants, `<fileId>_<writeToken>_<instant>.parquet` base
  * files with `_hoodie_*` meta columns, an inflight instant that must be
  * invisible, a COW update rewriting one file group, a clustering
  * replacecommit, and partition directories. */
class HudiReadSpec extends SparkSuite {

  import spark.implicits._

  private val T1 = "20240101090000000"
  private val T2 = "20240102090000000"
  private val T3 = "20240103090000000" // inflight — invisible
  private val T4 = "20240104090000000" // replacecommit (clustering)

  /** Write rows as one Hudi base parquet file. */
  private def baseFile(dir: Path, fileId: String, instant: String,
                       rows: Seq[(String, Long, String)]): Unit = {
    val df = rows.toDF("_hoodie_record_key", "id", "item")
      .withColumn("_hoodie_commit_time",
        org.apache.spark.sql.functions.lit(instant))
    val tmp = Files.createTempDirectory("hudi-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(dir)
    Files.copy(part, dir.resolve(s"${fileId}_0-1-2_$instant.parquet"))
  }

  /** Build the fixture table; returns its path. */
  private def buildTable(withReplace: Boolean = false): String = {
    val root = Files.createTempDirectory("hudi-table")
    val hoodie = root.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.writeString(hoodie.resolve("hoodie.properties"),
      "hoodie.table.name=fixture\nhoodie.table.type=COPY_ON_WRITE\n")
    // t1: fileId A (2 rows) + fileId B (1 row), partition dt=2024-01-01
    val p1 = root.resolve("dt=2024-01-01")
    baseFile(p1, "fgA", T1, Seq(("k1", 1L, "widget"), ("k2", 2L, "bolt")))
    baseFile(p1, "fgB", T1, Seq(("k3", 3L, "nut")))
    Files.writeString(hoodie.resolve(s"$T1.commit"), "{}")
    // t2: COW update of k1 — file group A rewritten WHOLE (k2 carried over
    // with its ORIGINAL commit time, k1 stamped with t2)
    val df2 = Seq(("k1", 1L, "gadget", T2), ("k2", 2L, "bolt", T1))
      .toDF("_hoodie_record_key", "id", "item", "_hoodie_commit_time")
    val tmp2 = Files.createTempDirectory("hudi-part2")
    df2.coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = Files.list(tmp2).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part2, p1.resolve(s"fgA_0-1-2_$T2.parquet"))
    Files.writeString(hoodie.resolve(s"$T2.commit"), "{}")
    // t3: an INFLIGHT commit with a data file already on disk — must be
    // invisible to every read (Hudi's read isolation)
    baseFile(p1, "fgC", T3, Seq(("k9", 9L, "ghost")))
    Files.writeString(hoodie.resolve(s"$T3.commit.inflight"), "")
    if (withReplace) {
      // t4: clustering rewrote group B into group D and replaced B
      baseFile(p1, "fgD", T4, Seq(("k3", 3L, "nut")))
      Files.writeString(hoodie.resolve(s"$T4.replacecommit"),
        s"""{"partitionToReplaceFileIds": {"dt=2024-01-01": ["fgB"]}}""")
    }
    root.toString
  }

  test("snapshot reads the newest file slice per group; inflight invisible") {
    val table = buildTable()
    assert(HudiRead.completedInstants(spark, table) === Seq(T1, T2))
    val rows = HudiRead.snapshot(spark, table)
      .select("_hoodie_record_key", "item", "_hoodie_commit_time")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(("k1", "gadget", T2), ("k2", "bolt", T1),
      ("k3", "nut", T1))) // no k9: its commit is inflight
  }

  test("time travel at t1 sees pre-update values") {
    val table = buildTable()
    val rows = HudiRead.snapshot(spark, table, asOf = Some(T1))
      .select("_hoodie_record_key", "item")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(("k1", "widget"), ("k2", "bolt"), ("k3", "nut")))
  }

  test("incremental pull returns changed rows only, not COW carry-overs") {
    val table = buildTable()
    val rows = HudiRead.incremental(spark, table, beginInstant = T1)
      .select("_hoodie_record_key", "item")
      .as[(String, String)].collect().toSeq
    assert(rows === Seq(("k1", "gadget"))) // k2 was copied, not changed
    // empty range
    assert(HudiRead.incremental(spark, table, beginInstant = T2).count() === 0)
  }

  test("replacecommit clustering hides the replaced file group") {
    val table = buildTable(withReplace = true)
    val rows = HudiRead.snapshot(spark, table)
      .select("_hoodie_record_key", "item")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    // k3 appears ONCE (from fgD), never doubled via the replaced fgB
    assert(rows === Seq(("k1", "gadget"), ("k2", "bolt"), ("k3", "nut")))
    // time travel BEFORE the clustering still reads fgB
    val pre = HudiRead.snapshot(spark, table, asOf = Some(T2))
      .select("_hoodie_record_key").as[String].collect().sorted.toSeq
    assert(pre === Seq("k1", "k2", "k3"))
  }

  test("filters and pruning reach the parquet scan through the slice resolution") {
    val table = buildTable()
    val df = HudiRead.snapshot(spark, table)
      .where($"id" >= 2L).select("id", "item")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,2)]"),
      "filter did not reach the parquet scan:\n" + plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,item:string>"),
      "column pruning lost — meta columns still read:\n" + plan)
    assert(df.count() === 2L)
  }

  test("a non-Hudi directory fails with an actionable message") {
    val plain = Files.createTempDirectory("not-hudi").toString
    val e = intercept[IllegalArgumentException](
      HudiRead.snapshot(spark, plain))
    assert(e.getMessage.contains("not a Hudi table"))
  }
}
