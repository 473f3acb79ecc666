package graft.sink

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.HudiRead

/** [[HudiCompact]] — MOR compaction: fold visible logs (updates,
  * inserts, `_hoodie_is_deleted` payloads, 0.9 delete blocks) into new
  * base files at a compaction instant; snapshot identical before/after,
  * post-compaction reads are pure parquet scans, pre-compaction time
  * travel still merges the old logs. */
class HudiCompactSpec extends SparkSuite {

  import spark.implicits._

  private val T1 = "20240101000000000"
  private val T2 = "20240102000000000"
  private val T3 = "20240103000000000"
  private val T4 = "20240104000000000"

  private def rows(data: Seq[(String, String, Long, String, Boolean)]) =
    data.toDF("_hoodie_record_key", "_hoodie_commit_time", "id", "item",
      "_hoodie_is_deleted")

  private def mkTable(): String = {
    val root = Files.createTempDirectory("hudi-compact").toString
    HudiMorWrite.writeBase(
      rows(Seq(("k1", T1, 1L, "widget", false), ("k2", T1, 2L, "bolt", false))),
      root, "part=0", "fg1", T1)
    // T2: update k1, insert k3, payload-delete nothing yet; plus a
    // LOG-ONLY group fg2
    HudiMorWrite.appendLog(
      rows(Seq(("k1", T2, 1L, "gadget", false), ("k3", T2, 3L, "gear", false))),
      root, "part=0", "fg1", T1, T2)
    HudiMorWrite.appendLog(
      rows(Seq(("k7", T2, 7L, "cam", false))),
      root, "part=0", "fg2", T2, T2)
    // T3: hard-delete k2 via a 0.9 delete block
    HudiMorWrite.appendDeleteLog(spark, Seq(("k2", "part=0")),
      root, "part=0", "fg1", T1, T3)
    root
  }

  private def view(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.select("_hoodie_record_key", "item").as[(String, String)]
      .collect().sorted.toSeq

  test("compaction folds logs into new bases; snapshot identical, scan pure") {
    val root = mkTable()
    val before = view(HudiRead.snapshot(spark, root))
    assert(before === Seq(("k1", "gadget"), ("k3", "gear"), ("k7", "cam")))
    val n = HudiCompact.compact(spark, root, T4)
    assert(n === 2, "both log-carrying groups (fg1 + log-only fg2) compact")
    val after = HudiRead.snapshot(spark, root)
    assert(view(after) === before, "compaction must not change the snapshot")
    // post-compaction read is a pure parquet scan — no executor log merge
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") && !plan.contains("ExistingRDD"),
      s"post-compaction snapshot should be a pure file scan:\n$plan")
    // the new base files exist under the compaction instant
    assert(Files.exists(java.nio.file.Paths.get(root, "part=0",
      s"fg1_0-1-2_$T4.parquet")))
    assert(Files.exists(java.nio.file.Paths.get(root, "part=0",
      s"fg2_0-1-2_$T4.parquet")))
    // pre-compaction time travel still merges the old logs (delete at T3
    // invisible at ceiling T2 → k2 alive, k3/k7 inserted)
    assert(view(HudiRead.snapshot(spark, root, asOf = Some(T2))) ===
      Seq(("k1", "gadget"), ("k2", "bolt"), ("k3", "gear"), ("k7", "cam")))
    // incremental across the compaction boundary: rows keep their
    // ORIGINAL commit times (compaction rewrites files, not history)
    val inc = HudiRead.incremental(spark, root, beginInstant = T1)
      .select("_hoodie_record_key").as[String].collect().sorted.toSeq
    assert(inc === Seq("k1", "k3", "k7"))
  }

  test("compaction instant must sort after the timeline; nothing-to-do = 0") {
    val root = mkTable()
    val e = intercept[IllegalArgumentException](
      HudiCompact.compact(spark, root, T2))
    assert(e.getMessage.contains("must sort after"))
    HudiCompact.compact(spark, root, T4)
    // second compaction finds no visible log groups
    assert(HudiCompact.compact(spark, root, "20240105000000000") === 0)
  }
}
