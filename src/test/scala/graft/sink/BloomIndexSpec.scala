package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Per-file Bloom key index: no false negatives, real file pruning on
  * point lookups, distributed membership, stale-index fallback. */
class BloomIndexSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-bloom").toString

  /** three append batches = three files with disjoint key ranges. */
  private def table3Files(): LakeTable = {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver")
    for (b <- 0 until 3) {
      val rows = (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"v$i", 1L))
      // one file per batch: per-file blooms are the unit under test
      MergeWriter.append(rows.toDF("id", "v", "ver").repartition(1), t)
    }
    BloomIndex.rebuild(spark, t, expectedKeysPerFile = 100, fpp = 0.001)
    t
  }

  test("sizing follows the standard formulas; membership has no false negatives") {
    val (m, k) = BloomIndex.sizing(100, 0.001)
    assert(m >= 1400 && k >= 7) // -100 ln(.001)/ln2^2 ≈ 1438 bits, k ≈ 10
    // build via the public surface: a one-file table
    val t = LakeTable(tmp(), "t", Seq("id"), "ver")
    MergeWriter.append((0L until 50L).map(i => (i, 1L)).toDF("id", "ver").repartition(1), t)
    BloomIndex.rebuild(spark, t, 100, 0.001)
    val row = BloomIndex.stats(spark, t).get.head()
    val bloom = row.getAs[Array[Byte]]("bloom")
    val (mm, kk) = (row.getAs[Int]("m_bits"), row.getAs[Int]("k_hashes"))
    (0L until 50L).foreach(i =>
      assert(BloomIndex.mightContain(bloom, i.toString, mm, kk), s"false negative: $i"))
  }

  test("point lookup prunes to the files that hold the keys") {
    val t = table3Files()
    assert(BloomIndex.isFresh(spark, t))
    assert(BloomIndex.stats(spark, t).get.count() === 3L)
    // keys from the middle file only
    val pruned = BloomIndex.pruneFilesForKeys(spark, t, Seq("150", "199"))
    assert(pruned.size < 3, s"no pruning: $pruned")
    val got = BloomIndex.readKeys(spark, t, Seq("150", "199"))
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got === Set((150L, "v150"), (199L, "v199")))
    // absent keys: likely zero files, always zero rows
    assert(BloomIndex.readKeys(spark, t, Seq("9999")).isEmpty)
  }

  test("over-threshold survivors route through the broadcast semi-join (no driver file array)") {
    val t = table3Files()
    val joined = BloomIndex.readKeys(spark, t, Seq("150", "199"), maxFileListSize = 0)
    // string match: AQE wraps the tree, collect() can't see into it
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected a broadcast LEFT SEMI join on file_path in:\n$p")
    assert(joined.select("id", "v").as[(Long, String)].collect().toSet
      === Set((150L, "v150"), (199L, "v199")))
    assert(BloomIndex.readKeys(spark, t, Seq("9999"), maxFileListSize = 0).isEmpty)
  }

  test("stale index falls back to the filtered full scan") {
    val t = table3Files()
    MergeWriter.append(Seq((5000L, "new", 1L)).toDF("id", "v", "ver"), t)
    assert(!BloomIndex.isFresh(spark, t))
    val got = BloomIndex.readKeys(spark, t, Seq("5000"))
      .select("v").as[String].collect().toSeq
    assert(got === Seq("new"))
    BloomIndex.rebuild(spark, t, 100, 0.001)
    assert(BloomIndex.isFresh(spark, t))
    assert(BloomIndex.readKeys(spark, t, Seq("5000")).count() === 1L)
  }

  test("composite record keys hash the same concatenation the writer stamps") {
    val t = LakeTable(tmp(), "t", Seq("db", "id"), "ver")
    MergeWriter.append(Seq(("a", 1L, 10L), ("b", 2L, 10L)).toDF("db", "id", "ver"), t)
    BloomIndex.rebuild(spark, t, 100, 0.01)
    val got = BloomIndex.readKeys(spark, t, Seq("a:1"))
      .select("db", "id").as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 1L)))
  }
}
