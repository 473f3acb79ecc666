package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** File-slice COW upsert: only bloom-matched files are rewritten, results
  * equal the partition-pruned upsert, the index maintains incrementally,
  * and every fallback (missing/stale index, schema evolution) degrades to
  * the plain upsert path. */
class UpsertIndexedSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-upsert-idx").toString

  private def files(t: LakeTable): Set[String] =
    new java.io.File(s"${t.path}/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

  private def build3(): LakeTable = {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver")
    for (b <- 0 until 3) {
      val rows = (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"v$i", 1L))
      MergeWriter.append(rows.toDF("id", "v", "ver").repartition(1), t)
    }
    BloomIndex.rebuild(spark, t, expectedKeysPerFile = 100, fpp = 0.001)
    t
  }

  test("rewrites only the files whose blooms match the batch keys") {
    val t = build3()
    val before = files(t)
    assert(before.size === 3)
    // keys 150/160 live in the middle file; 5000 is brand new
    val batch = Seq((150L, "UP", 2L), (160L, "UP", 2L), (5000L, "NEW", 1L))
      .toDF("id", "v", "ver")
    MergeWriter.upsertIndexed(spark, batch, t, expectedKeysPerFile = 100, fpp = 0.001)
    val after = files(t)
    val untouched = before.intersect(after)
    assert(untouched.size >= 2, s"too many files rewritten: kept $untouched of $before")
    assert((after -- before).nonEmpty, "no new slice written")
    // contents: 301 rows, updates applied, insert present
    val view = MergeWriter.readView(spark, t)
    assert(view.count() === 301L)
    assert(view.filter(col("id") === 150L).select("v").as[String].head() === "UP")
    assert(view.filter(col("id") === 99L).select("v").as[String].head() === "v99")
    assert(view.filter(col("id") === 5000L).select("v").as[String].head() === "NEW")
    // index was maintained incrementally and is still fresh + correct
    assert(BloomIndex.isFresh(spark, t))
    assert(BloomIndex.readKeys(spark, t, Seq("150")).select("v").as[String].head() === "UP")
    assert(BloomIndex.readKeys(spark, t, Seq("5000")).count() === 1L)
  }

  test("insert-only batch appends a slice without touching any file") {
    val t = build3()
    val before = files(t)
    MergeWriter.upsertIndexed(spark, Seq((9000L, "X", 1L)).toDF("id", "v", "ver"),
      t, expectedKeysPerFile = 100, fpp = 0.001)
    val after = files(t)
    assert(before.subsetOf(after), "an existing file was rewritten")
    assert(after.size === before.size + 1)
    assert(MergeWriter.readView(spark, t).count() === 301L)
    assert(BloomIndex.isFresh(spark, t))
  }

  test("matches the plain upsert result exactly") {
    val tIdx = build3()
    val tPlain = build3()
    val batch = Seq((0L, "A", 9L), (250L, "B", 9L), (777L, "C", 1L))
      .toDF("id", "v", "ver")
    MergeWriter.upsertIndexed(spark, batch, tIdx, 100, 0.001)
    MergeWriter.upsert(spark, batch, tPlain)
    val a = MergeWriter.readView(spark, tIdx)
      .select("id", "v", "ver").as[(Long, String, Long)].collect().toSet
    val b = MergeWriter.readView(spark, tPlain)
      .select("id", "v", "ver").as[(Long, String, Long)].collect().toSet
    assert(a === b)
  }

  test("stale index and schema evolution both fall back to plain upsert") {
    val t = build3()
    // make the index stale
    MergeWriter.append(Seq((400L, "x", 1L)).toDF("id", "v", "ver"), t)
    assert(!BloomIndex.isFresh(spark, t))
    MergeWriter.upsertIndexed(spark, Seq((400L, "y", 2L)).toDF("id", "v", "ver"), t)
    assert(MergeWriter.readView(spark, t)
      .filter(col("id") === 400L).select("v").as[String].head() === "y")
    // schema evolution: the new column must land (fallback rewrites fully)
    BloomIndex.rebuild(spark, t, 100, 0.001)
    val evolved = Seq((0L, "z", 9L, "extra")).toDF("id", "v", "ver", "note")
    MergeWriter.upsertIndexed(spark, evolved, t)
    val row = MergeWriter.readView(spark, t).filter(col("id") === 0L)
      .select("v", "note").as[(String, Option[String])].head()
    assert(row === (("z", Some("extra"))))
  }
}
