package graft.apps

import java.nio.file.Files

import graft.SparkSuite
import graft.core.ConfigLayer
import graft.sink.{LakeTable, MergeWriter}

/** CurationApp funnel: every stage driven from config, sink is a keyed
  * lake table. */
class CurationAppSpec extends SparkSuite {

  import spark.implicits._

  private def docsDF = Seq(
    // survives everything (en, long enough, unique, clean)
    (1L, ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"), "en", "s1"),
    // exact duplicate of 1 → keep-first drops it
    (2L, ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"), "en", "s1"),
    // too short → min.tokens filter
    (3L, "tiny doc", "en", "s1"),
    // boilerplate: one bigram dominates → repetition filter
    (4L, Seq.fill(12)("spam ham").mkString(" "), "en", "s1"),
    // survives (different source)
    (5L, ("uno dos tres cuatro cinco seis siete ocho nueve diez once doce " +
      "trece catorce quince uno2 dos2 tres2 cuatro2 cinco2"), "en", "s2"))
    .toDF("doc_id", "text", "lang", "source")

  test("funnel: quality, repetition, dedup stages from config; lake sink") {
    val src = Files.createTempDirectory("graft-capp-src").toString
    val tbl = Files.createTempDirectory("graft-capp-tbl").toString
    docsDF.write.mode("overwrite").parquet(src)
    val conf = ConfigLayer(Map(
      "graft.curation.min.tokens" -> "5",
      "hoodie.datasource.write.recordkey.field" -> "doc_id",
      "hoodie.datasource.write.precombine.field" -> "doc_id"))
    CurationApp.sync(spark, conf,
      Map("source" -> src, "table-path" -> tbl))
    val table = LakeTable(tbl, "t", Seq("doc_id"), "doc_id")
    val ids = MergeWriter.readView(spark, table)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 5L))
  }

  test("pii.scrub masks text first, so PII-differing duplicates collapse") {
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge by the river bank today"
    val d = Seq(
      (1L, s"$base reach me at alice@example.com", "en", "s1"),
      (2L, s"$base reach me at bob@other.org", "en", "s1"), // same after scrub
      (3L, s"$base completely different tail words here", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val conf = ConfigLayer(Map(
      "graft.curation.pii.scrub" -> "true",
      "graft.curation.min.tokens" -> "5"))
    val out = CurationApp.curate(spark, d, conf)
    val rows = out.select("doc_id", "text").as[(Long, String)].collect().toMap
    // doc 2 deduped away (identical to doc 1 post-scrub); text is masked
    assert(rows.keySet === Set(1L, 3L))
    assert(rows(1L).endsWith("reach me at <EMAIL>"))
    // without the stage both survive and PII remains
    val off = CurationApp.curate(spark, d, ConfigLayer(Map(
      "graft.curation.min.tokens" -> "5")))
    assert(off.count() === 3L)
    assert(off.filter($"doc_id" === 1L).select("text").as[String].head()
      .contains("alice@example.com"))
  }

  test("decontamination and per-source budgets from config") {
    val src = Files.createTempDirectory("graft-capp-src2").toString
    val ev = Files.createTempDirectory("graft-capp-ev").toString
    docsDF.write.mode("overwrite").parquet(src)
    // eval set shares doc 5's 4-grams → decontamination drops doc 5
    docsDF.filter($"doc_id" === 5L).write.mode("overwrite").parquet(ev)
    val conf = ConfigLayer(Map(
      "graft.curation.min.tokens" -> "5",
      "graft.curation.eval.path" -> ev,
      "graft.curation.ngram" -> "4",
      "graft.curation.budget.default" -> "1000"))
    val out = CurationApp.curate(spark, spark.read.parquet(src), conf)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L))
    // budget 0 for s1 drops doc 1 too
    val conf2 = ConfigLayer(conf.entries +
      ("graft.curation.budget.s1" -> "0"))
    val out2 = CurationApp.curate(spark, spark.read.parquet(src), conf2)
      .select("doc_id").as[Long].collect().toSet
    assert(out2 === Set.empty[Long])
  }
}
