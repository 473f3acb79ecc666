package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Corpus-curation operators on planted fixtures. */
class CurationSpec extends SparkSuite {

  import spark.implicits._

  test("repetitionProfile: repeated bigram and duplicated tokens counted") {
    val d = Seq(
      (1L, "spam ham spam ham spam ham"),  // "spam ham" x3, "ham spam" x2
      (2L, "all words here are unique"),
      (3L, "solo"))                        // no bigram at all
      .toDF("doc_id", "text")
    val out = Curation.repetitionProfile(d)
      .select("doc_id", "n_tokens", "dup_token_n", "top_bigram_n")
      .as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((6, 4, 3L))) // 6 tokens, 4 duplicated, top bigram x3
    assert(out(2L) === ((5, 0, 1L)))
    assert(out(3L) === ((1, 0, 0L))) // short doc: top_bigram_n coalesced to 0
  }

  test("mixToBudget keeps the greedy md5-ordered prefix per group") {
    // 4 docs x 10 tokens in one source; budget 25 keeps the first 3 docs in
    // md5 order (3rd starts at 20 < 25), drops the 4th (starts at 30)
    val text = Seq.fill(10)("w").mkString(" ")
    val d = Seq((1L, text, "s"), (2L, text, "s"), (3L, text, "s"), (4L, text, "s"))
      .toDF("doc_id", "text", "source")
    val kept = Curation.mixToBudget(d, 25L).select("doc_id").as[Long].collect().toSet
    assert(kept.size === 3)
    // deterministic: same call, same kept set
    val again = Curation.mixToBudget(d, 25L).select("doc_id").as[Long].collect().toSet
    assert(kept === again)
    // per-group budgets are independent
    val two = d.union(Seq((9L, text, "t")).toDF)
    val keptTwo = Curation.mixToBudget(two, 25L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(keptTwo("s") === 3L && keptTwo("t") === 1L)
  }

  test("mixWeighted applies per-source budgets with a default") {
    val text = Seq.fill(10)("w").mkString(" ")
    val d = (1L to 4L).map(i => (i, text, "big")) ++
      (5L to 8L).map(i => (i, text, "small")) ++
      Seq((9L, text, "unknown"))
    val kept = Curation.mixWeighted(d.toDF("doc_id", "text", "source"),
        Map("big" -> 35L, "small" -> 15L), defaultBudget = 0L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept === Map("big" -> 4L, "small" -> 2L)) // unknown: budget 0
  }

  test("incrementalDedup classifies corpus_dup / batch_dup / new") {
    val corpus = Seq((100L, "old content here")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "old content here"),   // corpus_dup
      (2L, "fresh novel stuff"),  // new (and first of its fp in batch)
      (3L, "fresh novel stuff"),  // batch_dup of 2
      (4L, "totally other text")) // new
      .toDF("doc_id", "text")
    val out = Curation.incrementalDedup(batch, corpus)
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "corpus_dup", 2L -> "new",
      3L -> "batch_dup", 4L -> "new"))
  }
}
