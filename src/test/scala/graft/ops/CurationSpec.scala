package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Corpus-curation operators on planted fixtures. */
class CurationSpec extends SparkSuite {

  import spark.implicits._

  test("removeBoilerplate drops cross-doc repeated spans, reassembles in order") {
    // span "w0 w1 w2" (3-word chunks) opens docs 0..3 (boilerplate, 4 > 2
    // docs); each doc keeps a unique tail; doc 4 is ALL boilerplate; doc 5
    // shares nothing
    val boiler = "cookie notice here"
    val docs = Seq(
      (0L, s"$boiler alpha beta gamma"),
      (1L, s"$boiler delta epsilon zeta"),
      (2L, s"$boiler eta theta iota"),
      (3L, s"$boiler kappa lambda mu"),
      (4L, boiler),
      (5L, "wholly unique content")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, chunkWords = 3, maxDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, "alpha beta gamma", 2L, 1L),
      (1L, "delta epsilon zeta", 2L, 1L),
      (2L, "eta theta iota", 2L, 1L),
      (3L, "kappa lambda mu", 2L, 1L),
      (4L, "", 1L, 1L), // fully-boilerplate doc survives with empty text
      (5L, "wholly unique content", 1L, 0L)))
  }

  test("removeBoilerplate keeps sub-threshold repeats and multi-chunk order") {
    // the repeated span sits in only 2 docs (<= maxDocs=2): nothing drops,
    // and 3-chunk docs reassemble in original order
    val docs = Seq(
      (0L, "a b c d e f g h i"),
      (1L, "a b c x y z p q r")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, chunkWords = 3, maxDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, "a b c d e f g h i", 3L, 0L),
      (1L, "a b c x y z p q r", 3L, 0L)))
  }

  test("removeBoilerplate keeps null-text docs as one empty-text row") {
    val docs = Seq((0L, "some real content here"), (1L, null))
      .toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, chunkWords = 3, maxDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(0L, 1L)) // null doc does NOT vanish
    assert(out(1)._2 === "") // surfaces as empty text, like all-boilerplate
  }

  test("sampleStratified keeps exactly perStratum rows (fewer when short)") {
    val docs = ((0L until 20L).map(i => (i, "en")) ++
      Seq((100L, "de"), (101L, "de"))).toDF("doc_id", "lang")
    val out = Curation.sampleStratified(docs, 5).select("lang", "doc_id")
      .as[(String, Long)].collect().toSeq
    assert(out.count(_._1 == "en") === 5)
    assert(out.count(_._1 == "de") === 2) // short stratum: all rows kept
    // RNG-free: a second run picks the identical sample
    val again = Curation.sampleStratified(docs, 5).select("lang", "doc_id")
      .as[(String, Long)].collect().toSeq
    assert(out.toSet === again.toSet)
  }

  test("sampleStratified is stable under corpus growth (one displacement max)") {
    val base = (0L until 30L).map(i => (i, "en")).toDF("doc_id", "lang")
    val grown = ((0L until 30L).map(i => (i, "en")) :+ (999L, "en"))
      .toDF("doc_id", "lang")
    val a = Curation.sampleStratified(base, 10).select("doc_id")
      .as[Long].collect().toSet
    val b = Curation.sampleStratified(grown, 10).select("doc_id")
      .as[Long].collect().toSet
    // hash-ranked: the new row either misses the sample entirely or
    // displaces exactly the old rank-10 pick
    assert((a -- b).size <= 1 && (b -- a).size <= 1)
  }

  test("groupRunningSum is bit-identical to the naive per-group window") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i =>
      (i, s"src${rnd.nextInt(3)}", rnd.nextInt(50).toLong))
    val df = rows.toDF("doc_id", "source", "nt")
    val naive = df.withColumn("cum",
      sum(col("nt")).over(
        Window.partitionBy("source").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    val scalable = Curation.groupRunningSum(df, "source",
      Seq(md5(col("doc_id").cast("string")), col("doc_id")), "nt", "cum",
      numPartitions = 7)
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(scalable === naive)
  }

  test("packSequences: md5-ordered concat split into fixed token sequences") {
    val docs = Seq(
      (0L, "s", "a b c"),          // 3 tokens
      (1L, "s", "d e"),            // 2
      (2L, "s", "f g h i j k"),    // 6 — crosses a 4-token boundary
      (3L, "t", "x y")).toDF("doc_id", "source", "text")
    def m(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nt = Map(0L -> 3L, 1L -> 2L, 2L -> 6L)
    // replicate the deterministic order + cumsum for source "s"
    val order = Seq(0L, 1L, 2L).sortBy(i => (m(i), i))
    val starts = order.scanLeft(0L)((acc, i) => acc + nt(i)).init
    val expected = order.zip(starts).map { case (id, st) =>
      id -> ((st / 4, st % 4,
        math.max(1L, math.ceil((st % 4 + nt(id)) / 4.0).toLong)))
    }.toMap
    val out = Curation.packSequences(docs, seqLen = 4)
      .select("doc_id", "seq_in_source", "seq_offset", "n_seqs")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    order.foreach { id =>
      assert(out(id) === expected(id), s"doc $id")
    }
    assert(out(3L) === ((0L, 0L, 1L))) // sole doc of source t starts fresh
    // a 6-token doc starting mid-sequence spans at least 2 sequences
    assert(out(2L)._3 >= 2L)
  }

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

  test("duplicateSpans merges duplicated n-gram windows into maximal spans") {
    // docs 0 and 1 share the 6-word run "p q r s t u" (two overlapping
    // 5-grams -> ONE merged span of 6 words); doc 2 repeats a 5-gram
    // WITHIN itself (both occurrences reported, gap > n keeps them
    // separate islands); doc 3 shares nothing
    val d = Seq(
      (0L, "p q r s t u alpha beta gamma delta"),
      (1L, "zeta p q r s t u eta theta iota"),
      (2L, "m n o v w x0 x1 x2 x3 x4 x5 x6 m n o v w tail"),
      (3L, "wholly unrelated words only here now")).toDF("doc_id", "text")
    val out = Curation.duplicateSpans(d, n = 5).orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 6L, 2L),  // "p q r s t u": grams at pos 0,1 merged
      (1L, 1L, 6L, 2L),  // same run offset by the leading "zeta"
      (2L, 0L, 5L, 1L),  // first "m n o v w"
      (2L, 12L, 5L, 1L)))// second occurrence, own island (gap 12 > 5)
  }

  test("duplicateSpans merges adjacent (gap == n) duplicate windows") {
    // "a1..a5 b1..b5" both duplicated as 5-grams at pos 0 and 5 in doc 0;
    // gap exactly n -> adjacent spans merge into one 10-word span
    val d = Seq(
      (0L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"),
      (1L, "a1 a2 a3 a4 a5 x y z w v"),
      (2L, "b1 b2 b3 b4 b5 q r s t u")).toDF("doc_id", "text")
    val out = Curation.duplicateSpans(d, n = 5).orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.filter(_._1 == 0L) === Seq((0L, 0L, 10L, 2L)))
    assert(out.filter(_._1 == 1L) === Seq((1L, 0L, 5L, 1L)))
    assert(out.filter(_._1 == 2L) === Seq((2L, 0L, 5L, 1L)))
  }

  test("lengthHistogram buckets by integer floor(log2) per source") {
    val d = Seq(
      (0L, "s", Seq.fill(1)("w").mkString(" ")),   // 1 token  -> bucket 0
      (1L, "s", Seq.fill(7)("w").mkString(" ")),   // 7 tokens -> bucket 2
      (2L, "s", Seq.fill(8)("w").mkString(" ")),   // 8 tokens -> bucket 3
      (3L, "t", null))                             // null -> [''] -> 1 -> 0
      .toDF("doc_id", "source", "text")
    val out = Curation.lengthHistogram(d).orderBy("source", "bucket")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("s", 0L, 1L, 1L), ("s", 2L, 1L, 7L), ("s", 3L, 1L, 8L),
      ("t", 0L, 1L, 1L)))
  }

  test("epochShuffle deals a deterministic md5 permutation round-robin") {
    val docs = (0L until 20L).toDF("doc_id")
    val out = Curation.epochShuffle(docs, seed = 7L, nShards = 4)
      .as[(Long, Int, Long)].collect().toSeq
    // every row assigned, shards balanced (20/4 = 5 each), positions dense
    assert(out.size === 20)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet === Set(0, 1, 2, 3))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (0L until 5L)) }
    // replay is bit-identical; a different seed permutes differently
    val again = Curation.epochShuffle(docs, seed = 7L, nShards = 4)
      .as[(Long, Int, Long)].collect().toSeq
    assert(out.toSet === again.toSet)
    val other = Curation.epochShuffle(docs, seed = 8L, nShards = 4)
      .as[(Long, Int, Long)].collect().toSeq
    assert(out.toSet !== other.toSet)
    // matches the naive single-partition rank form exactly
    val naive = docs
      .withColumn("k", md5(concat_ws("-", lit(7L), col("doc_id").cast("string"))))
      .orderBy("k", "doc_id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, rk) => (id, rk % 4, rk.toLong / 4) }.toSet
    assert(out.toSet === naive)
  }

  test("dedupParagraphs keeps the FIRST occurrence of each repeated span") {
    val para = "alpha beta gamma" // 3-word chunk repeated across docs
    val docs = Seq(
      (0L, s"$para one two three"),   // first owner of para
      (1L, s"$para four five six"),   // later copy dropped
      (2L, s"seven eight nine $para"),// later copy dropped (idx 1)
      (3L, para),                     // whole doc is a later copy
      (4L, "unrelated text entirely"))
      .toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(docs, chunkWords = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, s"$para one two three", 2L, 0L), // keeps its own first copy
      (1L, "four five six", 2L, 1L),
      (2L, "seven eight nine", 2L, 1L),
      (3L, "", 1L, 1L),                     // fully-duplicate doc emptied
      (4L, "unrelated text entirely", 1L, 0L)))
  }

  test("dedupParagraphs keeps one copy of a span repeated WITHIN a doc") {
    val docs = Seq((0L, "same words here same words here")).toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(docs, chunkWords = 3)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq((0L, "same words here", 2L, 1L)))
  }

  test("sourceWeights flattens the head: sqrt of exact token ratio vs max") {
    val docs = Seq(
      (0L, "big", Seq.fill(16)("w").mkString(" ")),  // 16 tokens
      (1L, "small", Seq.fill(4)("w").mkString(" "))) // 4 tokens
      .toDF("doc_id", "source", "text")
    val out = Curation.sourceWeights(docs)
      .orderBy("source").as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("big", 1L, 16L, 1.0),            // the max source anchors at 1
      ("small", 1L, 4L, 0.5)))          // sqrt(4/16): flatter than 4/16
    // α=0.5 over-samples the tail relative to proportional share
    assert(0.5 > 4.0 / 16.0)
  }

  test("mixWeighted pluggable counter prices the budget in BPE tokens") {
    // "query" is 1 whitespace token but 3 BPE symbols (qu er y), so the
    // same budget keeps fewer docs under the BPE currency
    val docs = (1L to 10L).map(i => (i, "s", "query"))
      .toDF("doc_id", "source", "text")
    val ws = Curation.mixToBudget(docs, 4L).count()
    val bpe = Curation.mixWeighted(docs, Map.empty, defaultBudget = 4L,
      tokenCount = Some(TextOps.bpeTokenCount(col("text"), graft.SparkEntry.BpeMerges)))
    assert(ws === 4L)
    assert(bpe.count() === 2L) // 3 + 3 tokens fill the 4-token budget
    assert(bpe.select("nt").as[Long].collect().forall(_ === 3L))
  }

  test("corpusDiff classifies added / removed / changed / same") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val v2 = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta")).toDF("doc_id", "text")
    val out = Curation.corpusDiff(v1, v2).as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "same", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
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
