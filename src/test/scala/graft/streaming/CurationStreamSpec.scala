package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.sink.{LakeTable, MergeWriter}

/** Streaming corpus ingestion with inline dedup: first-sighting docs land,
  * exact dups (in-batch or vs the standing corpus) don't; replays are
  * idempotent; the stored fingerprint column serves as the dedup index. */
class CurationStreamSpec extends SparkSuite {

  import spark.implicits._

  private def table(): LakeTable = LakeTable(
    path = Files.createTempDirectory("graft-curation").toString,
    tableName = "corpus", recordKeyFields = Seq("doc_id"),
    precombineField = "doc_id")

  private def corpusIds(t: LakeTable): Set[Long] =
    MergeWriter.readView(spark, t).select("doc_id").as[Long].collect().toSet

  test("micro-batches dedup against the corpus and within the batch") {
    val t = table()
    val ckpt = Files.createTempDirectory("graft-curation-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = CurationStream.start(docs, t, ckpt, triggerMs = 0L)
    try {
      in.addData((1L, "alpha beta gamma"), (2L, "delta epsilon"),
        (3L, "alpha beta gamma")) // in-batch dup of 1
      q.processAllAvailable()
      assert(corpusIds(t) === Set(1L, 2L))
      in.addData((4L, "beta alpha gamma gamma"), // fp dup of 1 (token set)
        (5L, "entirely new content"))
      q.processAllAvailable()
      assert(corpusIds(t) === Set(1L, 2L, 5L))
      // fingerprints are stored — the corpus is its own dedup index
      val fps = MergeWriter.readView(spark, t).select("fp").as[String].collect()
      assert(fps.distinct.length === 3)
    } finally q.stop()
  }

  test("near-dup gate: mutated resubmissions drop via the stored LSH bands") {
    val t = table()
    val ckpt = Files.createTempDirectory("graft-curation-ndckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val q = CurationStream.start(docs, t, ckpt, triggerMs = 0L,
      nearDupThresholdTenths = Some(8))
    try {
      in.addData((1L, base), (2L, "wholly different content here"))
      q.processAllAvailable()
      assert(corpusIds(t) === Set(1L, 2L))
      // bands are STORED — the corpus is its own LSH index
      assert(MergeWriter.readView(spark, t).columns.contains("bands"))
      in.addData(
        (3L, base + " tokenX"),          // near-dup of 1 (different fp!)
        (4L, "genuinely novel text that matches nothing at all"))
      q.processAllAvailable()
      assert(corpusIds(t) === Set(1L, 2L, 4L),
        "the mutated resubmission must drop at the near-dup gate")
      // replay safety: re-ingesting the same batch is still a no-op
      CurationStream.ingestBatch(
        Seq((3L, base + " tokenX")).toDF("doc_id", "text"), t,
        nearDupThresholdTenths = Some(8))
      assert(corpusIds(t) === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("near-dup gate: two near-dups in ONE batch keep one deterministic winner") {
    val t = table()
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    // a near-dup PAIR arriving in the same micro-batch (different fps,
    // so the exact-dup election keeps both) — the intra-batch self-join
    // must elect the LOWER id, independent of batch boundaries
    CurationStream.ingestBatch(
      Seq((11L, base + " tail11"), (12L, base + " tail12"),
        (13L, "entirely unrelated text about other things"))
        .toDF("doc_id", "text"), t,
      nearDupThresholdTenths = Some(8))
    assert(corpusIds(t) === Set(11L, 13L),
      "12 near-matches lower-id 11 in the same batch and must drop")
    // the winner then guards the corpus leg: a later near-dup still drops
    CurationStream.ingestBatch(
      Seq((14L, base + " tail14")).toDF("doc_id", "text"), t,
      nearDupThresholdTenths = Some(8))
    assert(corpusIds(t) === Set(11L, 13L))
  }

  test("normalizeText: double-encoded and decomposed resubmissions dedup") {
    val t = table()
    graft.functions.TextFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.functions.col
    val clean = "exposé of the café — final"
    CurationStream.ingestBatch(
      Seq((1L, clean)).toDF("doc_id", "text"), t, normalizeText = true)
    // resubmission 2: the same text double-encoded (mojibake)
    val garbled = Seq(clean).toDF("s")
      .select(graft.functions.TextFunctions.mojibake(col("s")))
      .as[String].collect().head
    // resubmission 3: the same text NFD-decomposed
    val decomposed = java.text.Normalizer.normalize(
      clean, java.text.Normalizer.Form.NFD)
    assert(garbled != clean && decomposed != clean)
    CurationStream.ingestBatch(
      Seq((2L, garbled), (3L, decomposed)).toDF("doc_id", "text"), t,
      normalizeText = true)
    assert(corpusIds(t) === Set(1L),
      "both corrupted spellings must normalize to the stored fingerprint")
  }

  test("restart from checkpoint resumes without reprocessing or duplicating") {
    val t = table()
    val inDir = Files.createTempDirectory("graft-curation-in").toString
    val ckpt = Files.createTempDirectory("graft-curation-ckpt2").toString
    val schema = "doc_id LONG, text STRING"
    def stream() = spark.readStream.schema(schema).json(inDir)

    Files.writeString(java.nio.file.Path.of(inDir, "b1.json"),
      """{"doc_id":1,"text":"alpha beta"}
        |{"doc_id":2,"text":"gamma delta"}""".stripMargin)
    val q1 = CurationStream.start(stream(), t, ckpt, triggerMs = 0L)
    q1.processAllAvailable(); q1.stop()
    assert(corpusIds(t) === Set(1L, 2L))

    // restart against the same checkpoint: only the new file is read;
    // its corpus dup is dropped, its fresh doc lands
    Files.writeString(java.nio.file.Path.of(inDir, "b2.json"),
      """{"doc_id":3,"text":"beta alpha"}
        |{"doc_id":4,"text":"epsilon zeta"}""".stripMargin)
    val q2 = CurationStream.start(stream(), t, ckpt, triggerMs = 0L)
    q2.processAllAvailable(); q2.stop()
    assert(corpusIds(t) === Set(1L, 2L, 4L))
    assert(MergeWriter.readView(spark, t).count() === 3L)
  }

  test("ivfIndexPath maintains the ANN index; replayed batches leave it byte-identical") {
    val t = table()
    val idx = Files.createTempDirectory("graft-curation-ivf").toString
    def vec(i: Long): Array[Float] =
      Array.tabulate(8)(d => math.sin((i * 13 + d) * 0.9).toFloat)
    def batchDf(ids: Seq[Long]) =
      ids.map(i => (i, s"document number $i unique words$i", vec(i)))
        .toDF("doc_id", "text", "embedding")
    // first batch bootstraps the index
    CurationStream.ingestBatch(batchDf(0L until 20L), t, ivfIndexPath = Some(idx))
    assert(new java.io.File(s"$idx/_centroids").exists())
    assert(spark.read.parquet(s"$idx/data").count() === 20L)
    // second batch appends only its first-sighting docs (21 is a dup of 1)
    CurationStream.ingestBatch(
      batchDf(Seq(30L, 31L))
        .unionByName(Seq((21L, "document number 1 unique words1", vec(21L)))
          .toDF("doc_id", "text", "embedding")),
      t, ivfIndexPath = Some(idx))
    assert(spark.read.parquet(s"$idx/data").count() === 22L)
    def indexState(): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(idx)).filter(_.getName.endsWith(".parquet")).map { f =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
        f.getPath -> md5.map("%02x".format(_)).mkString
      }.toMap
    }
    val before = indexState()
    // exactly-once: replaying the second batch classifies everything as a
    // corpus dup -> no index write, no table write, files untouched
    CurationStream.ingestBatch(
      batchDf(Seq(30L, 31L))
        .unionByName(Seq((21L, "document number 1 unique words1", vec(21L)))
          .toDF("doc_id", "text", "embedding")),
      t, ivfIndexPath = Some(idx))
    assert(indexState() === before)
    assert(corpusIds(t) === ((0L until 20L) ++ Seq(30L, 31L)).toSet)
    // the index answers probes over the streamed corpus
    val hits = graft.ops.Similarity.ivfTopKIndexed(
      Seq((30L, vec(30L))).toDF("vec_id", "embedding"), idx, k = 3, nprobe = 2)
    val n = hits.count() // approximate: ≥1 neighbor from the probed cells
    assert(n >= 1L && n <= 3L)
  }

  test("scrubPii masks before fingerprinting: PII-only variants dedup together") {
    val t = table()
    CurationStream.ingestBatch(
      Seq((1L, "contact me at alice@example.com for details"),
          (2L, "contact me at bob@other.org for details"), // same post-scrub
          (3L, "totally different content here"))
        .toDF("doc_id", "text"),
      t, scrubPii = true)
    assert(corpusIds(t) === Set(1L, 3L))
    val stored = MergeWriter.readView(spark, t)
      .filter($"doc_id" === 1L).select("text").as[String].head()
    assert(stored === "contact me at <EMAIL> for details")
  }

  test("ingestBatch replay is a no-op (idempotent exactly-once)") {
    val t = table()
    val b = Seq((10L, "one two three"), (11L, "four five six"))
      .toDF("doc_id", "text")
    CurationStream.ingestBatch(b, t)
    val commitAfterFirst = MergeWriter.latestCommit(spark, t)
    CurationStream.ingestBatch(b, t) // replay: everything now corpus_dup
    assert(corpusIds(t) === Set(10L, 11L))
    assert(MergeWriter.latestCommit(spark, t) === commitAfterFirst)
    assert(MergeWriter.readView(spark, t).count() === 2L)
  }
}
