package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.TextOps
import graft.sink.{LakeTable, MergeWriter}

/** Streaming corpus ingestion with inline dedup — the curation funnel as a
  * continuous pipeline: each micro-batch of documents is classified against
  * the standing lake table's stored fingerprint column, only first-sighting
  * docs are keyed-upserted, and the fingerprint rides along as a table
  * column so the corpus IS its own dedup index (no re-fingerprinting of
  * history per batch — the batch-side fingerprints are the only ones
  * computed, and the corpus side ships just its `fp` column through the
  * anti-join).
  *
  * Exactly-once: checkpointed source offsets + idempotent keyed upsert.
  * A replayed micro-batch re-classifies its docs — now present in the
  * table — as corpus dups and writes nothing; even a write that DID repeat
  * would collapse in the upsert's key merge.
  *
  * 100 TB notes: per batch this is one hash-aggregate election over the
  * batch's own fingerprints (batch-sized, not corpus-sized — and map-side
  * combined, so even a skewed batch never windows) plus one anti-join against
  * the corpus fp projection (column-pruned scan; broadcastable while small,
  * shuffle-hash beyond). The upsert itself is MergeWriter's partition-pruned
  * COW/MOR path.
  */
object CurationStream {

  /** One micro-batch: fingerprint, keep-first within the batch, drop docs
    * already in the corpus, upsert the remainder (with their fingerprints).
    * Exposed for tests and for batch backfills — the streaming path and a
    * bulk historical load MUST share ingest semantics or replays diverge.
    *
    * `ivfIndexPath` optionally maintains an at-rest ANN index over the
    * `embCol` vectors of FIRST-SIGHTING docs: the first batch bootstraps it
    * ([[graft.ops.Similarity.writeIvfIndex]]), later batches land through
    * the cell-wise incremental [[graft.ops.Similarity.appendToIvfIndex]].
    * The index write runs BEFORE the table upsert, and both are idempotent
    * on the doc key, so the exactly-once replay story is closed either way
    * a batch dies: replayed-after-upsert batches classify as corpus dups
    * and touch nothing; replayed-before-upsert batches re-append the same
    * vectors into the same cells (byte-identical rewrite) and then upsert. */
  def ingestBatch(batch: DataFrame, table: LakeTable,
                  idCol: String = "doc_id", textCol: String = "text",
                  scrubPii: Boolean = false,
                  ivfIndexPath: Option[String] = None,
                  embCol: String = "embedding",
                  nearDupThresholdTenths: Option[Int] = None,
                  normalizeText: Boolean = false): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    graft.functions.TextFunctions.ensureRegistered(spark)
    // normalize BEFORE fingerprinting: mojibake repair + NFC, so a
    // double-encoded or decomposed resubmission of a stored doc shares
    // its fingerprint and dedups instead of slipping past as new bytes
    val bN = if (normalizeText)
      batch.withColumn(textCol,
        graft.functions.TextFunctions.unicodeNormalize(
          graft.functions.TextFunctions.fixMojibake(col(textCol)), "NFC"))
    else batch
    // scrub BEFORE fingerprinting (mirrors CurationApp's pii.scrub stage):
    // docs differing only in PII share a fingerprint and dedup together
    val b0 = if (scrubPii)
      bN.withColumn(textCol, TextOps.scrubPii(col(textCol))) else bN
    // with the NEAR-DUP gate on, each doc also stores its MinHash LSH
    // band signatures as a table column — the corpus is its own LSH
    // index (no re-banding of history per batch)
    val withFp0 = b0.withColumn("fp", TextOps.fingerprint(col(textCol)))
    val withFp =
      if (nearDupThresholdTenths.isEmpty) withFp0
      else withFp0.withColumn("bands",
        graft.functions.TextFunctions.minhashBandsH(
          graft.functions.TextFunctions.shingleHashes(col(textCol), 3),
          NearDupBands, NearDupRows))
    val view = MergeWriter.readView(spark, table)
    val seen =
      if (view.columns.contains("fp")) view.select(col("fp")).distinct()
      else Seq.empty[String].toDF("fp") // first batch: table not created yet
    // keep-first election within the batch: map-side min aggregate +
    // semi-join back on (fp, id) — unique keys, so a viral duplicate in
    // one micro-batch never serializes through a single window-sort task
    // (the Curation.dedupParagraphs pattern)
    val firsts = withFp.groupBy(col("fp")).agg(min(col(idCol)).as("__keep"))
      .select(col("fp").as("__fp"), col("__keep"))
    // materialized once: the emptiness probe, the index append and the
    // upsert share the pipeline (fingerprint + election + corpus-fp
    // anti-join) instead of running it repeatedly per micro-batch
    val freshExact = withFp
      .join(firsts, col("fp") === col("__fp") && col(idCol) === col("__keep"),
        "left_semi")
      .join(seen, Seq("fp"), "left_anti")
      .localCheckpoint(false)
    val fresh = nearDupThresholdTenths match {
      case None => freshExact
      case Some(th) =>
        dropNearDups(spark, freshExact, view, th, idCol, textCol)
          .localCheckpoint(false)
    }
    val nFresh = fresh.count()
    if (nFresh > 0) {
      ivfIndexPath.foreach { path =>
        require(batch.columns.contains(embCol),
          s"ivfIndexPath set but batch has no '$embCol' column")
        val vecs = fresh.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
        val centroids = new org.apache.hadoop.fs.Path(s"$path/_centroids")
        val exists = centroids.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(centroids)
        if (exists) graft.ops.Similarity.appendToIvfIndex(vecs, path)
        else graft.ops.Similarity.writeIvfIndex(vecs, path,
          nlist = math.max(1, math.min(16L, nFresh)).toInt, iters = 1)
      }
      MergeWriter.upsert(spark, fresh, table)
    }
  }

  /** LSH geometry of the streaming near-dup gate (8 bands × 4 rows —
    * the same defaults as the batch MinHash operators). */
  private val NearDupBands = 8
  private val NearDupRows = 4
  private val NearDupMaxBucket = 1000

  /** Drop batch docs that NEAR-match the standing corpus OR a
    * lower-id doc in the SAME batch. Corpus leg: batch band signatures
    * join the corpus's STORED `bands` column (exploded — a
    * column-pruned scan, no re-banding of history). Intra-batch leg:
    * the batch's own bands self-join (bounded by batch size), so two
    * near-duplicates arriving together keep exactly one deterministic
    * winner — the SemDeDup rule (drop a doc iff some LOWER-id doc
    * matches it), mirroring the exact-dup first-id election; without it
    * dedup quality would depend on where batch boundaries fall.
    * Oversized buckets are capped like the batch LSH operators, and
    * candidates are verified by exact Jaccard — re-shingling ONLY the
    * candidate corpus docs (bounded by candidate count, never
    * corpus-sized work). */
  private def dropNearDups(spark: org.apache.spark.sql.SparkSession,
                           freshExact: DataFrame, view: DataFrame,
                           thresholdTenths: Int,
                           idCol: String, textCol: String): DataFrame = {
    val batchBanded = freshExact.select(col(idCol),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val shB = freshExact.select(col(idCol),
      graft.functions.TextFunctions.shingleHashes(col(textCol), 3).as("sh_a"))
    // --- intra-batch leg: self-join the batch's bands, smaller id wins
    val selfOk = batchBanded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= NearDupMaxBucket)
    val bb = batchBanded.join(selfOk, Seq("band", "bucket"), "left_semi")
    val selfCands = bb.select(col("band"), col("bucket"), col(idCol).as("id_a"))
      .join(bb.select(col("band"), col("bucket"), col(idCol).as("id_b")),
        Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val selfInter = graft.functions.TextFunctions
      .sortedIntersectSizeLong(col("sh_x"), col("sh_y"))
    val selfLosers = selfCands
      .join(shB.select(col(idCol).as("id_a"), col("sh_a").as("sh_x")),
        Seq("id_a"))
      .join(shB.select(col(idCol).as("id_b"), col("sh_a").as("sh_y")),
        Seq("id_b"))
      .select(col("id_b").as(idCol), selfInter.as("i"),
        (size(col("sh_x")) + size(col("sh_y")) - selfInter).as("u"))
      .filter(col("i") * 10 >= col("u") * thresholdTenths && col("u") > 0)
      .select(idCol).distinct()
    // --- corpus leg (absent on the very first batch: no bands column yet)
    val nearDupIds =
      if (!view.columns.contains("bands")) selfLosers
      else {
        val corpusBanded = view.select(col(idCol).as("corpus_id"),
          posexplode(col("bands")).as(Seq("band", "bucket")))
        val okBuckets = corpusBanded.groupBy("band", "bucket")
          .agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= NearDupMaxBucket)
        val candidates = batchBanded
          .join(corpusBanded.join(okBuckets, Seq("band", "bucket"), "left_semi"),
            Seq("band", "bucket"))
          .select(col(idCol), col("corpus_id")).distinct()
        // verify candidates only: batch side re-uses its shingles, the
        // corpus side re-shingles just the candidate docs' text
        val shC = view.select(col(idCol).as("corpus_id"), col(textCol))
          .join(candidates.select("corpus_id").distinct(),
            Seq("corpus_id"), "left_semi")
          .select(col("corpus_id"),
            graft.functions.TextFunctions.shingleHashes(col(textCol), 3)
              .as("sh_b"))
        val inter = graft.functions.TextFunctions
          .sortedIntersectSizeLong(col("sh_a"), col("sh_b"))
        candidates
          .join(shB, Seq(idCol)).join(shC, Seq("corpus_id"))
          .select(col(idCol), inter.as("i"),
            (size(col("sh_a")) + size(col("sh_b")) - inter).as("u"))
          .filter(col("i") * 10 >= col("u") * thresholdTenths && col("u") > 0)
          .select(idCol).distinct()
          .unionByName(selfLosers)
          .distinct()
      }
    freshExact.join(nearDupIds, Seq(idCol), "left_anti")
  }

  /** Continuous ingestion: micro-batch trigger, checkpointed offsets,
    * per-batch [[ingestBatch]]. */
  def start(docs: DataFrame, table: LakeTable, checkpointDir: String,
            triggerMs: Long = 1000L, idCol: String = "doc_id",
            textCol: String = "text", scrubPii: Boolean = false,
            ivfIndexPath: Option[String] = None,
            embCol: String = "embedding",
            nearDupThresholdTenths: Option[Int] = None,
            normalizeText: Boolean = false): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch((b: Dataset[Row], _: Long) =>
        ingestBatch(b, table, idCol, textCol, scrubPii, ivfIndexPath, embCol,
          nearDupThresholdTenths, normalizeText))
      .start()
}
