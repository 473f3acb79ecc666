package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the steps between "raw crawl" and "training
  * mix" that aren't per-document scoring ([[TextOps]]) or near-dup detection
  * ([[Dedup]]): repetition filtering, deterministic source mixing to a token
  * budget, and incremental (batch-vs-corpus) dedup.
  *
  * Everything is integer/hash-exact so the DuckDB oracle can replay it
  * bit-for-bit, and everything is one-or-two-shuffle DataFrame logic that
  * survives a 1000-executor corpus: no collects, no windows over the whole
  * corpus (only per-source / per-doc partitions), no UDFs.
  */
object Curation {

  /** Gopher-style repetition signals, integer-exact per document:
    *  - `n_tokens`        total (lowercased, whitespace) tokens
    *  - `dup_token_n`     tokens minus distinct tokens (duplicated mass)
    *  - `top_bigram_n`    occurrences of the document's most frequent word
    *                      bigram (ties irrelevant — count only)
    * A doc is boilerplate-repetitive when `top_bigram_n * 2` covers a large
    * token fraction; thresholding is left to the caller so the signals stay
    * exact. One explode + two hash aggregates, all per-doc keys — scales
    * linearly, no corpus-wide shuffle key. */
  def repetitionProfile(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val toks = TextOps.lowerTokens(col(textCol))
    val stats = df.select(col(idCol), size(toks).as("n_tokens"),
      (size(toks) - size(array_distinct(toks))).as("dup_token_n"))
    // bigrams via explode(sequence)+slice — codegen'd (see decontaminate)
    val bigram = df
      .select(col(idCol), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol), col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(col(idCol), array_join(slice(col("t"), col("i"), lit(2)), " ").as("bg"))
      .groupBy(idCol, "bg").agg(count(lit(1)).as("n"))
      .groupBy(idCol).agg(max(col("n")).as("top_bigram_n"))
    stats.join(bigram, Seq(idCol), "left")
      .withColumn("top_bigram_n", coalesce(col("top_bigram_n"), lit(0L)))
  }

  /** CCNet/C4-style boilerplate-span removal, corpus-wide and exact: split
    * each document into DISJOINT `chunkWords`-token spans, count how many
    * DISTINCT documents each span text occurs in, and drop spans occurring
    * in more than `maxDocs` documents (navigation bars, license headers,
    * cookie banners — the spans that repeat verbatim across a crawl). The
    * surviving spans are reassembled in order; fully-boilerplate documents
    * survive with empty text so downstream length filters decide their
    * fate explicitly.
    *
    * Scale shape: chunking is explode(sequence)+slice (codegen'd, no HOF
    * on the hot path); the count is a two-level hash aggregate keyed by
    * span text; removal is one shuffle anti-join against the (by
    * construction small) hot-span set, which AQE turns into a broadcast
    * when it measures small. The only per-doc state is the doc's own span
    * list — no corpus-global window, no collect. */
  def removeBoilerplate(docs: DataFrame, chunkWords: Int = 10, maxDocs: Int = 10,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkWords > 0 && maxDocs > 0, "chunkWords and maxDocs must be positive")
    // null text coalesces to "" so null-text docs keep the one-output-row-
    // per-doc contract (they'd otherwise vanish through the null explode)
    val chunks = docs
      .select(col(idCol), split(coalesce(col(textCol), lit("")), " ").as("tk"))
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0),
          ceil(size(col("tk")).cast("double") / chunkWords).cast("int") - 1)).as("idx"))
      .select(col(idCol), col("idx"),
        array_join(slice(col("tk"), col("idx") * chunkWords + 1, lit(chunkWords)), " ")
          .as("chunk"))
      // feeds the count AND the anti-join — materialize once, not twice.
      // persist (not localCheckpoint): lineage survives, so an executor
      // loss mid-job recomputes the lost blocks instead of failing the
      // job, and LRU eviction bounds memory across many invocations
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = chunks.groupBy("chunk")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select("chunk")
    val kept = chunks.join(hot, Seq("chunk"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("idx"), col("chunk")))),
          x => x.getField("chunk")), " ").as("text_clean"))
    val totals = chunks.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Per-group inclusive running sum of `valueCol` (non-null) by `order`
    * (a total order within each group) — the 100 TB form of
    * `sum(v) OVER (PARTITION BY g ORDER BY o)`, whose naive window puts
    * each group's ENTIRE stream through ONE task. A pretraining corpus has
    * 5-20 sources at TB scale each: per-source windows serialize each
    * source; this doesn't.
    *
    * Same two-pass range-partitioned construction as
    * [[Ranking.rankWithTotal]], generalized to carry the group key:
    *  1. `repartitionByRange` on (group ++ order) — each task holds a
    *     contiguous slice of one-or-a-few groups, a hot group spreading
    *     over MANY tasks;
    *  2. per-(slice, group) sums — a tiny relation (≤ partitions + groups
    *     rows) — turned into per-slice starting offsets by a window over
    *     THAT relation (≤ partitions rows per group; no driver collect);
    *  3. each slice windows locally by (slice, group) and adds its
    *     broadcast offset.
    * Bit-identical to the naive window form: integer sums over a total
    * order are placement-independent. The ranged frame is persisted so the
    * sum pass and the final pass share one materialization (range
    * boundaries are re-sampled per execution — see Ranking). */
  private[graft] def groupRunningSum(df: DataFrame, groupCol: String,
                                     order: Seq[org.apache.spark.sql.Column],
                                     valueCol: String, outCol: String,
                                     numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(n, (col(groupCol) +: order): _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = ranged.groupBy(col("_pid"), col(groupCol))
      .agg(sum(col(valueCol)).as("_psum"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("_pid"))
    // renamed join keys: this is a derived-from-self join, and identically
    // named attributes would trip the ambiguous-self-join detection
    val offsets = sums
      .withColumn("_offset",
        coalesce(sum(col("_psum")).over(wOff), lit(0L)) -
          coalesce(col("_psum"), lit(0L)))
      .select(col("_pid").as("__pid"), col(groupCol).as("__g"), col("_offset"))
    val localW = Window.partitionBy(col("_pid"), col(groupCol)).orderBy(order: _*)
    ranged
      .join(broadcast(offsets),
        col("_pid") === col("__pid") && col(groupCol) <=> col("__g"))
      .withColumn(outCol, col("_offset") + sum(col(valueCol)).over(localW))
      .drop("_pid", "__pid", "__g", "_offset")
  }

  /** Deterministic token-budget mixing: per `groupCol` (source/domain),
    * keep documents in md5(id) order until the group's token budget is
    * exhausted (a doc is kept iff it STARTS inside the budget — the
    * greedy prefix rule, so the kept set is stable under corpus growth
    * that doesn't reorder hashes). RNG-free: the "random" order is the md5
    * of the id, reproducible across engines and runs.
    *
    * The running sum is the range-partitioned [[groupRunningSum]] — no
    * source ever serializes through one task. Returns kept rows +
    * `cum_tokens`. */
  def mixToBudget(df: DataFrame, budgetTokens: Long,
                  groupCol: String = "source", idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    mixWeighted(df, Map.empty, defaultBudget = budgetTokens,
      groupCol = groupCol, idCol = idCol, textCol = textCol)

  /** Weighted mixing: per-source token budgets (the production mixing
    * pattern — "3 parts wiki to 1 part web" expressed as absolute token
    * budgets per source), unknown sources falling back to
    * `defaultBudget`. Same greedy md5-order prefix rule as
    * [[mixToBudget]]; the budget lookup is a broadcast map literal. */
  def mixWeighted(df: DataFrame, budgets: Map[String, Long],
                  defaultBudget: Long = 0L, groupCol: String = "source",
                  idCol: String = "doc_id", textCol: String = "text",
                  tokenCount: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val budgetExpr =
      if (budgets.isEmpty) lit(defaultBudget)
      else coalesce(
        element_at(
          map(budgets.toSeq.sortBy(_._1)
            .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          col(groupCol)),
        lit(defaultBudget))
    // the budget currency is pluggable: whitespace tokens by default, or
    // any exact integer counter (e.g. TextOps.bpeTokenCount for
    // real-tokenizer budgets)
    val nt = tokenCount
      .getOrElse(size(TextOps.lowerTokens(col(textCol))).cast("long"))
    groupRunningSum(
      df.withColumn("nt", nt.cast("long")),
      groupCol, Seq(md5(col(idCol).cast("string")), col(idCol)),
      "nt", "cum_tokens")
      .filter(col("cum_tokens") - col("nt") < budgetExpr)
  }

  /** Exact-count stratified sampling — keep exactly `perStratum` rows per
    * `stratumCol` value (fewer when the stratum is smaller), RNG-free:
    * rows are ranked within their stratum by `(xxhash64(id), id)`, so the
    * sample is reproducible across runs, engines (the DuckDB oracle
    * replays Spark's XXH64 with the staged 64-bit compiler,
    * `tools/gen_sample_oracle.py`) and corpus growth (a new row displaces
    * at most one old pick per stratum). The within-stratum rank is the
    * range-partitioned [[groupRunningSum]] over a unit column — a
    * one-stratum corpus still spreads over every task, unlike the naive
    * `Window.partitionBy(stratum)` form. */
  def sampleStratified(df: DataFrame, perStratum: Long,
                       stratumCol: String = "lang",
                       idCol: String = "doc_id"): DataFrame = {
    require(perStratum > 0, "perStratum must be positive")
    groupRunningSum(
      df.withColumn("_one", lit(1L)),
      stratumCol, Seq(xxhash64(col(idCol)), col(idCol)),
      "_one", "rnk")
      .filter(col("rnk") <= perStratum)
      .drop("_one")
  }

  /** GPT-style sequence packing: concatenate documents in a deterministic
    * per-source order (md5 of the id — RNG-free, reproducible across
    * engines) and split the token stream into fixed `seqLen`-token
    * training sequences. Emits, per document, the sequence id and token
    * offset where it starts, plus how many sequences it spans — the
    * bookkeeping a packed-pretraining writer needs (documents crossing a
    * boundary continue in the next sequence; real pipelines either mask
    * or split there, both needing exactly this mapping).
    *
    * Scale shape: the per-source running sum is the range-partitioned
    * [[groupRunningSum]] — a single-source (or few-source) corpus still
    * spreads over every task, no collect, no UDF. Sequence ids are global
    * via (source, seq-in-source). */
  def packSequences(df: DataFrame, seqLen: Int,
                    groupCol: String = "source", idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    groupRunningSum(
      df.withColumn("nt", size(TextOps.lowerTokens(col(textCol))).cast("long")),
      groupCol, Seq(md5(col(idCol).cast("string")), col(idCol)),
      "nt", "_cum")
      .withColumn("start_tok", col("_cum") - col("nt"))
      .select(col(groupCol), col(idCol), col("nt"),
        (col("start_tok") / seqLen).cast("long").as("seq_in_source"),
        (col("start_tok") % seqLen).as("seq_offset"),
        // a doc spans ceil((offset + nt) / seqLen) sequences (min 1)
        greatest(lit(1L), ceil((col("start_tok") % seqLen + col("nt"))
          .cast("double") / seqLen).cast("long")).as("n_seqs"))
  }

  /** Incremental dedup — the production flow where a NEW batch lands next
    * to an existing corpus: classify each new doc as
    *  - `corpus_dup`  its content fingerprint already exists in the corpus,
    *  - `batch_dup`   a smaller-id doc in the SAME batch has the same
    *                  fingerprint (keep-first within the batch),
    *  - `new`         first sighting.
    * Corpus side reduces to DISTINCT fingerprints before the join (at
    * 100 TB that's the dedup index, e.g. the lake table's key set — only
    * fingerprints shuffle, never text). The keep-first election within the
    * batch is a map-side-combined `groupBy(fp).agg(min(id))` + join back
    * (the [[dedupParagraphs]] pattern) — never a window keyed by the
    * fingerprint, which would serialize a viral duplicate through one
    * task's sort buffer. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val bfp = batch.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
    val seen = corpus.select(TextOps.fingerprint(col(textCol)).as("fp")).distinct()
      .withColumn("in_corpus", lit(true))
    val firsts = bfp.groupBy(col("fp")).agg(min(col(idCol)).as("first_id"))
      .select(col("fp").as("__fp"), col("first_id"))
    bfp.join(seen, Seq("fp"), "left")
      .join(firsts, col("fp") === col("__fp"))
      .select(col(idCol),
        when(col("in_corpus"), "corpus_dup")
          .when(col("first_id") =!= col(idCol), "batch_dup")
          .otherwise("new").as("verdict"))
  }

  /** Exact duplicate-substring spans (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): find every maximal
    * span of >= `n` words that occurs at least twice anywhere in the
    * corpus (including twice inside one document). The suffix-array
    * construction of the paper is single-machine; the distributed
    * re-expression is sliding word-`n`-grams with positions — a span is
    * duplicated iff every length-`n` window inside it is duplicated, so
    * duplicated-gram positions merged into islands (gap <= `n`, i.e.
    * overlapping-or-adjacent windows) ARE the paper's maximal duplicate
    * spans at word granularity.
    *
    * Output: one row per (doc, span) — `span_start` (0-based word index),
    * `span_words`, `n_grams` (windows merged into the span). Integer-exact,
    * replayed verbatim by the DuckDB oracle.
    *
    * Scale shape: grams are explode(sequence)+slice+md5 (codegen'd, no
    * HOF); the duplicate set is one hash aggregate on the gram digest;
    * membership is a shuffle equi-join back on the digest (AQE broadcasts
    * when the duplicate set measures small). The island merge windows per
    * DOCUMENT — per-doc state only, never a corpus-wide partition. The
    * gram relation feeds both the count and the join, so it is
    * lazily checkpointed once (see memory: Spark re-executes shared
    * subtrees per branch otherwise). */
  def duplicateSpans(docs: DataFrame, n: Int = 8, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(n > 0, "n must be positive")
    val grams = docs
      .select(col(idCol), TextOps.lowerTokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= n)
      .select(col(idCol), col("t"),
        explode(sequence(lit(0), size(col("t")) - n)).as("pos"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        md5(array_join(slice(col("t"), col("pos") + 1, lit(n)), " ")).as("g"))
      // feeds dup-count AND position join; persist keeps lineage (see
      // removeBoilerplate note)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupGrams = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("g")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    grams.join(dupGrams, Seq("g"))
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) <= n, 0L).otherwise(1L))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + n).as("span_words"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_start"), col("span_words"), col("n_grams"))
  }

  /** Deterministic epoch shuffle — the "global shuffle before each
    * training epoch" step of a packed-pretraining writer, RNG-free: rows
    * are permuted by `md5(seed || '-' || id)` (a new seed per epoch gives
    * an independent-looking permutation, the same seed replays the same
    * one bit-for-bit on any engine), then dealt round-robin into
    * `nShards` output shards with a dense 0-based position per shard —
    * exactly the (shard, pos) addressing a sharded dataset writer needs.
    *
    * Scale shape: the global rank is [[Ranking.rankWithTotal]]'s two-pass
    * range partition — no single-task global window; round-robin dealing
    * makes every shard the same size ±1 with no skew by construction. */
  def epochShuffle(df: DataFrame, seed: Long, nShards: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat_ws("-", lit(seed), col(idCol).cast("string")))
    val (ranked, _) = Ranking.rankWithTotal(
      df.withColumn("_k", key), Seq(col("_k"), col(idCol)))
    ranked
      .withColumn("shard", pmod(col("global_rank") - 1, lit(nShards.toLong)).cast("int"))
      // floor over double: exact up to 2^53 rows — far past any corpus
      .withColumn("pos", floor((col("global_rank") - 1) / nShards).cast("long"))
      .drop("_k", "global_rank")
  }

  /** Keep-FIRST exact paragraph dedup (MassiveText/RefinedWeb-style):
    * split each document into disjoint `chunkWords`-token spans, keep each
    * distinct span text only at its FIRST occurrence in the corpus — the
    * (doc_id, idx)-lexicographic minimum — and drop every later repeat,
    * reassembling the survivors in order. Differs from
    * [[removeBoilerplate]] (which drops ALL copies of spans repeated in
    * > maxDocs docs): here exactly one copy survives, so corpus-wide text
    * mass is preserved once — the semantics of "remove duplicated
    * paragraphs, keep one".
    *
    * Scale shape: chunking is explode(sequence)+slice (codegen'd); the
    * first-occurrence election is a hash aggregate `min(struct(id, idx))`
    * keyed by span text (map-side partial — a span repeated 10⁶ times
    * sends one candidate per map partition, not 10⁶ rows); the keep
    * decision is one shuffle join back on span text (AQE handles the
    * hot-span skew); reassembly state is per-doc only. No corpus-global
    * window, no collect. */
  def dedupParagraphs(docs: DataFrame, chunkWords: Int = 10,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkWords > 0, "chunkWords must be positive")
    val chunks = docs
      .select(col(idCol), split(coalesce(col(textCol), lit("")), " ").as("tk"))
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0),
          ceil(size(col("tk")).cast("double") / chunkWords).cast("int") - 1)).as("idx"))
      .select(col(idCol), col("idx"),
        array_join(slice(col("tk"), col("idx") * chunkWords + 1, lit(chunkWords)), " ")
          .as("chunk"))
      // feeds the election AND the keep join — materialize once; persist
      // keeps lineage (see removeBoilerplate note)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firsts = chunks
      .groupBy(col("chunk"))
      .agg(min(struct(col(idCol), col("idx"))).as("_first"))
      .select(col("chunk").as("__chunk"),
        col("_first").getField(idCol).as("__fid"),
        col("_first").getField("idx").as("__fidx"))
    val kept = chunks
      .join(firsts, col("chunk") === col("__chunk") &&
        col(idCol) === col("__fid") && col("idx") === col("__fidx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("idx"), col("chunk")))),
          x => x.getField("chunk")), " ").as("text_dedup"))
    val totals = chunks.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Dataset-version diff — the release-engineering step between two
    * corpus snapshots: classify every doc id as `added` (only in v2),
    * `removed` (only in v1), `changed` (both, content fingerprint
    * differs) or `same`. Only (id, md5) pairs shuffle — never text — so
    * the diff of two 100 TB snapshots moves ~32 bytes/doc, exactly like
    * [[incrementalDedup]]'s fingerprint-only contract. One full-outer
    * hash join on the id. */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val a = v1.select(col(idCol), md5(col(textCol)).as("_fp1"))
    val b = v2.select(col(idCol).as("_id2"), md5(col(textCol)).as("_fp2"))
    a.join(b, col(idCol) === col("_id2"), "full_outer")
      .select(coalesce(col(idCol), col("_id2")).as(idCol),
        when(col("_fp1").isNull, "added")
          .when(col("_fp2").isNull, "removed")
          .when(col("_fp1") =!= col("_fp2"), "changed")
          .otherwise("same").as("verdict"))
  }

  /** Temperature-sampled source weights (the "α = 0.5 mixing" rule from
    * multilingual/multi-source pretraining): a source's sampling weight
    * scales as `n_tokens^α`, flattening the head so low-resource sources
    * are over-sampled relative to their share. Emitted RELATIVE to the
    * largest source — `w_rel = sqrt(n_s / n_max)` — because the absolute
    * normalizer Σ√n is an order-dependent float sum that no engine
    * replays bit-for-bit, while one exact integer ratio through one
    * correctly-rounded `sqrt` is deterministic everywhere. α is fixed at
    * 0.5: `sqrt` is correctly rounded by both engines, `pow(x, α)` is
    * not guaranteed to be.
    *
    * One hash aggregate + a broadcast 1-row max — output cardinality is
    * the source count. */
  def sourceWeights(df: DataFrame, srcCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val per = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.lowerTokens(col(textCol))).cast("long")).as("n_tokens"))
    val mx = per.agg(max(col("n_tokens")).as("_mx"))
    per.crossJoin(broadcast(mx))
      .withColumn("w_rel",
        sqrt(col("n_tokens").cast("double") / col("_mx").cast("double")))
      .drop("_mx")
  }

  /** Per-source power-of-two sequence-length histogram — the corpus shape
    * summary a packing/mixing planner reads first (how much mass sits in
    * each length doubling, per source). The bucket index is
    * floor(log2(n_tokens)) computed INTEGER-exactly as
    * `length(bin(n)) - 1` — no floating log, so the bucket cut is
    * bit-identical across engines. One projection + one hash aggregate;
    * output cardinality is sources x ~40 buckets. */
  def lengthHistogram(docs: DataFrame, srcCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    val nt = size(split(lower(coalesce(col(textCol), lit(""))), " ")).cast("long")
    docs.select(col(srcCol), nt.as("n_tokens"))
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("long"))
      .groupBy(col(srcCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
  }
}
