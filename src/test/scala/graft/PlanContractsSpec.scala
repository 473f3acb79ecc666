package graft

import org.apache.spark.sql.DataFrame

/** Executable plan contracts: the physical-plan properties the 100 TB
  * design depends on, pinned as assertions so a refactor that silently
  * loses a broadcast, a pushed filter, or column pruning fails CI instead
  * of surfacing as a 100× regression on a cluster.
  *
  * Uses the sf0.001 fixtures — plan SHAPE (not timing) is what's asserted,
  * and AQE's static plan for these sizes matches the intent because the
  * dims are genuinely broadcast-sized at every SF. */
class PlanContractsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("joins broadcast their small side and never go cartesian") {
    for (q <- Seq("q3_join", "q5_multijoin")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
      assert(!p.contains("CartesianProduct"), s"$q degenerated to cartesian")
    }
  }

  test("filters and projections reach the parquet scan") {
    val p = plan("q_filter_limit")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment)"),
      "predicate pushdown lost")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string," +
      "c_acctbal:double,c_mktsegment:string>"), "column pruning lost")
  }

  test("decontamination broadcasts the eval n-gram set") {
    val p = plan("text_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "eval side no longer broadcast — corpus would shuffle on n-grams")
  }

  test("corpus_mix range-partitions the cumsum: no per-source serial task") {
    val p = plan("corpus_mix")
    assert(p.contains("rangepartitioning(source"),
      "two-pass range-partitioned running sum lost — a TB-scale source " +
        "would serialize through one window task")
  }

  test("corpus_sample range-partitions the stratum rank: no per-lang serial task") {
    val p = plan("corpus_sample")
    assert(p.contains("rangepartitioning(lang"),
      "stratified sample fell back to a per-stratum window — a TB-scale " +
        "stratum would serialize through one task")
  }

  test("semdedup pairs within clusters via hash join; centroids broadcast") {
    val p = plan("emb_semdedup")
    assert(!p.contains("CartesianProduct"),
      "semdedup pair stage degenerated to all-pairs")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid assignment lost its broadcast")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "within-cluster pair join is not a hash/merge join")
  }

  test("tfidf windows by doc_id only; bigram-lm opens no window at all") {
    val p = plan("text_tfidf")
    assert(p.contains("windowspecdefinition(doc_id"),
      "tfidf top-k window no longer partitions by doc_id (corpus-" +
        "cardinality key) — a global sort would serialize the corpus")
    assert(!p.contains("CartesianProduct"), "tfidf went cartesian")
    val q = plan("text_bigram_lm")
    assert(!q.contains("windowspecdefinition"),
      "bigram-lm grew a window — it is pure hash aggregation by design")
    assert(!q.contains("CartesianProduct"), "bigram-lm went cartesian")
  }

  test("LSH candidate joins are hash joins, not nested loops") {
    for (q <- Seq("dedup_minhash", "dedup_simhash")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q candidate join degenerated")
    }
  }

  test("scalable percentile queries never fall back to a global window or percentile buffer") {
    for (q <- Seq("q_percentile_scalable", "corpus_stats")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("percentile"), s"$q regressed to the buffering percentile aggregate")
      val bad = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$q has a global (unpartitioned) WindowExec")
    }
  }

  test("boilerplate removal stays hash-keyed: no cartesian, no global window") {
    val df = SparkEntry.queries("text_boilerplate")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "hot-span anti-join degenerated to a loop join")
    val bad = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "text_boilerplate grew a global WindowExec")
  }

  test("sequence packing range-partitions the cumsum: no per-source serial " +
      "task, no global window") {
    val df = SparkEntry.queries("corpus_pack")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning(source"),
      "two-pass range-partitioned running sum lost — a TB-scale source " +
        "would serialize through one window task")
    val bad = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "corpus_pack has a global (unpartitioned) WindowExec")
  }

  test("boilerplate hot-span anti-join degrades to a SHUFFLE join when the " +
      "hot set outgrows broadcast (no error, no loop join)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // a hot set past the broadcast ceiling = AQE can't pick broadcast;
      // forced here via threshold -1, which is what an over-threshold
      // size estimate does at 10⁹ docs
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("text_boilerplate")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "anti-join did not degrade to a shuffle join")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "anti-join degenerated to a loop join without broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a single hot source spreads over many cumsum tasks (forced skew)") {
    import spark.implicits._
    // one source, many rows: the old per-source window would put ALL rows
    // in one task; the range-partitioned form must spread them
    val skew = (1L to 2000L).map(i => (i, "one-source", 3L))
      .toDF("doc_id", "source", "nt")
    val out = graft.ops.Curation.groupRunningSum(
      skew, "source", Seq(org.apache.spark.sql.functions.col("doc_id")),
      "nt", "cum", numPartitions = 8)
    val pids = out
      .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
      .select("p").distinct().count()
    assert(pids > 1, s"single source collapsed to $pids task(s)")
    // and the sum is still the exact inclusive running sum
    val mx = out.agg(org.apache.spark.sql.functions.max("cum")).head.getLong(0)
    assert(mx === 6000L)
  }

  test("bucketed tables join WITHOUT a shuffle: the pre-partitioned lake " +
      "layout carries its distribution into the join") {
    import spark.implicits._
    val n = 8
    val facts = (1L to 1000L).map(i => (i % 100, s"f$i")).toDF("k", "v")
    val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")
    // one file per bucket (repartition on the bucket key first) keeps the
    // per-bucket sort usable too; bucketBy is the write-side half of the
    // "co-locate the join" contract from SURVEY §5
    facts.repartition(n, $"k").write.bucketBy(n, "k").sortBy("k")
      .mode("overwrite").saveAsTable("pc_facts_bkt")
    dims.repartition(n, $"k").write.bucketBy(n, "k").sortBy("k")
      .mode("overwrite").saveAsTable("pc_dims_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("pc_facts_bkt")
        .join(spark.table("pc_dims_bkt"), "k")
      assert(joined.count() === 1000L)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed join shuffled — bucket distribution lost:\n" + p)
      // contrast: the same join over plain (unbucketed) relations shuffles
      val p2 = facts.join(dims, "k").queryExecution.executedPlan.toString
      assert(p2.contains("Exchange"), "control join unexpectedly shuffle-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS pc_facts_bkt")
      spark.sql("DROP TABLE IF EXISTS pc_dims_bkt")
    }
  }

  test("dup-span island merge windows per doc only, joins stay hash-keyed") {
    val df = SparkEntry.queries("text_dupspans")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(doc_id"),
      "island merge must window by doc_id — per-doc state only, never a " +
        "corpus-wide partition")
    val bad = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "text_dupspans has a global (unpartitioned) WindowExec")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "dup-gram membership join degenerated to a loop join")
  }

  test("fuzzy decon / oov / source-overlap broadcast their bounded sides") {
    for (q <- Seq("decon_fuzzy", "text_oov", "corpus_overlap")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q lost its broadcast (eval grams / vocab / totals)")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a loop join")
    }
    // the oov vocabulary cut must be a top-k, not a global sort
    assert(plan("text_oov").contains("TakeOrderedAndProject"),
      "oov vocab selection fell back to a global sort materialization")
  }

  test("epoch shuffle range-partitions the global rank: no single-task window") {
    val df = SparkEntry.queries("corpus_shuffle")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning("),
      "epoch shuffle lost its two-pass range rank — the whole corpus would " +
        "serialize through one global window task")
    val bad = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "corpus_shuffle has a global (unpartitioned) WindowExec")
  }

  test("paragraph dedup elects firsts via hash aggregate, no window, no loop join") {
    val df = SparkEntry.queries("text_paragraph_dedup")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the election must be a (partial) min aggregate keyed by span text —
    // a per-chunk window would buffer hot spans in one task
    assert(p.contains("partial_min"),
      "first-occurrence election lost its map-side partial min aggregate")
    val bad = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "text_paragraph_dedup has a global WindowExec")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "keep join degenerated to a loop join")
  }

  test("html extraction is shuffle-free codegen; domain census shuffles pairs only") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the regexp cascade is a pure per-row projection — zero Exchange
    val ext = docs.select(col("doc_id"),
      graft.ops.TextOps.extractHtmlText(col("text")).as("x"))
    val pExt = ext.queryExecution.executedPlan.toString
    assert(!pExt.contains("Exchange"),
      "extractHtmlText grew a shuffle — it is a per-row regexp cascade:\n" + pExt)
    val codegen = ext.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty, "extraction fell out of whole-stage codegen")
    // the census aggregates AFTER projecting down to (doc_id, domain):
    // no text column may reach the exchange
    val census = graft.ops.TextOps.domainCensus(docs)
    val pc = census.queryExecution.executedPlan.toString
    // the exchange is keyed by (domain, doc_id) AFTER a map-side partial
    // aggregate — text is projected away before any byte shuffles
    assert(pc.contains("Exchange hashpartitioning(domain"),
      "domainCensus lost its domain-keyed aggregate shuffle:\n" + pc)
    assert(pc.contains("partial_count"),
      "domainCensus lost its map-side partial aggregate")
    assert(!pc.split('\n').exists(l => l.contains("Exchange") && l.contains("text#")),
      "domainCensus shuffles the raw text column — census must project " +
        "to (doc_id, domain) before the exchange:\n" + pc)
  }

  test("sliding chunking is pure explode+slice: no shuffle at all before the sink") {
    import org.apache.spark.sql.functions.col
    val df = graft.ops.TextOps.slidingChunks(
      spark.read.parquet(s"$sf/documents.parquet"), 64, 48)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      "slidingChunks grew a shuffle — it is a per-row generate by design:\n" + p)
    assert(p.contains("Generate explode"), "explode(sequence) chunking lost")
  }

  test("gap-fill, weights and diff keep hash/broadcast shapes") {
    // gap-fill: spine generate + hash joins, never a loop join over users
    val gp = plan("q_gapfill")
    assert(gp.contains("Generate explode"), "gap-fill spine lost its generate")
    assert(!gp.contains("CartesianProduct") && !gp.contains("BroadcastNestedLoopJoin"),
      "gap-fill count join degenerated to a loop join")
    // weights: the 1-row max side must broadcast (bounded by construction)
    val wp = plan("corpus_weights")
    assert(wp.contains("Broadcast"), "corpus_weights max side no longer broadcast")
    // diff: fingerprint-only full-outer must be a shuffle/broadcast HASH join
    val dp = plan("corpus_diff")
    assert(dp.contains("SortMergeJoin") || dp.contains("ShuffledHashJoin") ||
      dp.contains("BroadcastHashJoin"), "corpus_diff join is not hash/merge keyed")
    assert(!dp.contains("CartesianProduct"), "corpus_diff went cartesian")
  }

  test("no dedup path windows by a content fingerprint: elections are " +
      "map-side hash aggregates + join back") {
    // The scale-killer shape this pins out: min/row_number over
    // Window.partitionBy(<content fingerprint>) puts EVERY copy of a viral
    // duplicate through one task's sort buffer. All dedup elections use the
    // dedupParagraphs pattern instead (groupBy(fp).agg(min(...)) + join
    // back), so no WindowExec in any dedup plan may partition by a
    // fingerprint/digest column.
    val fpNames = Set("fp", "dg", "_dg", "digest", "chunk", "g", "__fp", "__dg")
    for (q <- Seq("dedup_keep_first", "dedup_fingerprint", "dedup_incremental",
                  "dedup_canonical", "dedup_exact", "pipeline_curate",
                  "text_paragraph_dedup")) {
      val df = SparkEntry.queries(q)(spark, sf)
      // collect over the pre-AQE physical plan: AdaptiveSparkPlanExec does
      // not expose its inner plan to TreeNode.collect
      val bad = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.exists(e => e.references.exists(a =>
            fpNames.contains(a.name))) => w
      }
      assert(bad.isEmpty,
        s"$q elects through a window keyed by a content fingerprint — a " +
          "viral duplicate would serialize through one task: " + bad.mkString)
    }
    // and the elections kept their map-side partial combine
    for (q <- Seq("dedup_keep_first", "pipeline_curate")) {
      val p = plan(q)
      assert(p.contains("partial_min"),
        s"$q keep-first election lost its map-side partial min aggregate")
    }
  }

  test("winnow sketch windows per doc only; gram relation scanned once per branch") {
    val df = SparkEntry.queries("dedup_winnow")(spark, sf)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "winnow lost its sliding-window min")
    val bad = wins.filterNot(_.partitionSpec.exists(e =>
      e.references.exists(_.name == "doc_id")))
    assert(bad.isEmpty,
      "winnow window no longer partitions by doc_id — a corpus-wide window " +
        "would serialize the sketch: " + bad.mkString)
    // the doc scan must appear exactly twice (gram branch + the left join
    // restoring sketchless docs) — a per-window re-scan of the gram
    // relation would show up as extra scans
    val p = df.queryExecution.sparkPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"winnow re-scans its input ($scans parquet scans)")
  }

  test("streaming/app keep-first elections are window-free too") {
    import spark.implicits._
    val batch = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    // CurationApp funnel (langid/decon/budgets off → quality + dedup only)
    val conf = graft.core.ConfigLayer(Map("graft.curation.min.tokens" -> "1",
      "graft.curation.repetition.factor" -> "1000"))
    val appPlan = graft.apps.CurationApp.curate(spark, batch, conf)
      .queryExecution.sparkPlan
    val badApp = appPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.exists(e => e.references.exists(a =>
          a.name == "_dg" || a.name == "fp" || a.name == "dg")) => w
    }
    assert(badApp.isEmpty, "CurationApp keep-first regressed to a fingerprint window")
    // incremental dedup operator directly
    val incPlan = graft.ops.Curation
      .incrementalDedup(batch, batch.limit(1))
      .queryExecution.sparkPlan
    val badInc = incPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.exists(e => e.references.exists(a => a.name == "fp")) => w
    }
    assert(badInc.isEmpty, "incrementalDedup regressed to a fingerprint window")
  }

  test("precombine dedup is a hash aggregate, not a window sort") {
    import spark.implicits._
    val batch = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k", "pre", "v")
    val p = graft.sink.MergeWriter.dedupByPrecombine(batch, Seq("k"), "pre")
      .queryExecution.executedPlan.toString
    // the scale property is the PARTIAL (map-side) combine before the
    // shuffle — a hot key reduces per input partition, not in one task
    assert(p.contains("partial_max_by"),
      "precombine dedup lost its map-side partial aggregation")
    assert(!p.contains("Window"), "precombine dedup regressed to a window sort")
  }

  test("bm25 is TakeOrdered + broadcast df join, never a global sort or window") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      "bm25 top-k regressed to a global sort")
    assert(p.contains("BroadcastHashJoin"),
      "bm25 df join no longer broadcasts — corpus would shuffle on token")
    assert(!p.contains("Window"), "bm25 grew a window")
    assert(!p.contains("CartesianProduct"), "bm25 went cartesian")
  }

  test("leakage-safe split elects canonicals via hash aggregate, no window") {
    val p = plan("corpus_split_safe")
    assert(p.contains("partial_min"),
      "canonical election lost its map-side partial aggregation")
    assert(!p.contains("Window"),
      "leakage-safe split regressed to a fingerprint window")
  }

  test("dsir scoring: map-side corpus aggregate, broadcast totals, no window") {
    val p = plan("corpus_dsir")
    assert(!p.contains("Window"),
      "dsir regressed to a window — per-doc fold must be an aggregate " +
        "higher-order function")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the 1-row totals frame lost its broadcast")
    assert(!p.contains("CartesianProduct"),
      "totals cross join degenerated to a non-broadcast cartesian")
    assert(p.contains("partial_"),
      "corpus bigram counts lost map-side partial aggregation")
  }

  test("hybrid rrf joins bounded top-k legs; windows only over those lists") {
    val df = SparkEntry.queries("search_hybrid_rrf")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered") || p.contains("GlobalLimit"),
      "rrf legs lost their bounded top-k shape")
    assert(!p.contains("CartesianProduct"), "rrf fused via cartesian")
  }

  test("iceberg changelog is one scan per (snapshot, class) — bounded unions") {
    // 3 snapshots → 5 (snapshot, class) groups; the per-file shape would
    // blow this up at a 10⁴-file history
    val df = SparkEntry.queries("lake_iceberg_changelog")(spark, sf)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size <= 5,
      s"changelog planned ${scans.size} scans for 5 (snapshot, class) " +
        "groups — the scan unit must be the group, not the file")
  }

  test("bucketed-lake join is co-located: no exchange or sort under the join") {
    val df = SparkEntry.queries("lake_bucketed_join")(spark, sf)
    df.collect() // finalize the adaptive plan
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val here = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          expand(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          expand(q.plan)
        case other => Seq(other)
      }
      here ++ p.children.flatMap(expand)
    }
    val all = expand(df.queryExecution.executedPlan)
    val smj = all.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.getOrElse(fail(s"no SMJ in:\n${df.queryExecution.executedPlan}"))
    // the post-join groupBy/orderBy exchanges are legitimate; the JOIN
    // subtree must be exchange-free AND sort-free (key-sorted buckets)
    val under = expand(smj).drop(1)
    assert(!under.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      s"bucketed join shuffled a side — SPJ lost:\n$smj")
    assert(!under.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      s"bucketed join re-sorted a side — reported ordering lost:\n$smj")
  }
}
