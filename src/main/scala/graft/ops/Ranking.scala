package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking — the 100 TB path for exact NTILE / PERCENT_RANK
  * / CUME_DIST, whose naive window form (`OVER (ORDER BY ...)` with no
  * PARTITION BY) moves every row to ONE task.
  *
  * Classic two-pass range ranking instead:
  *   1. `repartitionByRange` on the order key — each partition holds a
  *      contiguous, disjoint key range, partition index ascending in order;
  *   2. count rows per range partition — one tiny row per partition,
  *      collected to the driver (bounded by the partition count, never by
  *      data size) and turned into cumulative offsets;
  *   3. rank WITHIN each partition (parallel window keyed by partition id)
  *      and add the broadcast offset of the preceding partitions.
  *
  * The ranged frame is needed twice (count pass + rank pass), and Spark's
  * RangePartitioner re-SAMPLES boundaries per execution with a seed derived
  * from the rdd id — two separate executions can disagree on boundaries,
  * which would silently corrupt the offsets. The ranged frame is therefore
  * persisted (memory-and-disk) so both passes read ONE materialization;
  * this also saves the second shuffle.
  *
  * The order key must be unique (append a tie-break column); with unique
  * keys rank = dense rank = row count ≤ key, so NTILE / percent_rank /
  * cume_dist all derive from the global rank and total count by the same
  * integer arithmetic both Spark and DuckDB use — results are bit-equal to
  * the single-partition window form. */
object Ranking {

  /** (`df` plus a 1-based `global_rank` column by `order` — which must be a
    * unique ordering — , total row count). No single-partition stage
    * anywhere in the plan. */
  def rankWithTotal(df: DataFrame, order: Seq[Column],
                    numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    // persisted: boundary sampling is per-execution (seeded by rdd id), so
    // the count pass and the rank pass MUST share one materialization
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition row counts -> driver (<= numPartitions rows)
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("_pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init)
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_pid", "_offset")
    // pass 2: rank within each range partition (parallel; one window task
    // per range partition, NOT one global task), plus the broadcast offset
    val localW = Window.partitionBy("_pid").orderBy(order: _*)
    val ranked = ranged
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn("global_rank", col("_offset") + row_number().over(localW).cast("long"))
      .drop("_pid", "_offset")
    (ranked, total)
  }

  /** [[rankWithTotal]] without the total. */
  def globalRankByRange(df: DataFrame, order: Seq[Column],
                        numPartitions: Int = 0): DataFrame =
    rankWithTotal(df, order, numPartitions)._1

  /** Exact NTILE(k) bucket for a 1-based unique `global_rank` out of `n`
    * rows: the first `n % k` buckets take `n/k + 1` rows, the rest `n/k` —
    * the SQL-standard assignment, in pure integer arithmetic. */
  def ntileOf(rank: Column, n: Long, k: Int): Column = {
    val q = n / k
    val rem = n % k
    val bigCut = rem * (q + 1) // last rank covered by the size-(q+1) buckets
    val inBig = (rank - 1) / (q + 1) + 1
    val inSmall = if (q == 0) lit(k.toLong) // degenerate: n < k
                  else lit(rem) + (rank - 1 - bigCut) / q + 1
    (if (bigCut > 0) when(rank <= bigCut, inBig).otherwise(inSmall)
     else inSmall).cast("int")
  }

  /** Exact per-group continuous percentiles WITHOUT per-group value
    * buffering — the 100 TB form of `percentile(v, p) GROUP BY g`, whose
    * exact aggregate holds every group's full value list in one task's
    * aggregation buffer (a hot group at corpus scale = OOM, not skew).
    *
    * Construction: one global range-rank over (group ++ value ++ tie) via
    * [[rankWithTotal]] (no single-partition stage), per-group offset/count
    * from a tiny broadcast aggregate, then each requested percentile reads
    * its two bracketing within-group ranks and interpolates with the
    * type-7 arithmetic (`lo + (hi - lo) * frac`, h = (n−1)p + 1) that both
    * Spark's `percentile` and DuckDB's `quantile_cont` use — results are
    * bit-equal to the naive aggregate.
    *
    * Null semantics match the exact aggregate: null values are ignored
    * (`n` counts non-null), an all-null/empty group emits null
    * percentiles, and null group keys are ordinary groups.
    *
    * Returns one row per group: groupCols ++ one double column per
    * requested (name, p) ++ `n` (the non-null count, often wanted
    * anyway). */
  def groupPercentiles(df: DataFrame, groupCols: Seq[String], value: Column,
                       tie: Seq[Column], ps: Seq[(String, Double)]): DataFrame = {
    val gCols = groupCols.map(col)
    // null semantics must match the exact aggregate: null VALUES are
    // ignored (dropped before ranking, so `n` counts non-null only) and an
    // all-null/empty group still emits its row with null percentiles
    // (restored via the left join at the end); null GROUP KEYS survive
    // because every group join here is null-safe (<=>)
    val nonNull = df.filter(value.isNotNull)
    // localCheckpoint: the ranked relation feeds BOTH the per-group offset
    // aggregate and the bracket join — without it each branch re-runs the
    // rank window over the cached ranged frame
    val (ranked0, _) = rankWithTotal(
      nonNull.select(gCols :+ value.cast("double").as("_v") :+
        struct(tie: _*).as("_tie"): _*),
      gCols :+ col("_v") :+ col("_tie"))
    val ranked = ranked0.localCheckpoint(false)
    // join keys on the aggregated sides are RENAMED (__g_/__c_ prefixes):
    // both joins are derived-from-self joins, and identically-named
    // attributes would trip Spark's ambiguous-self-join detection
    def nullSafeOn(prefix: String): Column =
      groupCols.map(c => col(c) <=> col(prefix + c)).reduce(_ && _)
    val gstats = groupCols.foldLeft(
      ranked.groupBy(groupCols.head, groupCols.tail: _*)
        .agg(min(col("global_rank")).as("_g0"), count(lit(1)).as("n"))) {
      (acc, c) => acc.withColumnRenamed(c, "__g_" + c)
    }
    val rk = ranked.join(broadcast(gstats), nullSafeOn("__g_"))
      .drop(groupCols.map("__g_" + _): _*)
      .withColumn("_rk", col("global_rank") - col("_g0") + 1)
    def h(p: Double): Column = (col("n") - 1).cast("double") * lit(p) + 1
    val brackets = ps.flatMap { case (name, p) => Seq(
      max(when(col("_rk") === floor(h(p)), col("_v"))).as(s"_lo_$name"),
      max(when(col("_rk") === ceil(h(p)), col("_v"))).as(s"_hi_$name"))
    }
    val agg = rk.groupBy((groupCols :+ "n").head, (groupCols :+ "n").tail: _*)
      .agg(brackets.head, brackets.tail: _*)
    val computed = agg.select(groupCols.map(c => col(c).as("__c_" + c)) ++
      ps.map { case (name, p) =>
        (col(s"_lo_$name") +
          (col(s"_hi_$name") - col(s"_lo_$name")) * (h(p) - floor(h(p)))).as(name)
      } :+ col("n"): _*)
    // every input group appears in the output, even with no non-null value
    val allGroups = df.select(gCols: _*).distinct()
    allGroups.join(computed, nullSafeOn("__c_"), "left")
      .select(gCols ++ ps.map { case (name, _) => col(name) } :+
        coalesce(col("n"), lit(0L)).as("n"): _*)
  }

  /** percent_rank for a unique ordering: (rank-1)/(n-1); 0 when n == 1. */
  def percentRankOf(rank: Column, n: Long): Column =
    if (n <= 1) lit(0.0) else (rank - 1).cast("double") / lit((n - 1).toDouble)

  /** cume_dist for a unique ordering: rank/n. */
  def cumeDistOf(rank: Column, n: Long): Column =
    rank.cast("double") / lit(n.toDouble)

  /** RECIPROCAL-RANK FUSION (Cormack et al. 2009) — the standard hybrid-
    * retrieval combiner: each leg is a bounded top-k ranking
    * `(id, rank)` from a different retriever (BM25, dense ANN, …), and
    * a doc's fused score is `Σ_legs 1/(k + rank)`, 0 for legs that
    * missed it. Rank-based, so wildly different score scales fuse
    * without normalization. Bit-exact across engines: ranks are
    * integers, each term is ONE correctly-rounded double division, and
    * the fused sum adds legs in CALLER order. Legs are bounded top-k
    * frames (the retrievers' own `limit`), so the full-outer join is
    * list-sized — driver-light, executor-trivial. Returns
    * `(idCol, __r0.., rrf)` sorted by fused score (ties by id),
    * limited to `topK`. */
  def rrfFuse(legs: Seq[(DataFrame, String)], idCol: String,
              k: Int = 60, topK: Int = 10): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranking leg")
    val joined = legs.zipWithIndex.map { case ((df, rankCol), i) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"__r$i"))
    }.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = legs.indices.map(i =>
      when(col(s"__r$i").isNotNull,
        lit(1.0) / (lit(k.toDouble) + col(s"__r$i").cast("double")))
        .otherwise(lit(0.0))).reduceLeft(_ + _)
    joined.withColumn("rrf", score)
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
