package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sink.{LakeTable, MergeWriter}

/** Incremental materialized-view maintenance (IVM) over a change feed —
  * keep a `GROUP BY` aggregate table current from CDC/CDF change rows
  * WITHOUT rescanning the source. At 100 TB this is the difference
  * between re-aggregating the table per refresh and touching only the
  * groups a batch changed: refresh cost is O(batch + touched groups),
  * never O(source).
  *
  * Maintained aggregates, per Griffin/Libkin-style delta rules over a
  * feed that carries FULL row payloads (insert / delete /
  * update_preimage / update_postimage — exactly what Delta CDF, the
  * graft Iceberg changelog, and Hudi incremental pulls emit):
  *
  *  - `count(*)` and `sum(c)`: exactly additive — insert/postimage
  *    rows contribute `+`, delete/preimage rows `-`; NO latest-per-key
  *    election is needed, so a batch spanning several source versions
  *    folds in one map-side aggregate (`avg = sum/count` at read time).
  *  - `min(c)`/`max(c)`: additive on the insert side (`least`/
  *    `greatest` with the stored value); a REMOVED value that ties the
  *    stored extreme makes the group DIRTY — those groups (and only
  *    those) are re-aggregated from the caller's source snapshot,
  *    semi-join-pruned to the dirty keys. Batches that cannot have
  *    moved an extreme never touch the source at all (spec-pinned with
  *    a throwing source closure).
  *  - `count(DISTINCT c)`: exactly additive through a per-column
  *    `(group, value) -> count` SUB-STATE lake ([[ViewSpec]] scaladoc:
  *    the support-relation tradeoff); never touches the source.
  *  - filtered views (`ViewSpec.filter`): the σ-delta rule — change
  *    rows failing the predicate contribute nothing, pre/postimages
  *    filtered independently.
  *
  * State is a graft-native [[MergeWriter]] lake keyed by the group
  * columns and HASH-BUCKETED into `spec.buckets` partitions
  * (`_view_bucket = pmod(xxhash64(groupKeys), buckets)`), so the COW
  * rewrite touches only the buckets holding changed groups — write
  * amplification is bounded by touched buckets, not view size. A group
  * whose count returns to zero is kept as a TOMBSTONE row
  * (`view_count = 0`, aggregates nulled) so its bucket's rewrite stays
  * a plain keyed upsert; [[read]] filters tombstones and [[compact]]
  * removes them physically.
  *
  * Exactly-once: two-phase epoch markers (`_ivm_intent` before the
  * state commit, `_ivm_epoch` after) make the steady-state replay check
  * O(1) marker reads; only the genuinely ambiguous crash window (an
  * intent with no matching commit marker) re-checks the state rows'
  * `_view_epoch` over the SAME bucket-pruned scan the merge uses —
  * a replayed batch re-touches exactly those buckets. A replayed epoch
  * SKIPS before any byte is written; an epoch BEHIND the watermark
  * fails loudly (a reset checkpoint would otherwise silently re-apply
  * or drop deltas — the same guard as [[LakeMirror]]'s mirror legs). */
object IncrementalAgg {

  /** Aggregate shape of the view: `GROUP BY groupCols` with
    * `count(*)`, `sum(c)` per sumCols, `min(c)`/`max(c)` per
    * minCols/maxCols, `count(DISTINCT c)` per distinctCols. Group
    * columns must be null-free (they key the state lake); sums should
    * be exact-additive types (integral / decimal) if bit-exact parity
    * with a recompute is required.
    *
    * `distinctCols` are maintained EXACTLY and ADDITIVELY through a
    * per-column SUB-STATE lake of `(groupCols, value) -> count` rows
    * (the classic support-relation shape): the batch folds value-count
    * deltas into the sub-state, and [[read]] projects
    * `nd_<c> = COUNT(value rows with count > 0)` per group. The
    * tradeoff vs a dirty-group recompute or an HLL sketch: state is
    * O(distinct (group, value) pairs) — the size any exact-distinct
    * maintainer must pay — but NO batch ever touches the source, the
    * counts are exact (sketches are not), and refresh cost stays
    * O(batch + touched buckets). Null values are ignored, matching
    * SQL `COUNT(DISTINCT c)`.
    *
    * `filter` (SQL predicate over payload columns) makes this a
    * FILTERED view: change rows failing it contribute nothing. Pre and
    * post images are filtered independently, so an update moving a row
    * ACROSS the predicate boundary folds as a bare insert (entered) or
    * bare delete (left) — exactly the delta rule for σ-views. The same
    * predicate prunes the dirty-group min/max recompute's source scan. */
  final case class ViewSpec(
      groupCols: Seq[String],
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      buckets: Int = 32,
      distinctCols: Seq[String] = Nil,
      filter: Option[String] = None) {
    require(groupCols.nonEmpty, "at least one group column required")
    require(buckets >= 1, "buckets must be >= 1")
    require(filter.forall(_.trim.nonEmpty), "filter must be a non-empty predicate")
    // the persisted spec file is LINE-delimited (filter = line 7): an
    // embedded newline would shift the layout and corrupt every later
    // SQL/readByPath consumer's parse
    require(filter.forall(f => !f.contains("\n") && !f.contains("\r")),
      "filter must not contain newlines (the spec file is line-delimited); " +
        "rewrite the predicate on one line")
  }

  val CountCol = "view_count"
  val EpochCol = "_view_epoch"
  val BucketCol = "_view_bucket"
  private val ChangeCol = "change_type"
  private val SignCol = "_view_sign"

  /** Additive folding REQUIRES a full-payload pre/postimage feed (Delta
    * CDF, MySQL binlog row images). The `upsert` class (Iceberg
    * changelog, Hudi incremental pulls) is REJECTED loudly: an upsert
    * does not say whether the key existed (count would drift) and its
    * paired equality-delete row carries only key columns (old sums
    * could never be subtracted) — use [[LakeMirror]]'s latest-per-key
    * election for those feeds, or recompute. */
  private val AddTypes = Seq("insert", "update_postimage")
  private val RemoveTypes = Seq("delete", "update_preimage")

  def sumCol(c: String) = s"sum_$c"
  def minCol(c: String) = s"min_$c"
  def maxCol(c: String) = s"max_$c"
  /** Non-null count for sum column `c` — the divisor of `avg_<c>`
    * (SQL AVG ignores nulls; `view_count` does not). */
  def cntCol(c: String) = s"cnt_$c"
  def ndCol(c: String) = s"nd_$c"
  private val VCountCol = "_vcount"

  /** The state lake spec rooted at `path`. */
  def stateTable(path: String, spec: ViewSpec): LakeTable =
    LakeTable(path, "graft_view", recordKeyFields = spec.groupCols,
      precombineField = EpochCol, partitionFields = Seq(BucketCol))

  /** The `(group, value) -> count` SUB-STATE lake backing
    * `count(DISTINCT c)` — keyed by group + value, bucketed like the
    * main state so batch writes stay bucket-pruned. */
  def distinctStateTable(path: String, spec: ViewSpec, c: String): LakeTable =
    LakeTable(s"$path/_dstate_$c", "graft_view_distinct",
      recordKeyFields = spec.groupCols :+ c,
      precombineField = EpochCol, partitionFields = Seq(BucketCol))

  /** Read a view by PATH alone — the [[ViewSpec]] persists next to the
    * state (written on the first apply), so SQL consumers
    * (`graft_ivm('/path')`) need no programmatic spec. */
  def readByPath(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    read(spark, path, readSpecFile(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no incremental view at $path")))

  private val SpecFile = "_ivm_spec"

  private def writeSpecFile(spark: SparkSession, path: String,
                            spec: ViewSpec): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) return
    val out = fs.create(p, true)
    val text = Seq(spec.groupCols, spec.sumCols, spec.minCols, spec.maxCols)
      .map(_.mkString(",")).mkString("\n") + s"\n${spec.buckets}\n" +
      spec.distinctCols.mkString(",") + "\n" + spec.filter.getOrElse("") + "\n"
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSpecFile(spark: SparkSession,
                           path: String): Option[ViewSpec] = {
    val p = new org.apache.hadoop.fs.Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n", -1)
    def cols(i: Int) =
      if (i >= lines.length) Nil
      else lines(i).split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val filter = // line 6, absent in pre-round-12 spec files
      if (lines.length > 6 && lines(6).trim.nonEmpty) Some(lines(6).trim)
      else None
    Some(ViewSpec(cols(0), cols(1), cols(2), cols(3), lines(4).trim.toInt,
      cols(5), filter))
  }

  private def bucketExpr(spec: ViewSpec): Column =
    pmod(xxhash64(spec.groupCols.map(col): _*), lit(spec.buckets))

  /** User-facing view: tombstones dropped, internals hidden, one
    * `avg_<c>` per sum column derived from the exact sum / non-null
    * count pair (matching SQL AVG under nulls; pre-round-12 state
    * without `cnt_<c>` columns falls back to `view_count`, its
    * historical null-free-measure assumption), and one `nd_<c>` per
    * distinct column projected from the value sub-state
    * (`COUNT(value rows with count > 0)` per group — an aggregate over
    * STATE, never the source). */
  def read(spark: SparkSession, path: String, spec: ViewSpec): DataFrame = {
    val base = MergeWriter.readView(spark, stateTable(path, spec))
    if (base.columns.isEmpty) return base
    val live = base.where(col(CountCol) > 0).drop(EpochCol, BucketCol)
    val withAvg = spec.sumCols.foldLeft(live)((df, c) => df.withColumn(
      s"avg_$c",
      col(sumCol(c)).cast("double") /
        (if (base.columns.contains(cntCol(c))) col(cntCol(c))
         else col(CountCol))))
    spec.distinctCols.foldLeft(withAvg) { (df, c) =>
      val sub = MergeWriter.readView(spark, distinctStateTable(path, spec, c))
      val nd =
        if (sub.columns.isEmpty) // view created before any distinct delta
          df.select(spec.groupCols.map(col): _*).limit(0)
            .withColumn(ndCol(c), lit(0L))
        else sub.where(col(VCountCol) > 0)
          .groupBy(spec.groupCols.map(col): _*)
          .agg(count(lit(1)).as(ndCol(c)))
      df.join(nd, spec.groupCols, "left")
        .withColumn(ndCol(c), coalesce(col(ndCol(c)), lit(0L)))
    }
  }

  /** Drop tombstoned groups physically (a metadata-bounded keyed
    * delete; optional housekeeping — [[read]] already filters them). */
  def compact(spark: SparkSession, path: String, spec: ViewSpec): Unit = {
    val state = stateTable(path, spec)
    val view = MergeWriter.readView(spark, state)
    if (view.columns.isEmpty) return
    val dead = view.where(col(CountCol) === 0)
      .select(spec.groupCols.map(col): _*)
    if (!dead.isEmpty) MergeWriter.delete(spark, dead, state)
    spec.distinctCols.foreach { c =>
      val sub = distinctStateTable(path, spec, c)
      val rows = MergeWriter.readView(spark, sub)
      if (rows.columns.nonEmpty) {
        val deadV = rows.where(col(VCountCol) === 0)
          .select((spec.groupCols :+ c).map(col): _*)
        if (!deadV.isEmpty) MergeWriter.delete(spark, deadV, sub)
      }
    }
  }

  /** Apply one micro-batch of `(version LONG, change_type STRING,
    * row STRING json)` rows — the `graft-delta` / `graft-iceberg` /
    * `graft-hudi` stream shape — parsing payloads against `rowSchema`.
    * `sourceAt` must snapshot the SOURCE at the batch's end version
    * (only invoked when a min/max group is dirty). */
  def applyCdfBatch(spark: SparkSession, batch: DataFrame,
                    rowSchema: StructType, path: String, spec: ViewSpec,
                    epochId: Long, sourceAt: () => DataFrame): Boolean = {
    val parsed = batch
      .select(col(ChangeCol), from_json(col("row"), rowSchema).as("r"))
      .select(col(ChangeCol) +: rowSchema.fieldNames.toSeq
        .map(f => col(s"r.$f").as(f)): _*)
    applyChanges(spark, parsed, path, spec, epochId, sourceAt)
  }

  /** Apply one micro-batch of binlog-shaped CDC events
    * (`op`/`payload`/`before` — the `graft-binlog` stream with
    * `emitPreimages=true`): updates explode into
    * preimage(before)+postimage(payload) change rows so the old
    * contribution subtracts exactly; an update WITHOUT its before image
    * fails loudly (additive folding would silently double-count). */
  def applyCdcBatch(spark: SparkSession, events: DataFrame,
                    rowSchema: StructType, path: String, spec: ViewSpec,
                    epochId: Long, sourceAt: () => DataFrame): Boolean = {
    // fail at PLAN time with the real explanation: a feed read without
    // emitPreimages has no `before` column at all, and the coalesce
    // guard below would surface as an unresolved-column analysis error
    if (!events.columns.contains("before"))
      throw new IllegalArgumentException(
        "incremental view: the CDC feed carries no `before` column — " +
          "additive folding needs UPDATE preimages; read the binlog " +
          "stream with emitPreimages=true")
    def leg(ct: String, payload: Column) =
      struct(lit(ct).as("ct"), payload.as("row"))
    val beforeOrError = coalesce(col("before"), raise_error(lit(
      "incremental view: UPDATE event without a before image — read the " +
        "binlog stream with emitPreimages=true")))
    val exploded = events.select(explode(
        when(col("op") === "insert", array(leg("insert", col("payload"))))
          .when(col("op") === "delete", array(leg("delete", col("payload"))))
          .when(col("op") === "update", array(
            leg("update_preimage", beforeOrError),
            leg("update_postimage", col("payload"))))
          .otherwise(array(leg("?", col("payload"))))).as("c"))
      .select(col("c.ct").as("change_type"),
        from_json(col("c.row"), rowSchema).as("r"))
      .select(col("change_type") +: rowSchema.fieldNames.toSeq
        .map(f => col(s"r.$f").as(f)): _*)
    applyChanges(spark, exploded, path, spec, epochId, sourceAt)
  }

  /** ONE-CALL CONTINUOUS MART, CDC shape: attach an incremental view to
    * a `graft-binlog` / `graft-pg` stream (`op`/`payload`/`before`
    * events; read the feed with `emitPreimages=true`). Each micro-batch
    * folds through [[applyCdcBatch]] under the stream's own epoch id,
    * so the exactly-once contract is checkpoint + epoch probes: a batch
    * Spark re-delivers after a crash (checkpoint commit lost) SKIPS
    * before any byte is written, and a reset checkpoint fails loudly.
    * `transform` routes/filters the raw feed (e.g.
    * `_.where(col("table") === "orders")`) before parsing. */
  def streamCdcInto(stream: DataFrame, rowSchema: StructType, path: String,
                    spec: ViewSpec, checkpoint: String,
                    sourceAt: () => DataFrame = noSource,
                    transform: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        applyCdcBatch(b.sparkSession, transform(b), rowSchema, path, spec,
          epochId, sourceAt): Unit
      }.start()

  /** ONE-CALL CONTINUOUS MART, CDF shape: attach an incremental view to
    * a `graft-delta` / lake change-feed stream (`change_type` + `row`
    * json). Same exactly-once contract as [[streamCdcInto]]. */
  def streamCdfInto(stream: DataFrame, rowSchema: StructType, path: String,
                    spec: ViewSpec, checkpoint: String,
                    sourceAt: () => DataFrame = noSource,
                    transform: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        applyCdfBatch(b.sparkSession, transform(b), rowSchema, path, spec,
          epochId, sourceAt): Unit
      }.start()

  /** ONE-CALL CONTINUOUS MART, typed-append shape: attach an
    * incremental view to a `graft-bucketed` lake tail
    * ([[BucketedStreamSource]] — TYPED rows, append-only by
    * construction: the source refuses non-append commits). Every row
    * folds as an insert; same exactly-once contract (checkpoint +
    * epoch probes) as the CDC/CDF entry points. Insert-only views
    * never dirty a min/max group, so no `sourceAt` is needed. */
  def streamAppendsInto(stream: DataFrame, path: String, spec: ViewSpec,
                        checkpoint: String,
                        transform: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        applyChanges(b.sparkSession,
          transform(b).withColumn("change_type", lit("insert")),
          path, spec, epochId, noSource): Unit
      }.start()

  private def noSource: () => DataFrame = () =>
    throw new IllegalStateException(
      "incremental view: a min/max group went dirty but no sourceAt was " +
        "provided — pass a source-snapshot closure to the stream entry " +
        "point (count/sum/distinct-only views never need one)")

  /** IVM OVER JOINS — the exact change feed of `A ⋈ B` (equi-join on
    * `joinKeys`) implied by one batch of changes to A and/or B, per the
    * standard delta-join rule over signed multisets:
    *
    *   Δ(A ⋈ B) = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * where a change row's sign (+1 insert/postimage, −1 delete/
    * preimage) MULTIPLIES through the join: a ΔA row joined to a ΔB row
    * contributes sA·sB (two deletes re-create nothing they didn't both
    * remove). `aOld`/`bOld` must snapshot each side BEFORE the batch
    * (the CDF version the changes start from).
    *
    * The output is an ordinary insert/delete change feed over JOINED
    * rows, so every single-relation capability composes for free
    * downstream: [[applyChanges]] folds it into the same bucketed
    * state with the same epoch/replay machinery, filters, distinct
    * sub-states, and the min/max dirty recompute (whose `sourceAt` is
    * then the POST-batch join).
    *
    * Scale: the two old-side joins are DELTA-DRIVEN — a micro-batch
    * side is orders of magnitude smaller than the table, so Catalyst
    * broadcasts it and the old side streams; pass bucketed/pruned
    * snapshots for `aOld`/`bOld` to keep the probe side co-located.
    * Non-key column names must be disjoint across sides (the join
    * output carries both sides' payloads). */
  def joinDelta(changesA: DataFrame, changesB: DataFrame,
                aOld: DataFrame, bOld: DataFrame,
                joinKeys: Seq[String]): DataFrame = {
    require(joinKeys.nonEmpty, "joinDelta needs at least one join key")
    def signedSide(ch: DataFrame, tag: String): DataFrame =
      ch.withColumnRenamed("_change_type", ChangeCol)
        .withColumn(tag,
          when(col(ChangeCol).isin(AddTypes: _*), 1)
            .when(col(ChangeCol).isin(RemoveTypes: _*), -1)
            .otherwise(raise_error(concat(
              lit("join view: change class '"), col(ChangeCol),
              lit("' cannot fold additively — the delta-join rule needs " +
                "a full-payload pre/postimage feed")))))
        .drop(ChangeCol)
    val dA = signedSide(changesA, "_sa")
    val dB = signedSide(changesB, "_sb")
    val aCols = dA.columns.filterNot(c => c == "_sa").toSeq
    val bCols = dB.columns.filterNot(c => c == "_sb").toSeq
    val overlap = (aCols.toSet intersect bCols.toSet) -- joinKeys.toSet
    require(overlap.isEmpty,
      s"join view: non-key columns must be disjoint across sides, " +
        s"shared: ${overlap.mkString(", ")}")
    val outCols = (aCols ++ bCols.filterNot(joinKeys.contains)).map(col)
    def term(df: DataFrame, sign: Column): DataFrame =
      df.select(outCols :+ sign.as(SignCol): _*)
    val t1 = term(dA.join(bOld, joinKeys), col("_sa"))
    val t2 = term(aOld.join(dB, joinKeys), col("_sb"))
    val t3 = term(dA.join(dB, joinKeys), col("_sa") * col("_sb"))
    t1.unionByName(t2).unionByName(t3)
      .withColumn(ChangeCol,
        when(col(SignCol) === 1, lit("insert")).otherwise(lit("delete")))
      .drop(SignCol)
  }

  /** Maintain a two-table join view (`SELECT ... FROM A JOIN B ON k
    * GROUP BY g`) under one batch of changes to either or both sides:
    * [[joinDelta]] + [[applyChanges]]. Pass an empty-change side as an
    * empty DataFrame with the side's change schema. `sourceAt` (needed
    * only when min/max groups go dirty) must snapshot the POST-batch
    * join. Returns false on an idempotent replay. */
  def applyJoinChanges(spark: SparkSession, changesA: DataFrame,
                       changesB: DataFrame, aOld: DataFrame, bOld: DataFrame,
                       joinKeys: Seq[String], path: String, spec: ViewSpec,
                       epochId: Long,
                       sourceAt: () => DataFrame = () =>
                         throw new IllegalStateException(
                           "join view: a min/max group went dirty but no " +
                             "sourceAt was provided — pass the post-batch " +
                             "join snapshot")): Boolean =
    applyChanges(spark,
      joinDelta(changesA, changesB, aOld, bOld, joinKeys),
      path, spec, epochId, sourceAt)

  /** Apply one batch of change rows (payload columns + a
    * `change_type`/`_change_type` column). Returns false when
    * `epochId` was already applied (idempotent replay). */
  def applyChanges(spark: SparkSession, changes: DataFrame, path: String,
                   spec: ViewSpec, epochId: Long,
                   sourceAt: () => DataFrame): Boolean = {
    val state = stateTable(path, spec)
    val existing = {
      val v = MergeWriter.readView(spark, state)
      if (v.columns.isEmpty) None else Some(v)
    }

    // --- exactly-once watermark, two-phase markers: `_ivm_epoch` is the
    // COMMITTED watermark (written after each state commit), `_ivm_intent`
    // the pre-commit intent. Steady state costs O(1) marker reads; the
    // state rows are only re-checked (bucket-pruned agg below) in the
    // genuinely ambiguous window — an intent for THIS epoch with no
    // matching commit marker (crash between commit and marker write), or
    // markers missing entirely while state exists.
    val committed = readMarker(spark, path, CommitMarker)
    committed.foreach { m =>
      if (m == epochId) return false // replayed batch
      if (m > epochId) throw new IllegalStateException(
        s"incremental view $path: incoming epoch $epochId is behind " +
          s"applied epoch $m — the checkpoint was reset (or two " +
          "writers share this view); refusing to re-apply deltas.")
    }
    val ambiguous = (committed.isEmpty && existing.nonEmpty) ||
      readMarker(spark, path, IntentMarker).contains(epochId)

    // filtered view: change rows failing the predicate contribute
    // nothing; pre/postimages filter independently, so a row crossing
    // the boundary folds as a bare insert or bare delete (σ-delta rule)
    val feed0 = changes.withColumnRenamed("_change_type", ChangeCol)
    val feed = spec.filter.fold(feed0)(f => feed0.where(expr(f)))
    val signed0 = feed.withColumn(SignCol,
      when(col(ChangeCol).isin(AddTypes: _*), 1)
        .when(col(ChangeCol).isin(RemoveTypes: _*), -1)
        .otherwise(raise_error(concat(
          lit("incremental view: change class '"), col(ChangeCol),
          lit("' cannot fold additively — additive IVM needs a " +
            "full-payload pre/postimage feed (Delta CDF, binlog row " +
            "images); key-only upsert/delete feeds need a latest-per-key " +
            "election (LakeMirror) or a recompute")))))
    // reused by the distinct sub-state fold AND the main delta aggregate
    val signed = if (spec.distinctCols.isEmpty) signed0
                 else signed0.localCheckpoint(false)

    // spec + pre-commit intent land BEFORE any state write, so a crash
    // anywhere in the multi-state commit replays into the ambiguous
    // window, where each state skips by its own epoch probe
    writeSpecFile(spark, path, spec)
    writeMarker(spark, path, IntentMarker, epochId)
    spec.distinctCols.foreach(c =>
      applyOneDistinct(spark, signed, path, spec, c, epochId, ambiguous))

    // --- one map-side delta aggregate over the batch
    val sgn = col(SignCol)
    val aggExprs: Seq[Column] =
      Seq(sum(sgn).cast("long").as("_d_count")) ++
        spec.sumCols.map(c => sum(col(c) * sgn).as(s"_d_sum_$c")) ++
        spec.sumCols.map(c => sum(when(col(c).isNotNull, sgn).otherwise(0))
          .cast("long").as(s"_d_cnt_$c")) ++
        spec.minCols.flatMap(c => Seq(
          min(when(sgn === 1, col(c))).as(s"_ins_min_$c"),
          min(when(sgn === -1, col(c))).as(s"_rm_min_$c"))) ++
        spec.maxCols.flatMap(c => Seq(
          max(when(sgn === 1, col(c))).as(s"_ins_max_$c"),
          max(when(sgn === -1, col(c))).as(s"_rm_max_$c")))
    val deltas = signed.groupBy(spec.groupCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)

    // --- old state for touched groups only: bucket-pruned scan + join
    val joined = existing match {
      case None => // first batch: no old columns, synthesize them as null
        val withNulls = (Seq(CountCol -> lit(null).cast("long")) ++
          spec.sumCols.map(c => sumCol(c) -> lit(null)) ++
          spec.sumCols.map(c => cntCol(c) -> lit(null).cast("long")) ++
          spec.minCols.map(c => minCol(c) -> lit(null)) ++
          spec.maxCols.map(c => maxCol(c) -> lit(null)))
        withNulls.foldLeft(deltas) { case (df, (n, v)) => df.withColumn(n, v) }
      case Some(st) =>
        val touched = deltas.select(bucketExpr(spec).as(BucketCol))
          .distinct().collect().map(_.getLong(0)) // bounded by spec.buckets
        val oldPruned = st.where(col(BucketCol).isin(touched.toSeq: _*))
        // ambiguous-window only: authoritative replay check over the SAME
        // pruned scan the merge uses — a replayed batch re-touches these
        // buckets, whose rows carry its epoch even when the commit-marker
        // write was lost mid-crash
        if (ambiguous) {
          val row = oldPruned.agg(max(col(EpochCol))).head()
          if (!row.isNullAt(0)) {
            val applied = row.getLong(0)
            if (applied == epochId) {
              writeMarker(spark, path, CommitMarker, epochId)
              return false
            }
            if (applied > epochId) throw new IllegalStateException(
              s"incremental view $path: incoming epoch $epochId is behind " +
                s"applied epoch $applied — the checkpoint was reset (or two " +
                "writers share this view); refusing to re-apply deltas.")
          }
        }
        // pre-round-12 state has no cnt_<c> columns: synthesize them
        // from view_count (its historical null-free-measure assumption)
        val oldWithCnt = spec.sumCols.foldLeft(oldPruned)((df, c) =>
          if (df.columns.contains(cntCol(c))) df
          else df.withColumn(cntCol(c), col(CountCol)))
        deltas.join(oldWithCnt.drop(BucketCol, EpochCol), spec.groupCols, "left")
    }

    // --- merge deltas into the stored aggregates
    val oldCount = coalesce(col(CountCol), lit(0L))
    val newCount = oldCount + col("_d_count")
    def addNullSafe(a: Column, b: Column): Column =
      when(a.isNull, b).when(b.isNull, a).otherwise(a + b)
    // dirty = a removed value ties-or-beats the CANDIDATE extreme
    // (least/greatest of stored and batch-inserted) — comparing against
    // the stored extreme alone misses a value inserted AND removed within
    // one batch, which would otherwise survive as a phantom min/max
    val minDirty = spec.minCols.map(c =>
      col(s"_rm_min_$c").isNotNull &&
        col(s"_rm_min_$c") <= least(col(minCol(c)), col(s"_ins_min_$c")))
    val maxDirty = spec.maxCols.map(c =>
      col(s"_rm_max_$c").isNotNull &&
        col(s"_rm_max_$c") >= greatest(col(maxCol(c)), col(s"_ins_max_$c")))
    val anyDirty = (minDirty ++ maxDirty)
      .reduceOption(_ || _).getOrElse(lit(false)) && newCount > 0

    val mergedCols: Seq[Column] =
      spec.groupCols.map(col) ++
        Seq(when(newCount < 0, raise_error(lit(
            "incremental view: negative count for a group — the feed " +
              "removed rows the view never saw")).cast("long"))
          .otherwise(newCount).as(CountCol)) ++
        spec.sumCols.map(c =>
          when(newCount === 0, lit(null))
            .otherwise(addNullSafe(col(sumCol(c)), col(s"_d_sum_$c")))
            .as(sumCol(c))) ++
        spec.sumCols.map(c =>
          when(newCount === 0, lit(0L))
            .otherwise(coalesce(col(cntCol(c)), lit(0L)) + col(s"_d_cnt_$c"))
            .as(cntCol(c))) ++
        spec.minCols.map(c =>
          when(newCount === 0, lit(null))
            .otherwise(least(col(minCol(c)), col(s"_ins_min_$c")))
            .as(minCol(c))) ++
        spec.maxCols.map(c =>
          when(newCount === 0, lit(null))
            .otherwise(greatest(col(maxCol(c)), col(s"_ins_max_$c")))
            .as(maxCol(c))) ++
        Seq(anyDirty.as("_view_dirty"))
    // bounded by touched groups; re-used for the dirty probe and the write
    val merged = joined.select(mergedCols: _*).localCheckpoint(false)

    // --- dirty groups: re-aggregate min/max from the source, pruned to them
    val dirtyKeys = merged.where(col("_view_dirty"))
      .select(spec.groupCols.map(col): _*)
    val finalRows =
      if ((spec.minCols.isEmpty && spec.maxCols.isEmpty) || dirtyKeys.isEmpty)
        merged.drop("_view_dirty")
      else {
        val recAggs = spec.minCols.map(c => min(col(c)).as(s"_rec_min_$c")) ++
          spec.maxCols.map(c => max(col(c)).as(s"_rec_max_$c"))
        val src = spec.filter.fold(sourceAt())(f => sourceAt().where(expr(f)))
        val rec = src
          .join(dirtyKeys, spec.groupCols, "left_semi")
          .groupBy(spec.groupCols.map(col): _*)
          .agg(recAggs.head, recAggs.tail: _*)
        val patched = merged.join(rec, spec.groupCols, "left")
        val cols = spec.groupCols.map(col) ++ Seq(col(CountCol)) ++
          spec.sumCols.map(c => col(sumCol(c))) ++
          spec.sumCols.map(c => col(cntCol(c))) ++
          spec.minCols.map(c => when(col("_view_dirty"),
            col(s"_rec_min_$c")).otherwise(col(minCol(c))).as(minCol(c))) ++
          spec.maxCols.map(c => when(col("_view_dirty"),
            col(s"_rec_max_$c")).otherwise(col(maxCol(c))).as(maxCol(c)))
        patched.select(cols: _*)
      }

    // --- ONE keyed upsert commit: bucket-partitioned, epoch-stamped
    val out = finalRows
      .withColumn(BucketCol, bucketExpr(spec))
      .withColumn(EpochCol, lit(epochId))
    // spec file + intent marker were written before the first state
    // touch (above); this is the last state write of the epoch
    MergeWriter.upsert(spark, out, state)
    writeMarker(spark, path, CommitMarker, epochId)
    deleteMarker(spark, path, IntentMarker)
    true
  }

  /** Fold one batch's value-count deltas for distinct column `c` into
    * its sub-state: `(group, value) -> count` rows updated additively,
    * zero counts kept as tombstones (bucket writes stay keyed upserts;
    * [[compact]] drops them). Carries its OWN ambiguous-window epoch
    * probe — the multi-state commit (sub-states, then main) can crash
    * between states, and each must independently skip a replayed fold. */
  private def applyOneDistinct(spark: SparkSession, signed: DataFrame,
                               path: String, spec: ViewSpec, c: String,
                               epochId: Long, ambiguous: Boolean): Unit = {
    val table = distinctStateTable(path, spec, c)
    val keyCols = spec.groupCols :+ c
    // nulls ignored, matching SQL COUNT(DISTINCT c); zero net deltas
    // dropped so the write set is bounded by genuinely-changed values
    val dv = signed.where(col(c).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(SignCol)).cast("long").as("_d_vc"))
      .where(col("_d_vc") =!= 0)
      .localCheckpoint(false) // reused: bucket probe + join + write
    if (dv.isEmpty) return
    val existing = {
      val v = MergeWriter.readView(spark, table)
      if (v.columns.isEmpty) None else Some(v)
    }
    val joined = existing match {
      case None => dv.withColumn(VCountCol, lit(null).cast("long"))
      case Some(st) =>
        val touched = dv.select(bucketExpr(spec).as(BucketCol))
          .distinct().collect().map(_.getLong(0)) // bounded by spec.buckets
        val pruned = st.where(col(BucketCol).isin(touched.toSeq: _*))
        if (ambiguous) {
          val row = pruned.agg(max(col(EpochCol))).head()
          if (!row.isNullAt(0)) {
            val applied = row.getLong(0)
            if (applied == epochId) return // this sub-state already folded
            if (applied > epochId) throw new IllegalStateException(
              s"incremental view $path: distinct sub-state for '$c' is at " +
                s"epoch $applied, ahead of incoming $epochId — the " +
                "checkpoint was reset; refusing to re-apply deltas.")
          }
        }
        dv.join(pruned.drop(BucketCol, EpochCol), keyCols, "left")
    }
    val newV = coalesce(col(VCountCol), lit(0L)) + col("_d_vc")
    val rows = joined.select(keyCols.map(col) :+
        when(newV < 0, raise_error(lit(
          "incremental view: negative distinct-value count — the feed " +
            "removed values the view never saw")).cast("long"))
          .otherwise(newV).as(VCountCol): _*)
      .withColumn(BucketCol, bucketExpr(spec))
      .withColumn(EpochCol, lit(epochId))
    MergeWriter.upsert(spark, rows, table)
  }

  // ------------------------------------------------------------ markers

  private val CommitMarker = "_ivm_epoch"
  private val IntentMarker = "_ivm_intent"

  private def markerPath(path: String, name: String) =
    new org.apache.hadoop.fs.Path(path, name)

  private def readMarker(spark: SparkSession, path: String,
                         name: String): Option[Long] = {
    val p = markerPath(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      // read to EOF — a single read() may legally return a prefix on
      // HDFS/object-store streams, truncating the epoch digits
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 64, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        .trim.toLongOption
    } finally in.close()
  }

  private def writeMarker(spark: SparkSession, path: String, name: String,
                          epoch: Long): Unit = {
    val p = markerPath(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(epoch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def deleteMarker(spark: SparkSession, path: String,
                           name: String): Unit = {
    val p = markerPath(path, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false): Unit
  }
}
