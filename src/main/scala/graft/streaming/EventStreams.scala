package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics over the `events` stream shape
  * (event_id, ts_ms, user_id, event_type, value) — the watermarked /
  * stateful operators the reference never needed (its CDC path absorbs
  * late data via idempotent upsert, SURVEY.md §2.4) but a training-data
  * pipeline does: windowed rollups for monitoring, session assembly for
  * behavioral features.
  *
  * Scale notes: both operators shuffle once on their grouping key; state
  * size is bounded by the watermark (windows) / explicit processing-time
  * timeout (sessions), so executors hold O(active keys), never O(history).
  */
object EventStreams {

  /** Tumbling-window rollup with a watermark: counts + sum(value) per
    * (window, event_type); late rows beyond `lateness` are dropped and the
    * window state is reclaimed. Append mode — rows emit once, when final. */
  def hourlyRollup(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("sum_value"))

  final case class SessionEvent(user_id: Long, event_id: Long, ts_ms: Long)
  final case class SessionEventTs(user_id: Long, event_id: Long, ts_ms: Long,
                                  ts: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState + event-time timeout): a session closes when
    * the WATERMARK passes `last event + gapMs` — deterministic in event
    * time, replay-safe, and state for idle users is reclaimed by the same
    * timeout. Emits one row per closed session (update-mode output; closed
    * sessions are final by construction). */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 lateness: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val withTs = events.toDF()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", lateness)
      .as[SessionEventTs]
    withTs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEventTs], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_ms - s.last <= gapMs =>
                  cur = Some(s.copy(last = e.ts_ms, n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.last, s.n)
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
                case None =>
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must stay strictly ahead of the current watermark
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup at ingest — the streaming face of the batch
    * dedup operators: duplicates of `keys` arriving within the watermark
    * horizon are emitted once. State per key is dropped once the watermark
    * passes it (`dropDuplicatesWithinWatermark`), so executors hold
    * O(keys-per-horizon), never O(stream history) — the property that
    * makes ingest-time dedup feasible on an unbounded 100 TB/day feed. */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  lateness: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: each left event pairs with right events
    * of the same key whose timestamp lies in [left.ts - maxDelayMs,
    * left.ts]. Both sides are watermarked, and the time-bound join
    * condition lets Spark expire right-side state past the interval —
    * bounded state, the requirement for an unbounded enrichment join.
    * Column names: left keeps its names; right contributes `r_event_id`,
    * `r_ts_ms`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   maxDelayMs: Long, lateness: String = "30 minutes"): DataFrame = {
    val l = left
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", lateness)
    val r = right
      .select(col(key).as("r_key"), col("event_id").as("r_event_id"),
        col("ts_ms").as("r_ts_ms"))
      .withColumn("r_ts", timestamp_millis(col("r_ts_ms")))
      .withWatermark("r_ts", lateness)
    l.join(r,
      col(key) === col("r_key") &&
        // MILLISECOND unit: a sub-second maxDelayMs must not floor to 0
        col("r_ts") >= col("ts") - expr(s"INTERVAL $maxDelayMs MILLISECOND") &&
        col("r_ts") <= col("ts"))
      .drop("r_key", "ts", "r_ts")
  }

  /** Stream-static enrichment join: each event picks up the dimension row
    * for its key. The dim side is broadcast-hinted, so every micro-batch
    * plans a broadcast hash join — the STREAM side never shuffles, which is
    * the property that holds at 100 TB/day event volume. The static side is
    * re-evaluated per micro-batch: pass a lake-table `readView` and
    * slowly-changing dimension updates are picked up on the next trigger
    * without restarting the query. Left join keeps unmatched events
    * (null-filled dim columns) rather than silently dropping them. */
  def enrich(events: DataFrame, dim: DataFrame, key: String,
             joinType: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)
}
