package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming slice of the analytics surface.
  *
  * The reference is batch-only (SURVEY.md §2.9): its "incremental" mode is a
  * date-partitioned daily re-run. At 100 TB that re-read is the bottleneck,
  * so the streaming module re-expresses the zone-mart counting grain as an
  * incremental pipeline: `readStream` over the same parquet lake (or Kafka),
  * event-time windowed counts with a watermark for late data, and a
  * `mapGroupsWithState` sessionizer for the per-user state the batch jobs
  * recompute from scratch each day.
  *
  * Every transform here takes/returns DataFrames so the identical code runs
  * on a `MemoryStream` in tests, a file stream locally, and Kafka in
  * production — Spark plans the incremental execution.
  */
object EventStream {

  /** Event-time windowed counts per event type: the streaming twin of the
    * zone mart's (week, event_type) rollup. Late events beyond the watermark
    * are dropped by Spark's state cleanup rather than accumulating state
    * forever — the property that keeps this runnable on an unbounded stream.
    */
  def windowedTypeCounts(events: DataFrame,
                         watermark: String = "1 hour",
                         windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("events"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("events"), col("approx_users"))

  /** Session-window aggregation: events gapped less than `gap` apart merge
    * into one variable-length window per user — the "visit" grain a
    * fixed-length tumbling window cannot express. Works identically on
    * batch and streaming frames.
    */
  def sessionWindowCounts(events: DataFrame,
                          watermark: String = "1 hour",
                          gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("events"))

  /** Exactly-once event dedup under at-least-once delivery: one row per
    * `event_id` survives no matter how many times the source redelivers.
    * Streaming frames use `dropDuplicatesWithinWatermark` so the dedup
    * state is BOUNDED — ids older than the watermark are evicted, the
    * property that keeps this runnable forever on an unbounded stream
    * (plain `dropDuplicates` would grow state per-id without limit).
    * Batch frames (the oracle twin, where redelivery is a union) take the
    * plain distinct path — watermark semantics don't exist in batch.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Per-user running session state maintained across micro-batches. */
  case class UserSession(userId: Long, events: Long, lastTsMicros: Long)
  case class SessionUpdate(user_id: Long, events: Long, last_ts_micros: Long,
                           closed: Boolean)

  /** Stateful sessionization via `mapGroupsWithState`: per-user running
    * event count and last-seen timestamp maintained in the state store
    * across micro-batches. (Idle-session expiry would add a
    * `GroupStateTimeout` + `state.setTimeoutDuration`; kept timeout-free so
    * batch progress never depends on wall-clock advancement.)
    */
  def sessionize(events: Dataset[(Long, Long)]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserSession, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[UserSession]) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(UserSession(userId, 0L, 0L))
          val next = UserSession(userId,
            prev.events + batch.size,
            math.max(prev.lastTsMicros, batch.map(_._2).max))
          state.update(next)
          SessionUpdate(next.userId, next.events, next.lastTsMicros,
            closed = false)
      }
  }

  /** Wire a streaming frame to an in-memory table (tests) or console. */
  def startToMemory(df: DataFrame, queryName: String,
                    outputMode: OutputMode = OutputMode.Update()) =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
}
