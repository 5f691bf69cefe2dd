package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

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

  /** SLIDING event-time windows: length `windowLen`, advancing every
    * `slide` — each event lands in len/slide overlapping windows (the
    * smoothing a tumbling window can't give: a burst at a window boundary
    * splits across tumbling buckets but is fully visible in some sliding
    * one). Spark assigns the window set per-row at plan time (a
    * generator, no state beyond the per-window aggregates), watermark
    * eviction closes windows once `start + len` falls behind — state is
    * len/slide live windows per (window, type) key, bounded. Works
    * identically on batch and streaming frames (q115 pins the batch twin
    * against a generate_series oracle).
    */
  def slidingTypeCounts(events: DataFrame,
                        watermark: String = "1 hour",
                        windowLen: String = "1 hour",
                        slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("events"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("events"))

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

  case class OpenSession(userId: Long, events: Long, firstTsMicros: Long,
                         lastTsMicros: Long)
  case class ClosedSession(user_id: Long, events: Long,
                           first_ts_micros: Long, last_ts_micros: Long)

  /** Closed-session EMISSION via `flatMapGroupsWithState` + event-time
    * timeout — the output shape [[sessionize]] cannot produce: that one
    * reports running state per batch (0..1 rows per group per batch);
    * this one emits each session exactly once, WHEN it closes (0..n rows
    * per group per batch — the flatMap in the name).
    *
    * A session closes two ways, both deterministic in event time:
    *  - '''in-batch''': a gap > `gapMicros` between consecutive events of
    *    the same user inside the sorted batch closes the earlier run
    *    immediately;
    *  - '''by timeout''': the still-open tail session is parked in the
    *    state store with `setTimeoutTimestamp(last + gap)`; it fires when
    *    the WATERMARK passes that instant (never wall-clock — batch
    *    progress can't depend on the test machine's clock), i.e. in the
    *    first micro-batch after later events prove the gap.
    *
    * A within-watermark straggler more than `gapMicros` BEFORE the open
    * session's start (possible only when the watermark delay exceeds the
    * gap) closes as its own session rather than extending the open window
    * backward — the same islands single-batch processing of those events
    * would produce, so output never depends on micro-batch boundaries.
    *
    * State is one `OpenSession` per active user — bounded by active users,
    * with the watermark timeout as the eviction path (an idle user costs
    * one state row until the watermark passes their last event + gap,
    * then nothing).
    *
    * Input: a streaming frame with (user_id: long, ts: timestamp), a
    * watermark already applied by the caller (the timeout clock IS the
    * watermark).
    */
  def closedSessions(events: DataFrame,
                     gapMicros: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "ts")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(s.userId, s.events,
              s.firstTsMicros, s.lastTsMicros))
          } else {
            // full microsecond precision: getTime is whole millis, the
            // sub-ms part lives in getNanos (Tables.events carries µs)
            val ts = rows.map { r =>
              val t = r._2
              (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
            }.toArray
            java.util.Arrays.sort(ts)
            // Gaps-and-islands over {open state session} ∪ {batch events},
            // treating the open session as the INTERVAL [first, last]: its
            // internal gaps are all <= gap by construction, so for merge
            // purposes the interval behaves exactly like its constituent
            // events, and the output is identical to processing every event
            // in a single batch — micro-batch boundaries cannot change it.
            // In particular a within-watermark straggler more than `gap`
            // BEFORE the open session's start (possible whenever the
            // watermark delay exceeds the gap) closes as its own session
            // instead of being swallowed into a window it never belonged
            // to. It can never reopen an already-emitted session either:
            // the timeout fires only once the watermark passes last + gap,
            // and any event accepted after that is itself > last + gap.
            val runs = scala.collection.mutable.ArrayBuffer[OpenSession]()
            state.getOption.foreach(runs += _)
            ts.foreach(t => runs += OpenSession(userId, 1L, t, t))
            val sorted = runs.sortBy(r => (r.firstTsMicros, r.lastTsMicros))
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var open = sorted.head
            sorted.tail.foreach { r =>
              if (r.firstTsMicros - open.lastTsMicros > gapMicros) {
                closed += ClosedSession(open.userId, open.events,
                  open.firstTsMicros, open.lastTsMicros)
                open = r
              } else
                open = OpenSession(userId, open.events + r.events,
                  open.firstTsMicros,
                  math.max(open.lastTsMicros, r.lastTsMicros))
            }
            state.update(open)
            // fires when the WATERMARK passes last + gap; the state store
            // clock is whole milliseconds, so round UP — truncating could
            // fire the timeout up to ~1ms before last + gap has elapsed and
            // split one semantic session in two, batch-dependently
            state.setTimeoutTimestamp(
              (open.lastTsMicros + gapMicros + 999L) / 1000L)
            closed.iterator
          }
      }
  }

  /** Batch twin of [[closedSessions]] — the oracle-able face of the
    * streaming emission (X68/q98). Plain gaps-and-islands with the SAME
    * boundary rule (events merge iff the gap to the previous event is
    * <= `gapMicros`; strictly-greater closes), then drop each user's LAST
    * island: that island is the still-open tail a streaming run has not
    * emitted — only sessions proven closed by a later event of the same
    * user appear, which is exactly the batch-deterministic subset of the
    * streaming output (timeout-fired tails depend on how far the global
    * watermark happens to advance; gap-closed sessions do not).
    *
    * One hash-partition exchange on user_id serves both windows and the
    * final aggregate — at 100 TB this is the one unavoidable shuffle of
    * any per-user sessionization, and the window state is a running count
    * (no buffering of the partition).
    *
    * Duplicate timestamps are safe: however `lag` breaks the tie, the
    * in-pair gap is 0 <= gapMicros, so the island assignment — and with it
    * every output row — is order-independent.
    */
  def closedSessionsBatchTwin(events: DataFrame, gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("__t")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("__t"))
      .withColumn("__prev", lag("__t", 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          col("__t") - col("__prev") > gapMicros, 1).otherwise(0))
      .withColumn("__sid", sum("__brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(count(lit(1)).as("events"),
        min("__t").as("first_ts_micros"),
        max("__t").as("last_ts_micros"))
      .withColumn("__maxsid",
        max("__sid").over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")))
      .filter(col("__sid") < col("__maxsid"))
      .select(col("user_id"), col("events"),
        col("first_ts_micros"), col("last_ts_micros"))
  }

  /** Stream-stream click→purchase attribution: every purchase pairs with
    * each same-user click in the preceding `horizonMinutes` — the last big
    * Structured Streaming surface beside windowed aggregation (q47),
    * session windows (q50/q98), stateful emission (X68) and streaming
    * dedup (q67). On streaming inputs both sides carry watermarks and the
    * join keeps its time-RANGE condition on the raw event-time columns —
    * exactly what Spark's state-cleanup analysis needs to bound the
    * buffers: a click evicts once the purchase watermark passes
    * click.ts + horizon, a purchase as soon as its own watermark passes
    * (purchases never match older-than-horizon clicks). Without the range
    * condition, stream-stream inner join state grows forever — the same
    * unbounded-state failure `dropDuplicates` has in q67.
    *
    * The SAME code runs on batch frames (no watermarks — they don't exist
    * in batch) and is the q102 oracle twin; timestamps leave as epoch
    * micros, never raw TIMESTAMP (driver-comparator contract). Purchases
    * with no prior click simply don't appear (inner join — the
    * attribution grain); the horizon bound is inclusive on both ends.
    *
    * 100 TB shape: the join is user-keyed equi + time residual, so state
    * and shuffle partition by user_id; per-user buffered state is bounded
    * by horizon + watermark delay worth of events.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      horizonMinutes: Int = 30,
                      watermark: String = "1 hour"): DataFrame = {
    val (c, p) =
      if (clicks.isStreaming)
        (clicks.withWatermark("ts", watermark),
          purchases.withWatermark("ts", watermark))
      else (clicks, purchases)
    val cc = c.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val pp = p.select(col("event_id").as("purchase_id"),
      col("user_id").as("__pu"), col("ts").as("purchase_ts"), col("value"))
    cc.join(pp,
        col("user_id") === col("__pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") +
            expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"), col("value"))
  }

  /** Stream-STATIC enrichment join — the remaining Structured Streaming
    * join surface beside the stream-stream range join above: each event
    * picks up its user's dimension attributes from a BATCH table. The join
    * is STATELESS — no watermark, no state store, nothing to evict: every
    * micro-batch hash-joins its rows against the static relation (the spec
    * asserts `stateOperators` stays empty), which is the property that
    * distinguishes this from the stream-stream case and makes it the
    * default enrichment tool.
    *
    * LEFT join, not inner: an event whose user is missing from the
    * dimension must survive with NULL attributes — silently dropping
    * events on a dim gap is the classic enrichment bug.
    *
    * 100 TB shape: the dimension rides as a BROADCAST (dims are
    * customer/geo-sized, events are the 100 TB side), so the stream never
    * shuffles — each executor probes its local hash relation per batch.
    *
    * FROZEN-DIM CAVEAT (measured, and pinned by the spec): a
    * parquet-backed static frame's file listing is captured when the
    * QUERY STARTS and never re-listed — files appended to the dim path
    * mid-query are silently invisible to later batches, an in-place
    * overwrite fails the next batch with FILE_NOT_EXIST (the listing
    * points at deleted part files), and `spark.catalog.refreshByPath`
    * does not reach a running query's already-analyzed plan (all three
    * probed on this Spark). A dimension that REFRESHES while the query
    * runs must re-read per batch: [[enrichEventsPerBatch]].
    *
    * `dim`'s `dimKey` column joins `events.user_id`; all other dim
    * columns attach. The join condition is explicit (no rename), the dim
    * key is dropped from the output, and the remaining dim attribute
    * names are REQUIRED disjoint from the event columns — a rename-based
    * join silently produced duplicate/ambiguous columns when the dim
    * already carried a `user_id` or shared an attribute name with the
    * events.
    */
  def enrichEvents(events: DataFrame, dim: DataFrame,
                   dimKey: String): DataFrame = {
    val clash = dim.columns.filter(_ != dimKey).toSet
      .intersect(events.columns.toSet)
    require(clash.isEmpty,
      s"dim attribute columns collide with event columns: " +
        s"${clash.mkString(", ")} — rename them before enriching")
    val d = broadcast(dim)
    events.join(d, events("user_id") === d(dimKey), "left")
      .drop(d(dimKey))
  }

  /** Stream-static enrichment with a PER-BATCH-REFRESHED dimension — the
    * slowly-changing-dim variant of [[enrichEvents]]: `readDim` runs
    * inside `foreachBatch` at every trigger, so each micro-batch builds a
    * FRESH dim frame (new file listing, new broadcast) and in-place
    * rewrites or appended files land at the next batch boundary — the
    * semantics the frozen static join above cannot give without a query
    * restart. Within a batch the join is the same stateless broadcast
    * left join, so the per-event cost is identical; the refresh costs one
    * dim re-read per trigger, which is the right trade for a
    * customer-sized dim under a minutes-scale trigger.
    *
    * `write` receives each enriched micro-batch with its batch id —
    * foreachBatch's contract (exactly-once only as far as `write` is
    * idempotent on batch id, same as any foreachBatch sink).
    */
  def enrichEventsPerBatch(events: DataFrame, readDim: () => DataFrame,
                           dimKey: String)(
      write: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: java.lang.Long) =>
        write(enrichEvents(batch.toDF(), readDim(), dimKey), batchId)
    }

  /** Streaming MODEL-MAINTENANCE sink — the arrival path of the
    * incremental-maintenance family: each micro-batch folds into the
    * running model state via `fold`
    * ([[graft.ext.Similarity.kmeansFold]]/`pqFold`/`ivfPqFold`/
    * `energyFold` all fit the signature), the state rides across
    * triggers as a driver-local frame (model-sized by the fold
    * contract — the folds' own collects bound it), and `publish`
    * receives each updated state with its batch id (write it to the
    * content-keyed store for downstream sessions; idempotent-on-batch-id
    * is foreachBatch's usual contract).
    *
    * SEMANTICS: foreachBatch delivers micro-batches SEQUENTIALLY in
    * trigger order, so the final state after N triggers is exactly the
    * N-fold CHAIN over the same batches in arrival order — the
    * sequential mini-batch semantics every fold documents, spec-pinned
    * here on a MemoryStream against the batch chain. The batch face of
    * the same chain is the oracle-able catalog query (q182), so the
    * streaming path's target value is itself under the cross-engine
    * hash.
    */
  def foldPerBatch(batches: DataFrame, state0: DataFrame,
                   fold: (DataFrame, DataFrame) => DataFrame)(
      publish: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataStreamWriter[Row], () => DataFrame) = {
    @volatile var st = state0
    val w = batches.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: java.lang.Long) =>
        st = fold(st, batch.toDF())
        publish(st, batchId)
    }
    (w, () => st)
  }

  /** [[foldPerBatch]] with the RESTART story closed (round-16, verdict
    * item 3): each folded state is published to the content-keyed store
    * under its batch id, and a fresh session RESUMES from the
    * highest-batch-id published state instead of `state0` — the state
    * survives the driver, not just the trigger loop. Three restart facts
    * this encodes, spec-pinned on a kill/resume MemoryStream pair:
    *
    *  - RESUME: at construction the store is probed
    *    ([[resumeFoldState]]); if any `(name, key)` state is published,
    *    the chain continues from it and `state0` is ignored — the spec
    *    passes a deliberately WRONG `state0` on the resumed leg to prove
    *    the store, not the argument, feeds the fold.
    *  - REPLAY: after a crash, Structured Streaming re-delivers the
    *    in-flight micro-batch under its ORIGINAL batch id (same
    *    checkpoint). A batch id ≤ the resumed high-water mark is already
    *    folded INTO the resumed state, so folding it again would
    *    double-count — it is skipped, which is exactly the
    *    idempotent-on-batch-id contract `foreachBatch` documents, applied
    *    to state maintenance. Publication itself is idempotent too
    *    (`ensureMaterialized` no-ops on a published key).
    *  - COLD START: a wiped store (`/tmp` is cleared between sessions
    *    here — observed round 13) resumes nothing; the chain restarts
    *    from `state0` and the source replays from its own retention,
    *    which is the correct recovery when the derived state is gone.
    *
    * `storeKey` must be stable across restarts for the SAME logical
    * stream (it keys the store, like any content key) and carry the
    * state's derivation parameters.
    */
  def foldPerBatchResumable(batches: DataFrame, state0: DataFrame,
                            fold: (DataFrame, DataFrame) => DataFrame,
                            storeName: String, storeKey: String)
      : (DataStreamWriter[Row], () => DataFrame) = {
    val spark = batches.sparkSession
    val resumed = resumeFoldState(spark, storeName, storeKey)
    @volatile var st = resumed.map(_._1).getOrElse(state0)
    @volatile var last = resumed.map(_._2).getOrElse(-1L)
    val w = batches.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: java.lang.Long) =>
        if (batchId > last) {
          val folded = fold(st, batch.toDF())
          graft.sources.Tables.ensureMaterialized(spark,
            s"${storeName}_b$batchId", storeKey)(folded)
          st = folded
          last = batchId
        } // else: replayed batch, already folded into the resumed state
    }
    (w, () => st)
  }

  /** Latest published fold state for `(name, key)`: scans the scratch
    * root for `graft_mat_{name}_b{batchId}_{key}` publications (the
    * layout [[foldPerBatchResumable]] writes through
    * `Tables.ensureMaterialized`) and returns the highest-batch-id one
    * with its id, or None on a cold/wiped store. Only `_SUCCESS`-marked
    * directories count — a crash mid-publish leaves staging dirs the
    * atomic-rename protocol never exposes here.
    */
  def resumeFoldState(spark: org.apache.spark.sql.SparkSession,
                      name: String, key: String): Option[(DataFrame, Long)] = {
    val tmpRoot = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val pat = ("graft_mat_" + java.util.regex.Pattern.quote(name) +
      "_b(\\d+)_" + java.util.regex.Pattern.quote(key)).r
    Option(tmpRoot.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .flatMap { f =>
        f.getName match {
          case pat(bid) if new java.io.File(f, "_SUCCESS").exists() =>
            Some((bid.toLong, f))
          case _ => None
        }
      }
      .sortBy(-_._1).headOption
      .map { case (bid, f) =>
        (spark.read.parquet(f.getAbsolutePath), bid)
      }
  }

  /** Cross-batch state of one L-gram key: the buffered first occurrence
    * awaiting a duplicate, and whether the key has already proven
    * duplicated (later occurrences then emit immediately). */
  case class GramFirst(id: Long, pos: Long, dup: Boolean)

  /** [[GramFirst]] plus the max event-time (ms) over every occurrence seen —
    * the evicting variant's state. Carrying the clock in the state makes the
    * timeout MONOTONE in the latest occurrence: a batch whose rows are all
    * out-of-order (below a previously seen ts, yet non-late) must not pull
    * the timeout back below lastOcc + horizon, or the watermark could pass
    * it, evict, and a within-horizon follow-up would miss — violating the
    * GUARANTEED clause (whose proof assumes timeout = lastOcc + horizon
    * with lastOcc the max over ALL occurrences).
    *
    * STATE-FORMAT BREAK (r12): this type replaced `GramFirst` as the
    * evicting query's state encoder, so a checkpoint written by the
    * pre-r12 build cannot be restarted against this one — Spark's state
    * schema compatibility check rejects the extra `lastOccMs` field.
    * Deliberate: the old schema cannot express a monotone clock (the bug
    * being fixed), so a versioned wrapper would carry a field that must
    * never be absent. Restarting the evicting stream across this change
    * requires a fresh checkpoint directory (reprocess from the source). */
  case class GramFirstTs(id: Long, pos: Long, dup: Boolean, lastOccMs: Long)

  /** Streaming ExactSubstr duplicated-gram starts — the cross-batch gram
    * state the batch operator ([[graft.ext.Dedup.exactSubstrSpans]])
    * derives with a corpus-wide count + semi-join: keyed by `gram_key`,
    * the state buffers the FIRST occurrence of each gram; when a second
    * arrives (this batch or any later one), both emit, and every
    * subsequent occurrence emits immediately. The emitted set after any
    * prefix of batches is EXACTLY the duplicated-gram starts of the union
    * of those batches — occurrence-count semantics (a gram repeated twice
    * INSIDE one doc duplicates), identical to the batch semi-join, and
    * independent of how docs split across micro-batches.
    *
    * Run on a BATCH frame the same code is the one-shot grouping (state
    * starts empty, one invocation per key) — that face is the oracle-able
    * catalog query, pinned hash-identical to q149; the incremental
    * multi-batch path is spec-proven equal on a MemoryStream.
    *
    * State is one (id, pos, dup) row per DISTINCT gram key —
    * vocabulary-of-grams-sized, the inverted index the batch job shuffles,
    * held incrementally instead. NoTimeout: the corpus replay is finite
    * (availableNow); an unbounded production feed would add a watermark
    * eviction policy as a recall/latency trade.
    *
    * Input: (id: long, pos: long, gram_key: long) from
    * [[graft.ext.Dedup.gramKeyStarts]]. Output: (id, pos) duplicated
    * starts, mergeable by [[graft.ext.Dedup.mergeSpanStarts]].
    */
  def exactSubstrStarts(grams: DataFrame, id: String): DataFrame = {
    import grams.sparkSession.implicits._
    grams.select(col("gram_key"), col(id), col("pos"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GramFirst, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[GramFirst]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var s = state.getOption.orNull
          rows.foreach { case (_, docId, pos) =>
            if (s == null) s = GramFirst(docId, pos, dup = false)
            else if (!s.dup) {
              out += ((s.id, s.pos)); out += ((docId, pos))
              s = s.copy(dup = true)
            } else out += ((docId, pos))
          }
          state.update(s)
          out.iterator
      }
      .toDF(id, "pos")
  }

  /** [[exactSubstrStarts]] with WATERMARK EVICTION — the unbounded-feed
    * tier the NoTimeout form's scaladoc names: gram state older than
    * `horizonMs` of event time is dropped, so state is bounded by the
    * horizon's gram arrival volume instead of the whole history's gram
    * vocabulary.
    *
    * The recall/latency trade, stated exactly (and spec-pinned):
    *  - GUARANTEED: an occurrence within `horizonMs` of the previous
    *    occurrence of the same gram always connects. Proof: with delay =
    *    horizon the watermark is maxEventTime − horizon, and the state's
    *    timeout is lastOcc + horizon; eviction before a new occurrence at
    *    t₂ requires watermark > lastOcc + horizon ≥ t₂ — but a row below
    *    the watermark is late and filtered anyway, so a non-late within-
    *    horizon occurrence can never find its state missing. Every
    *    arrival refreshes the clock, so occurrence chains extend epochs
    *    indefinitely.
    *  - FORGOTTEN: once the watermark passes lastOcc + horizon the state
    *    (buffered first occurrence AND the proven-dup flag) is evicted; a
    *    later occurrence starts a fresh epoch whose first row emits only
    *    if a second arrives in time. In between — gap > horizon but the
    *    watermark not yet past — detection depends on batch cadence
    *    (micro-batch semantics: eviction is a state BOUND, not an exact
    *    gap predicate).
    * Within-horizon duplicates — the near-in-time template spam an online
    * scrubber exists for — are exact; duplicates of content last seen
    * beyond the horizon are the accepted recall loss (a deployment sizes
    * the horizon to the re-post half-life it cares about). State rows are
    * bounded by the distinct grams of a trailing O(2·horizon) event-time
    * window (watermark lag + timeout), independent of stream length.
    *
    * Input adds an event-time column `ts` (the doc's ingest time, carried
    * onto every gram row). The watermark is set here from the same
    * horizon: state for a gram is safe to drop exactly when no in-
    * watermark arrival can still connect to it.
    */
  def exactSubstrStartsEvicting(grams: DataFrame, id: String, ts: String,
                                horizonMs: Long): DataFrame = {
    import grams.sparkSession.implicits._
    grams.select(col("gram_key"), col(id), col("pos"),
        col(ts).cast("timestamp"))
      .withWatermark(ts, s"$horizonMs milliseconds")
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GramFirstTs, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, _, state: GroupState[GramFirstTs]) if state.hasTimedOut =>
          // horizon passed with no new arrival: forget the gram entirely
          // (buffered first occurrence AND the dup flag — the documented
          // fresh-epoch semantics)
          state.remove()
          Iterator.empty
        case (_, rows, state: GroupState[GramFirstTs]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var s = state.getOption.orNull
          rows.foreach { case (_, docId, pos, t) =>
            if (s == null) s = GramFirstTs(docId, pos, dup = false, t.getTime)
            else {
              // lastOccMs is the max over EVERY occurrence ever seen — an
              // out-of-order same-gram arrival in a later micro-batch
              // (below the stored clock, yet above the watermark) must not
              // regress it (ADVICE r11: the batch-max-only form let the
              // timeout move backwards, breaking the monotonicity the
              // GUARANTEED proof relies on)
              if (t.getTime > s.lastOccMs) s = s.copy(lastOccMs = t.getTime)
              if (!s.dup) {
                out += ((s.id, s.pos)); out += ((docId, pos))
                s = s.copy(dup = true)
              } else out += ((docId, pos))
            }
          }
          state.update(s)
          // timeout = lastOcc + horizon, monotone across batches; the
          // max() guards the API contract that a timeout must be set
          // beyond the current watermark (a late-but-admitted row could
          // otherwise compute a timestamp the watermark already passed)
          state.setTimeoutTimestamp(
            math.max(s.lastOccMs + horizonMs, state.getCurrentWatermarkMs + 1))
          out.iterator
      }
      .toDF(id, "pos")
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
