package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

class EventStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed type counts aggregate by event-time window under a watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val events = in.toDF().toDF("ts", "event_type", "user_id")
    val q = EventStream.startToMemory(
      EventStream.windowedTypeCounts(events, watermark = "10 minutes",
        windowLen = "1 hour"),
      "win_counts", OutputMode.Update())
    try {
      in.addData(
        (ts("2022-06-15 10:05:00"), "click", 1L),
        (ts("2022-06-15 10:20:00"), "click", 2L),
        (ts("2022-06-15 10:40:00"), "view", 1L),
        (ts("2022-06-15 11:10:00"), "click", 3L))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "event_type", "events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts("2022-06-15 10:00:00"), "click", 2L)))
      assert(rows.contains((ts("2022-06-15 10:00:00"), "view", 1L)))
      assert(rows.contains((ts("2022-06-15 11:00:00"), "click", 1L)))
    } finally q.stop()
  }

  test("sliding windows land each event in len/slide overlapping windows") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val events = in.toDF().toDF("ts", "event_type", "user_id")
    val q = EventStream.startToMemory(
      EventStream.slidingTypeCounts(events, watermark = "10 minutes",
        windowLen = "1 hour", slide = "15 minutes"),
      "slide_counts", OutputMode.Update())
    try {
      in.addData((ts("2022-06-15 10:35:00"), "click", 1L))
      q.processAllAvailable()
      val rows = spark.table("slide_counts")
        .select("window_start", "events")
        .as[(Timestamp, Long)].collect().toSet
      // 10:35 is inside exactly the 4 slide-aligned hour windows starting
      // 09:45, 10:00, 10:15, 10:30
      assert(rows === Set(
        (ts("2022-06-15 09:45:00"), 1L), (ts("2022-06-15 10:00:00"), 1L),
        (ts("2022-06-15 10:15:00"), 1L), (ts("2022-06-15 10:30:00"), 1L)))
      // a second event 20 min later shares 3 of those 4 windows
      in.addData((ts("2022-06-15 10:55:00"), "click", 2L))
      q.processAllAvailable()
      val upd = spark.table("slide_counts")
        .groupBy("window_start").agg(max("events").as("events"))
        .as[(Timestamp, Long)].collect().toMap
      assert(upd(ts("2022-06-15 10:00:00")) === 2L)
      assert(upd(ts("2022-06-15 10:15:00")) === 2L)
      assert(upd(ts("2022-06-15 10:30:00")) === 2L)
      assert(upd(ts("2022-06-15 09:45:00")) === 1L)
      assert(upd(ts("2022-06-15 10:45:00")) === 1L)
    } finally q.stop()
  }

  test("session windows merge events gapped under 30 minutes") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val events = in.toDF().toDF("ts", "event_type", "user_id")
    // session merging cannot update rows in place -> Append/Complete only
    val q = EventStream.startToMemory(
      EventStream.sessionWindowCounts(events, gap = "30 minutes"),
      "sessions_win", OutputMode.Complete())
    try {
      in.addData(
        (ts("2022-06-15 10:00:00"), "click", 1L),
        (ts("2022-06-15 10:20:00"), "view", 1L),  // merges (20 min gap)
        (ts("2022-06-15 12:00:00"), "click", 1L)) // new session
      q.processAllAvailable()
      val rows = spark.table("sessions_win")
        .select("session_start", "session_end", "user_id", "events")
        .as[(Timestamp, Timestamp, Long, Long)].collect().toSet
      assert(rows.contains(
        (ts("2022-06-15 10:00:00"), ts("2022-06-15 10:50:00"), 1L, 2L)))
      assert(rows.contains(
        (ts("2022-06-15 12:00:00"), ts("2022-06-15 12:30:00"), 1L, 1L)))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-user running counts across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = EventStream.startToMemory(
      EventStream.sessionize(in.toDS()).toDF(), "sessions_state",
      OutputMode.Update())
    try {
      in.addData((1L, 100L), (1L, 200L), (2L, 150L))
      q.processAllAvailable()
      in.addData((1L, 300L))
      q.processAllAvailable()
      val last = spark.table("sessions_state")
        .groupBy("user_id")
        .agg(max("events").as("events"), max("last_ts_micros").as("last"))
        .as[(Long, Long, Long)].collect().toSet
      assert(last.contains((1L, 3L, 300L))) // 2 events batch 1 + 1 in batch 2
      assert(last.contains((2L, 1L, 150L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits sessions once, on gap or watermark") {
    implicit val ctx = spark.sqlContext
    val t0 = 1640995200000L // 2022-01-01 00:00:00 UTC, millis
    def at(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = EventStream.closedSessions(
      in.toDF().toDF("user_id", "ts").withWatermark("ts", "10 minutes"),
      gapMicros = 30L * 60 * 1000 * 1000) // 30-minute gap
    val q = EventStream.startToMemory(sessions.toDF(), "closed_sessions",
      OutputMode.Append())
    try {
      // batch 1: u1 has an IN-BATCH gap (10min → 120min closes the first
      // run immediately); u2 parks one open session; u4 opens at 120min
      in.addData((1L, at(0)), (1L, at(10)), (1L, at(120)), (2L, at(0)),
        (4L, at(120)))
      q.processAllAvailable()
      // watermark is now 120-10=110min: u2's timeout (0+30) has passed —
      // it fires while processing batch 2; u1's (120+30) has not. u4 gets
      // an out-of-order event at 115min (after the watermark, so not
      // dropped; BEFORE its open session's start) — the session window
      // must extend backward
      in.addData((3L, at(240)), (4L, at(115)))
      q.processAllAvailable()
      // watermark 230min: u1's tail (timeout 150min) and u4's merged
      // session (timeout 150min) fire in batch 3
      in.addData((3L, at(300)))
      q.processAllAvailable()
      val got = spark.table("closed_sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      def us(min: Long) = (t0 + min * 60000L) * 1000L
      assert(got === Set(
        (1L, 2L, us(0), us(10)),    // in-batch gap closure, batch 1
        (2L, 1L, us(0), us(0)),     // watermark timeout, batch 2
        (1L, 1L, us(120), us(120)), // watermark timeout, batch 3
        (4L, 2L, us(115), us(120)), // backward-extended start, batch 3
        (3L, 1L, us(240), us(240))  // cross-batch gap closure, batch 3
      ))
      // u3's tail session (at 300min) is still open — not emitted
      assert(!got.contains((3L, 1L, us(300), us(300))))
    } finally q.stop()
  }

  test("batch twin: boundary rule and agreement with streaming emission") {
    // (a) boundary: a gap of exactly gapMicros merges; gapMicros + 1µs
    // closes — the same strictly-greater rule the stateful path applies
    val gap = 30L * 60 * 1000 * 1000
    def t(us: Long) = new java.sql.Timestamp(us / 1000L) // whole-ms inputs
    val df = Seq(
      (1L, 0L), (1L, gap), (1L, 2 * gap + 1000L),      // merge, then split
      (2L, 0L), (2L, gap + 1000L), (2L, 3 * gap)       // split, then tail
    ).map { case (u, us) => (u, t(us)) }
      .toDF("user_id", "ts")
    val got = EventStream.closedSessionsBatchTwin(df, gap)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 0L, gap),          // [0, gap] merged, closed by the 3rd event
      (2L, 1L, 0L, 0L),           // gap+1µs split it off
      (2L, 1L, gap + 1000L, gap + 1000L)
    )) // each user's last island (the open tail) is absent
    // (b) the twin emits exactly the gap-closed subset of the streaming
    // fixture ("flatMapGroupsWithState emits sessions once..." above):
    // streaming adds only timeout-fired tails on top of these rows
    val t0 = 1640995200000L
    def at(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    def us(min: Long) = (t0 + min * 60000L) * 1000L
    val fixture = Seq((1L, at(0)), (1L, at(10)), (1L, at(120)), (2L, at(0)),
      (4L, at(120)), (4L, at(115)), (3L, at(240)), (3L, at(300)))
      .toDF("user_id", "ts")
    val twin = EventStream.closedSessionsBatchTwin(fixture, gap)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(twin === Set(
      (1L, 2L, us(0), us(10)),
      (3L, 1L, us(240), us(240))))
  }

  test("straggler older than gap closes as its own session, never a backward merge") {
    // Only reachable when the watermark DELAY exceeds the GAP: an accepted
    // event can then predate the open session's start by more than the gap.
    // Single-batch processing would put it in its own island; the stateful
    // path must agree, or output depends on micro-batch boundaries.
    implicit val ctx = spark.sqlContext
    val t0 = 1640995200000L
    def at(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = EventStream.closedSessions(
      in.toDF().toDF("user_id", "ts").withWatermark("ts", "2 hours"),
      gapMicros = 30L * 60 * 1000 * 1000) // 30-minute gap, 120-minute delay
    val q = EventStream.startToMemory(sessions.toDF(), "straggler_sessions",
      OutputMode.Append())
    try {
      in.addData((7L, at(200)))         // open session [200, 200]
      q.processAllAvailable()           // watermark = 200 - 120 = 80
      // 100 >= watermark (accepted) but 100 < 200 - gap: a straggler.
      // It must close as its own island, not stretch [200,200] back to 100.
      in.addData((7L, at(100)))
      q.processAllAvailable()
      in.addData((8L, at(400)))         // watermark 280 > 230: u7 tail fires
      q.processAllAvailable()
      val got = spark.table("straggler_sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      def us(min: Long) = (t0 + min * 60000L) * 1000L
      assert(got === Set(
        (7L, 1L, us(100), us(100)), // straggler island, emitted in batch 2
        (7L, 1L, us(200), us(200))  // untouched tail, closed by timeout
      ))
    } finally q.stop()
  }

  test("micro-batched LSH incremental dedup equals the one-shot batch twin") {
    // the streaming shape of X48: corpus shingles/buckets are STATIC
    // (computed once, reusable across micro-batches); each arriving
    // micro-batch of documents pays only its own banding inside
    // foreachBatch. The union of per-batch verdicts must equal running the
    // cross-frame dedup over all incoming docs at once — micro-batching is
    // an execution detail, not a semantics change, because candidates only
    // ever meet batch x corpus (never batch x batch).
    implicit val ctx = spark.sqlContext
    import graft.ext.Dedup
    val docsAll = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val shCorpus = Dedup.wordShingles(
      docsAll.filter($"doc_id" % 10 =!= 7), "doc_id", "text", 3)
    val incoming = docsAll.filter($"doc_id" % 10 === 7)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val out = Dedup.crossMinHashNearDups(
            Dedup.wordShingles(batch, "doc_id", "text", 3), shCorpus,
            "doc_id", numHashes = 64, bands = 16, minJaccard = 0.5)
          .select("id_a", "id_b").as[(Long, Long)].collect()
        acc.synchronized { acc ++= out }
        ()
      }.start()
    try {
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = Dedup.crossMinHashNearDups(
        Dedup.wordShingles(docsAll.filter($"doc_id" % 10 === 7),
          "doc_id", "text", 3), shCorpus,
        "doc_id", numHashes = 64, bands = 16, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(oneShot.nonEmpty) // sf0.01 has cross-frame near-dups to find
    assert(acc.size === acc.toSet.size) // no pair straddles batches twice
    assert(acc.toSet === oneShot)
  }

  test("streaming ExactSubstr gram state: emitted starts after every " +
      "batch prefix equal the union corpus's duplicated-gram starts; the " +
      "batch face equals the semi-join spans") {
    implicit val ctx = spark.sqlContext
    import graft.ext.Dedup
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val q9 = (1 to 9).map(i => s"q$i").mkString(" ")
    val b1 = Seq((1L, s"a1 a2 a3 $p b1 b2"), (3L, s"$q9 x $q9"))
    val b2 = Seq((2L, s"c1 c2 $p d1"))      // cross-batch dup of b1's run
    val b3 = Seq((4L, p),                   // third copy: emits immediately
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))   // unique: never emits
    // independent expected-set derivation in plain Scala (occurrence-count
    // semantics: a gram repeated twice inside ONE doc duplicates)
    def dupStarts(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
      val occ = for {
        (id, t) <- docs
        ws = t.split(" ").filter(_.nonEmpty).toSeq
        i <- 0 to ws.length - 8
      } yield (ws.slice(i, i + 8).mkString(" "), id, i.toLong)
      val dup = occ.groupBy(_._1).filter(_._2.size >= 2).keySet
      occ.filter(o => dup(o._1)).map(o => (o._2, o._3)).toSet
    }
    val in = MemoryStream[(Long, String)]
    val starts = EventStream.exactSubstrStarts(
      Dedup.gramKeyStarts(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", minTokens = 8), "doc_id")
    val q = EventStream.startToMemory(starts, "xsubstr_starts",
      OutputMode.Append())
    try {
      var seen = Seq.empty[(Long, String)]
      for (b <- Seq(b1, b2, b3)) {
        seen ++= b
        in.addData(b)
        q.processAllAvailable()
        val got = spark.table("xsubstr_starts")
          .as[(Long, Long)].collect().toSet
        assert(got === dupStarts(seen),
          s"after docs ${seen.map(_._1).mkString(",")}")
      }
    } finally q.stop()
    val union = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val face = Dedup.mergeSpanStarts(
      EventStream.exactSubstrStarts(
        Dedup.gramKeyStarts(union, "doc_id", "text", 8), "doc_id"),
      "doc_id", 8).as[(Long, Long, Long, Long)].collect().toSet
    val batch = Dedup.exactSubstrSpans(union, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(face === batch)
    assert(face.nonEmpty)
  }

  test("evicting ExactSubstr: within-horizon duplicates exact, state " +
      "evicted past the horizon so a re-post starts a fresh epoch, state " +
      "rows bounded") {
    implicit val ctx = spark.sqlContext
    import graft.ext.Dedup
    val p = (1 to 12).map(i => s"p$i").mkString(" ") // shared 12-token run
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    // gramKeyStarts drops ts; re-attach it map-only from the doc id the
    // gram rows carry (each doc has ONE ingest time in this fixture)
    val docTs: Map[Long, Timestamp] = Map(
      1L -> ts("2022-06-15 10:00:00"),
      2L -> ts("2022-06-15 10:05:00"),  // within 10 min of doc 1
      3L -> ts("2022-06-15 12:00:00"),  // far past the horizon
      4L -> ts("2022-06-15 15:00:00"),  // fresh epoch for the same gram
      5L -> ts("2022-06-15 15:04:00"))  // within horizon of doc 4
    val tsExpr = docTs.foldLeft(lit(null).cast("timestamp")) {
      case (acc, (id, t)) =>
        when(col("doc_id") === id, lit(t)).otherwise(acc)
    }
    val grams = Dedup.gramKeyStarts(docs, "doc_id", "text", minTokens = 8)
      .withColumn("ts", tsExpr)
    val starts = EventStream.exactSubstrStartsEvicting(
      grams, "doc_id", "ts", horizonMs = 10L * 60 * 1000)
    val q = EventStream.startToMemory(starts, "xsubstr_evict",
      OutputMode.Append())
    def got(): Set[(Long, Long)] =
      spark.table("xsubstr_evict").as[(Long, Long)].collect().toSet
    def stateRows(): Long = {
      val ops = q.lastProgress.stateOperators
      if (ops.isEmpty) -1L else ops.map(_.numRowsTotal).sum
    }
    try {
      // batch 1: doc 1 alone — nothing duplicated yet
      in.addData(Seq((1L, docTs(1L), s"a1 a2 $p")))
      q.processAllAvailable()
      assert(got().isEmpty)
      val state1 = stateRows()
      assert(state1 > 0) // doc 1's grams buffered
      // batch 2: doc 2 re-posts the run within the horizon — exact
      in.addData(Seq((2L, docTs(2L), s"$p b1")))
      q.processAllAvailable()
      val afterB2 = got()
      assert(afterB2.nonEmpty)
      assert(afterB2.exists(_._1 == 1L) && afterB2.exists(_._1 == 2L))
      // batch 3: unrelated far-future doc advances the watermark past
      // every buffered gram's (lastOcc + horizon) — evicts docs 1-2 state
      in.addData(Seq((3L, docTs(3L), "u1 u2 u3 u4 u5 u6 u7 u8 u9")))
      q.processAllAvailable()
      // one more watermark advance so batch 3's own grams are the only
      // live state (timeouts fire against the PREVIOUS batch's watermark)
      in.addData(Seq((6L, ts("2022-06-15 13:00:00"), "v1 v2")))
      q.processAllAvailable()
      val state3 = stateRows()
      assert(state3 >= 0 && state3 <= 2,
        s"docs 1-2 gram state must be evicted, saw $state3 rows")
      // batch 4: the SAME run re-posted beyond the horizon — fresh epoch:
      // doc 4's first occurrence must NOT pair with the evicted history
      in.addData(Seq((4L, docTs(4L), s"$p c1")))
      q.processAllAvailable()
      assert(got() === afterB2, "beyond-horizon re-post must not emit")
      // batch 5: doc 5 within the horizon of doc 4 — the fresh epoch's
      // duplicate detects exactly (docs 4+5 emit; evicted docs 1-2 don't
      // re-emit)
      in.addData(Seq((5L, docTs(5L), s"$p d1")))
      q.processAllAvailable()
      val afterB5 = got()
      assert(afterB5.exists(_._1 == 4L) && afterB5.exists(_._1 == 5L))
      assert(!afterB5.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("evicting ExactSubstr: an out-of-order same-gram arrival cannot " +
      "regress the timeout below lastOcc + horizon (ADVICE r11)") {
    // the batch-max-only timeout bug: state's last occurrence is 10:08,
    // then a later micro-batch delivers the same gram at 09:59 (out of
    // order but above the watermark, so admitted). Setting the timeout
    // from THAT batch's max (09:59 + 10 min = 10:09) regresses it below
    // lastOcc + horizon (10:18); a watermark at 10:12 then evicts, and a
    // 10:15 occurrence — 7 min after the true last occurrence, squarely
    // inside the GUARANTEED clause — finds its state missing. With
    // lastOccMs carried in the state the timeout is monotone and the
    // 10:15 arrival must emit immediately (dup flag already proven).
    implicit val ctx = spark.sqlContext
    import graft.ext.Dedup
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val docTs: Map[Long, Timestamp] = Map(
      1L -> ts("2022-06-15 10:00:00"),
      2L -> ts("2022-06-15 10:08:00"),  // true last occurrence
      7L -> ts("2022-06-15 09:59:00"),  // out-of-order, non-late
      8L -> ts("2022-06-15 10:15:00"),  // within horizon of doc 2
      21L -> ts("2022-06-15 10:22:00"), // watermark pushers (unique grams,
      22L -> ts("2022-06-15 10:23:00")) //   >= 8 tokens so rows exist)
    val tsExpr = docTs.foldLeft(lit(null).cast("timestamp")) {
      case (acc, (id, t)) =>
        when(col("doc_id") === id, lit(t)).otherwise(acc)
    }
    val grams = Dedup.gramKeyStarts(docs, "doc_id", "text", minTokens = 8)
      .withColumn("ts", tsExpr)
    val starts = EventStream.exactSubstrStartsEvicting(
      grams, "doc_id", "ts", horizonMs = 10L * 60 * 1000)
    val q = EventStream.startToMemory(starts, "xsubstr_ooo",
      OutputMode.Append())
    def got(): Set[(Long, Long)] =
      spark.table("xsubstr_ooo").as[(Long, Long)].collect().toSet
    try {
      in.addData(Seq((1L, docTs(1L), s"a1 a2 $p")))
      q.processAllAvailable()                       // wm -> 09:50
      in.addData(Seq((2L, docTs(2L), s"$p b1")))
      q.processAllAvailable()                       // dup proven; wm -> 09:58
      assert(got().exists(_._1 == 2L))
      // out-of-order arrival BELOW the stored clock, above the watermark
      in.addData(Seq((7L, docTs(7L), s"$p c1")))
      q.processAllAvailable()                       // wm stays 09:58
      assert(got().exists(_._1 == 7L), "admitted dup occurrence must emit")
      // two unrelated far-future docs: first advances the watermark to
      // 10:12 (past the REGRESSED 10:09 timeout, short of the true
      // 10:18), second gives the timeout a batch to fire against it
      in.addData(Seq((21L, docTs(21L), "u1 u2 u3 u4 u5 u6 u7 u8 u9")))
      q.processAllAvailable()
      in.addData(Seq((22L, docTs(22L), "v1 v2 v3 v4 v5 v6 v7 v8 v9")))
      q.processAllAvailable()
      // within-horizon follow-up: 10:15 − 10:08 = 7 min < 10 min horizon
      in.addData(Seq((8L, docTs(8L), s"$p d1")))
      q.processAllAvailable()
      assert(got().exists(_._1 == 8L),
        "within-horizon occurrence lost — timeout regressed and state " +
          "was evicted early")
    } finally q.stop()
  }

  test("micro-batched k-means assignment equals the one-shot batch assign") {
    // the streaming shape of X58: centroids are FITTED once (offline) and
    // each arriving micro-batch assigns with the literal-projection pass —
    // stateless per row, so micro-batching cannot change the result. This
    // is the ingestion story the kmeansFit scaladoc claims (new rows cost
    // one projection, no refit, no shuffle) — pinned here end-to-end.
    implicit val ctx = spark.sqlContext
    import graft.ext.Similarity
    val vecs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cent = Similarity.kmeansFit(vecs, "vec_id", "embedding",
      k = 4, iters = 1).localCheckpoint(true) // stands in for persisted fit
    val rows = vecs.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Float])]
    val acc = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    val q = in.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val out = Similarity.kmeansAssign(batch, "vec_id", "embedding", cent)
          .select($"vec_id", $"cell").as[(Long, Int)].collect()
        acc.synchronized { acc ++= out }
        ()
      }.start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = Similarity.kmeansAssign(vecs, "vec_id", "embedding", cent)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(acc.size === oneShot.size)
    assert(acc.toSet === oneShot)
  }

  test("stream-static enrichment join is stateless, keeps dim-gap events, " +
      "and equals the batch twin") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val dim = Seq((7L, "AUTO"), (9L, "HOME"))
      .toDF("c_custkey", "segment")
    val enriched = EventStream.enrichEvents(
      in.toDF().toDF(cols: _*), dim, dimKey = "c_custkey")
    val q = EventStream.startToMemory(enriched, "enrich",
      OutputMode.Append())
    val b1 = Seq[(Long, Timestamp, Long, String, Double)](
      (1L, ts("2022-06-15 10:00:00"), 7L, "click", 1.0),
      // user 8 is MISSING from the dim: the event must survive with NULL
      (2L, ts("2022-06-15 10:01:00"), 8L, "click", 2.0))
    val b2 = Seq[(Long, Timestamp, Long, String, Double)](
      (3L, ts("2022-06-15 10:02:00"), 9L, "purchase", 3.0))
    try {
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
      // the join is STATELESS: no state-store operator anywhere in the
      // query — the property that separates stream-static from
      // stream-stream
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
    val got = spark.table("enrich")
      .select("event_id", "segment").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "AUTO"), (2L, null), (3L, "HOME")))
    // identical code path on a batch frame equals the streaming output
    val twin = EventStream.enrichEvents((b1 ++ b2).toDF(cols: _*), dim,
        dimKey = "c_custkey")
      .select("event_id", "segment").as[(Long, String)].collect().toSet
    assert(twin === got)
  }

  test("enrichEvents: a dim keyed user_id joins cleanly; a colliding dim " +
      "attribute is rejected up front") {
    val events = Seq((1L, 7L, 1.0), (2L, 8L, 2.0))
      .toDF("event_id", "user_id", "value")
    // dim key NAMED user_id: the old rename-based join produced duplicate
    // columns here — the explicit condition + drop keeps exactly one
    val dimSameName = Seq((7L, "AUTO")).toDF("user_id", "segment")
    val out = EventStream.enrichEvents(events, dimSameName, "user_id")
    assert(out.columns.count(_ == "user_id") === 1)
    assert(out.select("event_id", "segment").as[(Long, String)]
      .collect().toSet === Set((1L, "AUTO"), (2L, null)))
    // a dim ATTRIBUTE that collides with an event column would be
    // ambiguous downstream — rejected with a named-column error
    val dimClash = Seq((7L, 9.9)).toDF("c_custkey", "value")
    val e = intercept[IllegalArgumentException] {
      EventStream.enrichEvents(events, dimClash, "c_custkey")
    }
    assert(e.getMessage.contains("value"))
  }

  test("per-batch dim refresh: a mid-query IN-PLACE dim rewrite lands at " +
      "the next batch; the frozen static join never sees appended files") {
    implicit val ctx = spark.sqlContext
    val dimPath = java.nio.file.Files.createTempDirectory("dimref")
      .toString + "/dim"
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    Seq((7L, "AUTO")).toDF("c_custkey", "segment")
      .repartition(1).write.mode("overwrite").parquet(dimPath)

    // refreshed route: readDim runs per trigger, so batch 2 sees the
    // IN-PLACE OVERWRITE (changed segment AND new user) that would fail
    // the frozen static join with FILE_NOT_EXIST
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val acc = scala.collection.mutable.Buffer[(Long, Long, String)]()
    val q = EventStream.enrichEventsPerBatch(in.toDF().toDF(cols: _*),
        () => spark.read.parquet(dimPath), dimKey = "c_custkey") {
      (df, batchId) =>
        val out = df.select("event_id", "segment").as[(Long, String)]
          .collect().map { case (e, s) => (batchId, e, s) }
        acc.synchronized { acc ++= out }
        ()
    }.start()
    try {
      in.addData(
        (1L, ts("2022-06-15 10:00:00"), 7L, "click", 1.0),
        (2L, ts("2022-06-15 10:01:00"), 8L, "click", 2.0))
      q.processAllAvailable()
      Seq((7L, "AUTO2"), (8L, "HOME")).toDF("c_custkey", "segment")
        .repartition(1).write.mode("overwrite").parquet(dimPath)
      in.addData(
        (3L, ts("2022-06-15 10:02:00"), 7L, "click", 3.0),
        (4L, ts("2022-06-15 10:03:00"), 8L, "click", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(acc.toSet === Set(
      (0L, 1L, "AUTO"), (0L, 2L, null), // batch 0: v1 dim, user 8 a gap
      (1L, 3L, "AUTO2"), (1L, 4L, "HOME"))) // batch 1: the rewritten dim

    // frozen route, pinned as the hazard it is: the plain static join's
    // file listing is captured at query start — a file APPENDED to the
    // dim path mid-query is silently invisible to later batches
    val in2 = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val frozen = EventStream.enrichEvents(in2.toDF().toDF(cols: _*),
      spark.read.parquet(dimPath), dimKey = "c_custkey")
    val q2 = EventStream.startToMemory(frozen, "enrich_frozen",
      OutputMode.Append())
    try {
      in2.addData((5L, ts("2022-06-15 10:04:00"), 8L, "click", 5.0))
      q2.processAllAvailable()
      Seq((9L, "PLUS")).toDF("c_custkey", "segment")
        .repartition(1).write.mode("append").parquet(dimPath)
      in2.addData((6L, ts("2022-06-15 10:05:00"), 9L, "click", 6.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val got2 = spark.table("enrich_frozen")
      .select("event_id", "segment").as[(Long, String)].collect().toSet
    assert(got2 === Set((5L, "HOME"), (6L, null)))
  }

  test("stream-stream attribution join buffers across batches and equals " +
      "the batch twin") {
    implicit val ctx = spark.sqlContext
    val cIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val pIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val joined = EventStream.attributionJoin(
      cIn.toDF().toDF(cols: _*), pIn.toDF().toDF(cols: _*),
      horizonMinutes = 30, watermark = "10 minutes")
    val q = EventStream.startToMemory(joined, "attr", OutputMode.Append())
    val clicks = Seq[(Long, Timestamp, Long, String, Double)](
      (1L, ts("2022-06-15 10:00:00"), 7L, "click", 0.0),
      (2L, ts("2022-06-15 10:10:00"), 7L, "click", 0.0),
      (3L, ts("2022-06-15 10:00:00"), 9L, "click", 0.0))
    val purchases = Seq[(Long, Timestamp, Long, String, Double)](
      // batch 2: matches clicks 1 AND 2 (both within 30 min, same user)
      (10L, ts("2022-06-15 10:25:00"), 7L, "purchase", 9.5),
      // exactly on the horizon bound of click 1 — inclusive, must match
      (11L, ts("2022-06-15 10:30:00"), 7L, "purchase", 1.5),
      // same user, outside the horizon of every click — no match
      (12L, ts("2022-06-15 11:30:00"), 7L, "purchase", 2.0),
      // other user: purchase BEFORE its user's click — no match
      (13L, ts("2022-06-15 09:50:00"), 9L, "purchase", 3.0))
    try {
      // clicks arrive first, purchases in a LATER micro-batch: the join
      // must buffer click state across the batch boundary
      cIn.addData(clicks)
      q.processAllAvailable()
      pIn.addData(purchases)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L)))
    // identical code path on batch frames equals the streaming output
    val all = (clicks ++ purchases).toDF(cols: _*)
    val twin = EventStream.attributionJoin(
        all.filter($"event_type" === "click"),
        all.filter($"event_type" === "purchase"))
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(twin === got)
  }

  test("foldPerBatch: streaming micro-batch folds equal the chained batch " +
      "folds in arrival order (the q182 twin)") {
    import graft.ext.Similarity
    def vecs(ids: Range, axis: Long => Int) = ids.map { i =>
      (i.toLong, Array.tabulate(4)(d =>
        (if (d == axis(i.toLong)) 1f else 0f) + (i % 3) * 0.01f))
    }
    val base = vecs(0 until 30, i => (i % 2).toInt * 2).toDF(
      "vec_id", "embedding")
    val b1 = vecs(100 until 110, i => (i % 2).toInt * 2)
    val b2 = vecs(200 until 212, i => (i % 2).toInt * 2)
    val state0 = Similarity.kmeansState(base, "vec_id", "embedding",
      k = 2, iters = 1)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    val (writer, current) = EventStream.foldPerBatch(
      in.toDF().toDF("vec_id", "embedding"), state0,
      (st, batch) => Similarity.kmeansFold(st, batch, "vec_id", "embedding"))()
    val q = writer.start()
    try {
      // one addData + processAllAvailable per model batch: foldPerBatch's
      // contract is fold-per-TRIGGER in arrival order
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"cell", $"centroid", $"sums", $"n")
        .as[(Int, Seq[Long], Seq[Long], Long)].collect().sortBy(_._1).toSeq
    val streamed = rows(current())
    val chained = rows(Similarity.kmeansFold(
      Similarity.kmeansFold(state0, b1.toDF("vec_id", "embedding"),
        "vec_id", "embedding"),
      b2.toDF("vec_id", "embedding"), "vec_id", "embedding"))
    assert(streamed === chained)
  }

  test("foldPerBatchResumable: kill the stream, resume a FRESH session " +
      "from the stored state, final state == the uninterrupted chain") {
    import graft.ext.Similarity
    def vecs(ids: Range, axis: Long => Int) = ids.map { i =>
      (i.toLong, Array.tabulate(4)(d =>
        (if (d == axis(i.toLong)) 1f else 0f) + (i % 3) * 0.01f))
    }
    val base = vecs(0 until 30, i => (i % 2).toInt * 2).toDF(
      "vec_id", "embedding")
    val b1 = vecs(100 until 110, i => (i % 2).toInt * 2)
    val b2 = vecs(200 until 212, i => (i % 2).toInt * 2)
    val state0 = Similarity.kmeansState(base, "vec_id", "embedding",
      k = 2, iters = 1)
    // unique store identity per spec run — a rerun must never resume the
    // previous run's publications
    val runKey = java.util.UUID.randomUUID.toString.take(8)
    val fold = (st: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame) =>
      Similarity.kmeansFold(st, b, "vec_id", "embedding")

    // leg 1: fold b1 (batch 0), publish, then KILL the stream
    {
      implicit val ctx = spark.sqlContext
      val in1 = MemoryStream[(Long, Array[Float])]
      val (w1, _) = EventStream.foldPerBatchResumable(
        in1.toDF().toDF("vec_id", "embedding"), state0, fold,
        "restart_sink", runKey)
      val q1 = w1.start()
      try { in1.addData(b1); q1.processAllAvailable() } finally q1.stop()
    }
    assert(EventStream.resumeFoldState(spark, "restart_sink", runKey)
      .map(_._2) === Some(0L))

    // leg 2: a FRESH session resumes from the STORE — state0 here is
    // deliberately WRONG (fitted on different rows), so the assert below
    // proves the stored state, not the argument, feeds the chain. The
    // restarted source re-delivers the in-flight batch under its original
    // id (batch 0 = b1, the crash-replay contract) — already folded into
    // the resumed state, it must be SKIPPED, then b2 arrives as batch 1.
    val s2 = spark.newSession()
    val streamed = {
      implicit val ctx2 = s2.sqlContext
      val in2 = MemoryStream[(Long, Array[Float])]
      val wrongState0 = Similarity.kmeansState(
        vecs(500 until 520, i => ((i + 1) % 2).toInt * 2)
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, iters = 1)
      val (w2, cur2) = EventStream.foldPerBatchResumable(
        in2.toDF().toDF("vec_id", "embedding"), wrongState0, fold,
        "restart_sink", runKey)
      val q2 = w2.start()
      try {
        in2.addData(b1) // replayed batch 0: id ≤ stored hwm → skipped
        q2.processAllAvailable()
        in2.addData(b2) // batch 1: folds on top of the resumed state
        q2.processAllAvailable()
      } finally q2.stop()
      cur2()
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"cell", $"centroid", $"sums", $"n")
        .as[(Int, Seq[Long], Seq[Long], Long)].collect().sortBy(_._1).toSeq
    val chained = rows(Similarity.kmeansFold(
      Similarity.kmeansFold(state0, b1.toDF("vec_id", "embedding"),
        "vec_id", "embedding"),
      b2.toDF("vec_id", "embedding"), "vec_id", "embedding"))
    assert(rows(streamed) === chained)
    // the resumed leg published batch 1 — the store's high-water mark
    // advanced, so a THIRD restart would continue from after b2
    assert(EventStream.resumeFoldState(spark, "restart_sink", runKey)
      .map(_._2) === Some(1L))
  }

  test("resumeFoldState: a cold or wiped store resumes nothing") {
    // never-published identity → None (the /tmp-wipe cold start: the
    // chain restarts from state0 and the source replays from retention)
    assert(EventStream.resumeFoldState(spark, "restart_sink",
      "never-published-key").isEmpty)
  }
}
