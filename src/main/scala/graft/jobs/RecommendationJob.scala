package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Caches
import graft.functions.Geo
import graft.operators.NearestNeighborJoin

/** Step 3 — friend-recommendation mart (reference
  * `/root/reference/src/scripts/project_step_3.py`).
  *
  * Pairs of users who share a subscription channel, have never messaged each other,
  * and whose last known positions on `date` are within `maxDistanceKm`.
  *
  * Reference quirks preserved (SURVEY.md §7): both `user_left` and `user_right`
  * carry the *left* user's id (project_step_3.py:134-135); pair canonicalization is
  * `user_id > message_to` (:80,:127); `local_time` is Sydney of current_timestamp
  * (:161).
  *
  * Scale notes: the per-channel self-join (J6) is the blow-up risk — quadratic in
  * channel membership, and AQE is structurally blind to it (skew detection sizes
  * partitions by shuffle INPUT bytes; a viral channel is a few MB in, (m/2)² pair
  * rows out through ONE join key). The fix is not salting (a salted self-join
  * misses cross-salt pairs) but the balanced chunk-cell device
  * ([[possibleSubscribersToCommunicate]]'s "chunk" tier), auto-engaged from a
  * measured hottest-channel statistic ([[chooseChunkedPairs]]).
  */
object RecommendationJob {

  /** Distinct (user, channel) subscriptions (project_step_3.py:23-34). */
  def subscribers(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === lit("subscription") &&
        col("event.subscription_channel").isNotNull)
      .select(col("event.user").as("user_id"), col("event.subscription_channel"))
      .distinct()

  /** Canonicalized pairs of subscribers who already messaged each other within a
    * shared channel (project_step_3.py:36-96).
    */
  def communicatingSubscribers(events: DataFrame, subs: DataFrame): DataFrame = {
    val subscriberIds = subs.select(col("user_id")).distinct()
    val messagePairs = events
      .filter(col("event_type") === lit("message"))
      .select(col("event.message_from"), col("event.message_to"))
      .join(subscriberIds.select(col("user_id").as("message_from")),
        Seq("message_from"), "inner")
      .join(subscriberIds.select(col("user_id").as("message_to")),
        Seq("message_to"), "inner")
      .distinct()
    val senderSide = subs.join(
      messagePairs.select(col("message_from").as("user_id"), col("message_to")),
      Seq("user_id"), "left")
    val receiverSide = subs.join(
      messagePairs.select(col("message_to").as("user_id"), col("message_from")),
      Seq("user_id"), "left")
    val communicate = senderSide
      .join(receiverSide.select(col("subscription_channel"),
          col("user_id").as("message_to"), col("message_from").as("user_id")),
        Seq("subscription_channel", "user_id", "message_to"), "inner")
      .drop("subscription_channel")
      .distinct()
    communicate
      .unionByName(communicate.select(
        col("user_id").as("message_to"), col("message_to").as("user_id")))
      .filter(col("user_id") > col("message_to"))
  }

  /** Membership chunk for the balanced per-channel pair self-join tier:
    * a channel with m members splits into ⌈m/B⌉ chunks and its m² pair
    * work spreads over the chunk-pair cells, each ≤ B² pairs — the
    * [[graft.ext.Dedup.SelfJoinChunk]] device applied to the one
    * remaining unsplittable-key shape in the engine (J6,
    * project_step_3.py:121-126). 2048² ≈ 4M pairs per cell keeps a cell
    * well under a task's memory while dozens of cells fill a wave.
    */
  val PairChunk: Long = 2048L

  /** Measured hottest-channel membership above which the pair self-join
    * takes the balanced-chunk tier (auto mode). The estimate is ONE tiny
    * aggregate over the already-cached distinct (user, channel) frame —
    * the q134/chooseGridZone posture: a real engine decides the tier from
    * a measured statistic, because AQE cannot (its skew detection sizes
    * partitions by shuffle INPUT bytes and a hot channel is a few MB in,
    * (m/2)² pair rows out — structurally invisible). 2·chunk means the
    * tier only engages when at least one channel actually multi-chunks.
    */
  def chooseChunkedPairs(subs: DataFrame,
                         pairChunk: Long = PairChunk): Boolean = {
    // Memoized per (analyzed plan, chunk): with pairTier="auto" the probe
    // is an EAGER Spark job at DataFrame-CONSTRUCTION time — callers that
    // build several plans over the same subscriber frame (transform caches
    // `subs`; direct callers may not) should pay the scan once, not per
    // construction. WeakHashMap keyed by the analyzed plan object so
    // retired frames stay collectable. ASSUMES the files behind a
    // structurally-equal plan are immutable for the session (the fixture
    // contract everywhere in this repo) — a source rewritten in place
    // mid-session would return the stale tier, like any plan-statistics
    // cache would.
    val plan = subs.queryExecution.analyzed
    Option(chunkDecisionCache.get(plan)).flatMap(_.get(pairChunk))
      .getOrElse {
        // the probe job runs OUTSIDE the map's lock (two threads racing
        // the same cold plan duplicate a tiny deterministic aggregate —
        // benign); `merge` then folds the entry in atomically, so neither
        // thread's (pairChunk -> decided) can be lost to the other's put
        val decided = subs.groupBy("subscription_channel").count()
          .agg(max("count")).first() match {
            case r if r.isNullAt(0) => false
            case r => r.getLong(0) > 2 * pairChunk
          }
        chunkDecisionCache.merge(plan, Map(pairChunk -> decided),
          (a, b) => a ++ b)
        decided
      }
  }

  // weak KEY = the frame's analyzed plan (strongly held by its
  // QueryExecution, so the entry lives exactly as long as some DataFrame
  // over that plan does)
  private val chunkDecisionCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        Map[Long, Boolean]]())

  /** Candidate pairs for `date`: share a channel, never messaged, within
    * `maxDistanceKm` of each other's last position (project_step_3.py:98-141).
    */
  /** `emitPeerId = false` reproduces the reference quirk exactly (both
    * output columns carry the left user, project_step_3.py:134-135); with
    * `emitPeerId = true`, `user_right` carries the actual peer.
    *
    * `pairTier` selects the channel self-join shape: "ref" = the
    * reference's single-key join (pair fan-out lands on whichever task
    * owns the channel once the frame outgrows broadcast — at 100 TB one
    * viral channel = (m/2)² pair rows through one sort-merge key), "chunk"
    * = the balanced chunk-cell join (identical pair set, work bounded per
    * cell), "auto" = measure the hottest channel ([[chooseChunkedPairs]])
    * and pick. NOTE: "auto" runs that probe as an EAGER Spark job at
    * DataFrame-construction time (memoized per analyzed plan of `subs`,
    * so repeated constructions over one frame pay once; `transform`
    * caches `subs`, direct callers building plans lazily should cache
    * theirs or pass an explicit tier). The two tiers are
    * row-identical by construction: chunks
    * are numbered by `user_id` DESC, so a cross-chunk cell meets each
    * unordered pair exactly once already in the reference's
    * `user_id > message_to` orientation, and diagonal cells carry both
    * orientations for the filter to halve — spec-pinned equivalence.
    */
  def possibleSubscribersToCommunicate(subs: DataFrame,
                                       communicating: DataFrame,
                                       eventsAtDate: DataFrame,
                                       date: String,
                                       maxDistanceKm: Double,
                                       emitPeerId: Boolean = false,
                                       pairTier: String = "auto",
                                       pairChunk: Long = PairChunk): DataFrame = {
    val wUser = Window.partitionBy("user_id")
    val lastPosition = eventsAtDate
      .filter(col("lat").isNotNull && col("lon").isNotNull)
      .select(
        coalesce(col("event.message_from"), col("event.reaction_from"),
          col("event.user")).as("user_id"),
        coalesce(col("event.datetime"), col("event.message_ts")).as("datetime"),
        col("lat"), col("lon"))
      .withColumn("dt_max", max(col("datetime")).over(wUser))
      .filter(col("datetime") === col("dt_max"))
      .drop("dt_max", "datetime")
      .groupBy("user_id")
      .agg(first("lat").as("last_lat"), first("lon").as("last_lon"))
    val positionedBase = lastPosition.join(subs, Seq("user_id"), "inner")
    val chunked = pairTier match {
      case "chunk" => true
      case "ref"   => false
      case "auto"  => chooseChunkedPairs(subs, pairChunk)
      case other   => throw new IllegalArgumentException(
        s"pairTier must be ref|chunk|auto, got $other")
    }
    val rawPairs = if (!chunked) {
      // REFERENCE TIER. The channel self-join below is a broadcast hash
      // join whose PAIR fan-out runs inside the stream side's existing
      // tasks — and that stream arrives from a date-pruned scan, often ONE
      // partition, so the whole per-channel pair expansion serialized on
      // one core (measured at sf10 inside q75: a 125k→80M-row stage as a
      // single 169 s task; AQE never re-splits because it sizes partitions
      // by INPUT bytes, blind to join fan-out). One explicit user-keyed
      // exchange of the slim positioned-subscriber rows buys full-width
      // fan-out; the pinned partition count keeps AQE from re-coalescing
      // it. This spreads fine while the build side fits a broadcast; past
      // that the join degrades to one sort-merge key per channel — the
      // regime the chunk tier exists for.
      val positionedSubs = positionedBase
        .repartition(subs.sparkSession.sparkContext.defaultParallelism,
          col("user_id"))
      positionedSubs
        .join(positionedSubs.select(
            col("subscription_channel"),
            col("user_id").as("message_to"),
            col("last_lat").as("last_lat_to"),
            col("last_lon").as("last_lon_to")),
          Seq("subscription_channel"), "left")
    } else {
      // BALANCED-CHUNK TIER (the Dedup.cosinePairs device on the channel
      // key): number each channel's members (one linear channel-keyed
      // window, user_id DESC), chunk by `pairChunk`, and join on the CHUNK
      // CELL (channel, __ca, __cb) — the left member replicates to cells
      // (c, c..nc−1), the right to (0..c, c), so every unordered member
      // pair meets in EXACTLY the cell (min chunk, max chunk) with the
      // LARGER user on the left (DESC numbering), i.e. already in the
      // reference's user_id > message_to orientation; diagonal cells carry
      // both orientations and the filter halves them. A viral channel's m²
      // pairs spread over (m/B)² independent cell keys, each ≤ B² pairs;
      // single-chunk channels collapse to one (ch, 0, 0) cell with zero
      // replication. The shuffle_hash hint forbids the broadcast plan —
      // under a broadcast the pair fan-out would run inside the window's
      // channel-partitioned tasks and re-serialize the hot channel; the
      // hint exchanges both sides by the CELL key instead, which is the
      // entire point of the device.
      val byCh = Window.partitionBy("subscription_channel")
      val numbered = positionedBase
        .withColumn("__pos",
          row_number().over(byCh.orderBy(col("user_id").desc))
            .cast("long") - 1)
        .withColumn("__nc", expr("(count(1) over (partition by " +
          s"subscription_channel) + ${pairChunk - 1}) div $pairChunk"))
        .withColumn("__c", expr(s"__pos div $pairChunk"))
      val left = numbered
        .withColumn("__cb", explode(sequence(col("__c"), col("__nc") - 1)))
        .select(col("subscription_channel"), col("__c").as("__ca"),
          col("__cb"), col("user_id"), col("last_lat"), col("last_lon"))
      val right = numbered
        .withColumn("__ca", explode(sequence(lit(0L), col("__c"))))
        .select(col("subscription_channel"), col("__ca"),
          col("__c").as("__cb"), col("user_id").as("message_to"),
          col("last_lat").as("last_lat_to"),
          col("last_lon").as("last_lon_to"))
      left.join(right.hint("shuffle_hash"),
          Seq("subscription_channel", "__ca", "__cb"))
        .drop("__ca", "__cb")
    }
    rawPairs
      .filter(col("user_id") > col("message_to"))
      .drop("subscription_channel")
      .distinct()
      .join(communicating, Seq("user_id", "message_to"), "left_anti")
      .withColumn("distance",
        Geo.haversineKm("last_lat", "last_lat_to", "last_lon", "last_lon_to"))
      .filter(col("distance") < maxDistanceKm)
      .select(
        col("user_id").as("user_left"),
        (if (emitPeerId) col("message_to") else col("user_id")).as("user_right"),
        ((col("last_lat") + col("last_lat_to")) / lit(2)).as("lat_avg"),
        ((col("last_lon") + col("last_lon_to")) / lit(2)).as("lon_avg"),
        lit(date).as("processed_dttm"))
  }

  /** Attach the zone (nearest city to the pair midpoint) (project_step_3.py:143-164).
    *
    * `processedAt` defaults to the reference's `current_timestamp()` (F5,
    * project_step_3.py:161) but is injectable so the otherwise-untestable
    * wall-clock column can be pinned in tests and replayed pipelines.
    */
  def withZone(geo: DataFrame, candidates: DataFrame,
               processedAt: Column = current_timestamp()): DataFrame = {
    val cities = geo.select(col("id").as("city_id"),
      col("lat").as("lat_city"), col("lon").as("lon_city"))
    NearestNeighborJoin
      .nearestAllTies(candidates, cities, "lat_avg", "lat_city", "lon_avg", "lon_city")
      .select(col("user_left"), col("user_right"),
        col("city_id").as("zone_id"), col("processed_dttm"),
        from_utc_timestamp(processedAt, "Australia/Sydney").as("local_time"))
  }

  /** Scale-tier zone attach — same output as [[withZone]] on tie-free
    * data, different plan. Two structural changes, both 100 TB-motivated:
    *
    *  1. The argmin input is the DISTINCT midpoint set, not the pair
    *     stream: every pair sharing a midpoint gets the same city, so the
    *     nearest join sees |distinct midpoints| rows (map-side-combined
    *     distinct over two doubles) instead of crossing each of the ~2B
    *     pair rows with every city; one hash join attaches the zone back.
    *  2. The nearest-city argmin itself is [[graft.ext.GridNearestJoin
    *     .nearest]] — cell equi-join + ring-certified exactness — so the
    *     city dimension is hash-partitioned, never broadcast, and the
    *     operator survives a dimension beyond the broadcast threshold.
    *
    * Tie semantics diverge deliberately: [[withZone]] keeps ALL cities
    * tied at the minimum distance (reference shape, common_func.py:22-24);
    * this variant emits exactly one deterministic winner per midpoint
    * (quantized distance, then city id). On data without exact ties —
    * any real coordinate corpus — the two are row-identical.
    *
    * The longitude certification band needs cos(φmax) over BOTH sides'
    * latitudes, so φmax is measured from the data (one tiny agg over the
    * midpoint + city latitudes), not assumed.
    */
  def withZoneGrid(geo: DataFrame, candidates: DataFrame,
                   processedAt: Column = current_timestamp(),
                   cellDeg: Double = 0.0): DataFrame = {
    val cities = geo.select(col("id").as("city_id"),
      col("lat").as("lat_city"), col("lon").as("lon_city"))
    // PINNED: the distinct midpoints are read by the φmax agg AND the grid
    // join — unpinned, each action re-evaluates the whole upstream pair
    // pipeline (measured: 3 evaluations → 2; the frame itself is tiny, the
    // fixture's positions live on a 25-point lattice and real corpora
    // dedupe to |users| points at most). The candidate pipeline still
    // evaluates once more for the final attach join — the same recompute-
    // don't-cache trade the reference shape makes with its own pair frame.
    val mids = Caches.pin(
      candidates.select("lat_avg", "lon_avg").distinct())
    val maxAbsLat = mids.select(abs(col("lat_avg")).as("__l"))
      .unionByName(cities.select(abs(col("lat_city")).as("__l")))
      .agg(max(col("__l"))).first() match {
        case r if r.isNullAt(0) => 90.0
        case r => math.min(r.getDouble(0) + 1e-9, 90.0)
      }
    val zoneOf = graft.ext.GridNearestJoin.nearest(mids, cities,
        srcLat = "lat_avg", dimLat = "lat_city",
        srcLon = "lon_avg", dimLon = "lon_city",
        srcKey = Seq("lat_avg", "lon_avg"), tieBreak = Seq(col("city_id")),
        cellDeg = cellDeg, maxAbsLatDeg = maxAbsLat)
      .select(col("lat_avg"), col("lon_avg"), col("city_id"))
    candidates.join(zoneOf, Seq("lat_avg", "lon_avg"))
      .select(col("user_left"), col("user_right"),
        col("city_id").as("zone_id"), col("processed_dttm"),
        from_utc_timestamp(processedAt, "Australia/Sydney").as("local_time"))
  }

  /** Plan-stat bound above which the GEO DIM must take the grid tier
    * regardless of fact volume: past broadcast size the reference shape's
    * `broadcast(cities)` cross join is not plannable at all, so the
    * equi-join grid is the only correct tier. 8 MiB sits under Spark's
    * 10 MB default autoBroadcastJoinThreshold with margin.
    */
  val DimGridBoundBytes: Long = 8L << 20

  /** Plan-stat bound on the FACT side above which the grid tier wins.
    * The reference shape pays |pairs| × |cities| haversines + a 25-row
    * window per pair; the grid tier reduces to the distinct-midpoint set
    * first and equi-joins cells, paying a fixed ladder overhead instead
    * (φmax agg + cell build + ring certification). Measured flip (r13,
    * local[32]): at sf0.1 (events scan estimate ~2 MiB) the ladder is
    * pure loss — q160 grid 114 CPU-s vs q75 ref 80 — while at sf10
    * (~214 MiB) the grid pipeline runs 186.3 s vs 565.5 s reference
    * shape, a 3.0× win. 32 MiB splits the measured regimes with ≥6×
    * margin to each side.
    */
  val FactGridBoundBytes: Long = 32L << 20

  /** Statistics-driven zone-tier choice (round-12 verdict item 3): the
    * reference DAG hard-codes its operator choice per run
    * (`project_dag.py:55,61` fixed args); a real engine decides from
    * input statistics. Both stats are Catalyst plan estimates
    * (`optimizedPlan.stats.sizeInBytes`) — zero jobs, read at plan time,
    * exactly the signal Spark's own broadcast planning trusts. Grid iff
    * the dim exceeds broadcast bounds (correctness at 100 TB: the
    * reference tier cannot broadcast it) or the fact side exceeds the
    * measured crossover (efficiency: the per-pair ×|cities| work
    * dominates the grid ladder).
    */
  def chooseGridZone(events: DataFrame, geo: DataFrame): Boolean = {
    val dimBytes = geo.queryExecution.optimizedPlan.stats.sizeInBytes
    val factBytes = events.queryExecution.optimizedPlan.stats.sizeInBytes
    dimBytes > DimGridBoundBytes || factBytes > FactGridBoundBytes
  }

  /** `zoneTier`: "ref" = the reference broadcast shape ([[withZone]]),
    * "grid" = the scale tier ([[withZoneGrid]]), "auto" = decide from
    * input plan stats ([[chooseGridZone]]). On tie-free data the tiers
    * are row-identical (see [[withZoneGrid]]); "auto" is what the
    * catalog's grid faces run, so small inputs stop paying the ladder.
    *
    * `pairTier` (ref|chunk|auto, default auto) independently selects the
    * channel self-join shape — see [[possibleSubscribersToCommunicate]];
    * the tiers are row-identical on any input, so "auto" is the default
    * everywhere including the parity faces.
    */
  def transform(events: DataFrame, eventsAtDate: DataFrame, geo: DataFrame,
                date: String, maxDistanceKm: Double,
                processedAt: Column = current_timestamp(),
                zoneTier: String = "ref",
                pairTier: String = "auto"): DataFrame = {
    val grid = zoneTier match {
      case "grid" => true
      case "ref"  => false
      case "auto" => chooseGridZone(events, geo)
      case other  => throw new IllegalArgumentException(
        s"zoneTier must be ref|grid|auto, got $other")
    }
    val subs = subscribers(events).cache() // reused 2x (ref :32)
    val communicating = communicatingSubscribers(events, subs)
    val candidates = possibleSubscribersToCommunicate(
      subs, communicating, eventsAtDate, date, maxDistanceKm,
      pairTier = pairTier)
    if (grid) withZoneGrid(geo, candidates, processedAt)
    else withZone(geo, candidates, processedAt)
  }

  /** CLI parity with project_step_3.py:167-195: date maxDistance events geo out.
    * The date slice is read by partition path, as the reference does (:13-16).
    */
  def main(args: Array[String]): Unit = {
    val Array(date, maxDistance, eventsPath, geoPath, outPath) = args.take(5)
    val spark = JobSession.create("graft step_3 recommendations")
    val events = spark.read.parquet(eventsPath)
    val eventsAtDate = spark.read.parquet(s"$eventsPath/date=$date")
    transform(events, eventsAtDate, spark.read.parquet(geoPath),
      date, maxDistance.toDouble)
      .write.mode("overwrite").parquet(outPath)
    spark.stop()
  }
}
