package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, IntervalJoin}
import graft.plans.Fnv1a64Expression.fnv1a64
import graft.sources.Tables

/** Round-5 operator catalog: the joins Spark has no built-in operator for
  * (as-of, range/interval) plus the deterministic corpus-split every
  * training-data pipeline needs. Each query is the oracle-checked twin of an
  * operator in `graft.operators` — the DuckDB SQL uses the engine's native
  * formulation (ASOF JOIN, theta-join) precisely so the check is independent
  * of the Spark-side algorithm (union-marker window, bin replication).
  */
object AdvancedOps extends Catalog {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- backward as-of join (union-marker window, ONE shuffle) ------------
    // "settings changes" = every 10th event (value at that ts); every other
    // event picks up the latest setting at-or-before its own timestamp.
    // 1482 of 9000 left rows at sf0.01 precede any setting — the left-outer
    // NULL path is exercised, not just the happy path. The matched right
    // TIMESTAMP rides along as a second payload so the oracle pins WHICH
    // right row won, not merely its value.
    "q53_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val settings = ev.filter(col("event_id") % 10 === 0)
        .groupBy("user_id", "ts") // unique per (key, ts): the as-of contract
        .agg(max("value").as("setting"))
        .withColumn("setting_ts_us", unix_micros(col("ts")))
      val reads = ev.filter(col("event_id") % 10 =!= 0)
        .select("user_id", "event_id", "ts")
      AsOfJoin.backward(reads, settings, Seq("user_id"), "ts", "ts",
          payload = Seq("setting", "setting_ts_us"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("asof_setting_ts_us").as("setting_ts_us"),
          (floor(col("asof_setting") * 1e6 + 0.5) / 1e6).as("setting"))
    }),

    // ---- forward as-of join (next-following, the backward twin) ------------
    // the same settings/reads split as q53, reversed: every read picks up
    // the EARLIEST setting at-or-after its own timestamp ("when does the
    // next change land"). Late-tail reads with no following setting
    // exercise the left-outer NULL path; the oracle is DuckDB's native
    // ASOF with the <= comparator — an independent algorithm.
    "q83_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val settings = ev.filter(col("event_id") % 10 === 0)
        .groupBy("user_id", "ts")
        .agg(max("value").as("setting"))
        .withColumn("setting_ts_us", unix_micros(col("ts")))
      val reads = ev.filter(col("event_id") % 10 =!= 0)
        .select("user_id", "event_id", "ts")
      AsOfJoin.forward(reads, settings, Seq("user_id"), "ts", "ts",
          payload = Seq("setting", "setting_ts_us"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("asof_setting_ts_us").as("setting_ts_us"),
          (floor(col("asof_setting") * 1e6 + 0.5) / 1e6).as("setting"))
    }),

    // ---- deterministic hash split (train/val/test) -------------------------
    // THE reproducibility primitive of a training pipeline: membership
    // depends only on the row's own key (FNV-1a 64 of doc_id, mod 100), so
    // the 80/10/10 split is stable under reruns, repartitioning, and
    // incremental ingestion — unlike sample()/rand(), which reshuffle
    // membership every run. Per-partition map-only until the tiny rollup.
    "q55_hash_split" -> ((s, d) => {
      val bucket = pmod(fnv1a64(col("doc_id")), lit(100L))
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          (floor(sum("n_chars").cast("double") / count(lit(1)) * 1e6 + 0.5)
            / 1e6).as("avg_chars"))
    }),

    // ---- point-in-interval range join via bin replication ------------------
    // 25 overlapping price bands (spans 5k-25k over a 500k domain) against
    // every order's total price. binWidth 20k ~ the max span: bands
    // replicate to <=3 bins each, orders land in exactly one bin, and the
    // equi-join on bin replaces the BroadcastNestedLoopJoin Spark would
    // plan for the raw lo<=x<=hi predicate (the oracle runs exactly that
    // theta-join — algorithm-independent check).
    "q56_interval_join" -> ((s, d) => {
      val nk = col("n_nationkey")
      val bands = Tables.nation(s, d).select(
        nk.as("band_id"),
        (nk * 18000).cast("double").as("lo"),
        (nk * 18000 + 5000 + (nk * 137 % 20000)).cast("double").as("hi"))
      val points = Tables.orders(s, d).select(col("o_totalprice"))
      IntervalJoin.pointInInterval(points, bands, "o_totalprice", "lo", "hi",
          binWidth = 20000.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_orders"),
          XDet.moneySum(col("o_totalprice"), 2).as("revenue"))
    }),

    // ---- interval-OVERLAP self-join per key (q56's interval×interval twin) -
    // per part, pairs of lineitem shipping windows that overlap — "which
    // shipments of this part were in flight together". The window is
    // [shipdate, shipdate + 1..30 days], span fabricated deterministically
    // from the keys (this fixture carries no receiptdate — the q56 band
    // device). Same bin-replication core as q56; dedup across bins is
    // positional (the bin containing max(lo_a, lo_b) owns the pair), never
    // a distinct(). The oracle runs the raw per-key theta-join — algorithm-
    // independent. binWidth 32 days ~ the max span: each interval touches
    // <= 2 bins.
    "q135_overlap_join" -> ((s, d) => {
      val epoch = lit("1970-01-01").cast("date")
      val lo = datediff(col("l_shipdate"), epoch).cast("long")
      // gated widen (round-16): the bin-replication explode and the
      // (key, bin) exchange write otherwise run inside the single-row-
      // group scan task (measured: the head stage was one ~1.1 s task
      // while 31 cores idled); one slim exchange of the 4-column
      // interval rows first spreads both. Plain below 1 MiB, pass-through
      // past 1 GiB where the scan splits naturally.
      val li = graft.sources.Tables.wide(Tables.lineitem(s, d).select(
        col("l_partkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("item_id"),
        lo.as("lo_day"),
        (lo + lit(1L) +
          (col("l_orderkey") * 7 + col("l_linenumber")) % 30).as("hi_day")),
        minBytes = 1L << 20, hashKey = "item_id")
      IntervalJoin.overlapPairs(li, "l_partkey", "item_id",
          "lo_day", "hi_day", binWidth = 32.0)
        .withColumn("overlap_days",
          least(col("hi_a"), col("hi_b")) -
            greatest(col("lo_a"), col("lo_b")) + 1)
    }),

    // ---- top-k per group via a native partial-mergeable aggregate ----------
    // graft.plans.TopKByAggregate: each map task ships <=k pairs per group
    // instead of the window idiom's shuffle-and-sort of EVERY row (the
    // oracle runs exactly that window form — independent formulation).
    // Ties on price break on lower orderkey in both engines: deterministic.
    "q57_topk_per_group" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(graft.plans.TopKByAggregate.topkBy(
          col("o_totalprice"), col("o_orderkey"), 5).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.id").as("o_orderkey"), col("col.score").as("price"))
    }),

    // ---- exact stratified sample (fixed fraction per stratum) --------------
    // deterministic 10%-per-language quota: rank within the stratum by the
    // FNV hash of the key (a stable pseudo-random order — reruns and
    // repartitions can't change membership, unlike sampleBy), keep the
    // first ceil(0.1·n). Exact quotas inherently rank the stratum; the
    // hash-threshold split (q55) is the sort-free approximate alternative.
    // ---- priority sampling: weighted k-sample + unbiased estimator ---------
    // Duffield–Lund–Thorup priority sampling, the WEIGHTED member of the
    // deterministic-sampling family (q55 hash split, q58 stratified, q82
    // rebalance): per language, the k = 20 docs with highest priority
    // w/u, where u ∈ (0,1] derives from fnv(doc_id) via the q97
    // signed-double + conditional-2⁶⁴ sequence — every arithmetic step is
    // IEEE +,−,×,÷ mirrored in the oracle, so the whole sample AND the
    // estimator are hash-exact, and membership is rerun/repartition/
    // ingestion-stable where a random weighted sampler is not. Heavy docs
    // are preferentially kept (P[keep] ∝ w roughly), and est_w =
    // max(w, τ) with τ = the (k+1)-th priority makes Σ est_w over the
    // sample an UNBIASED estimate of the stratum's total token mass —
    // the subset-sum contract that lets a pipeline audit its corpus from
    // k rows per stratum. Ranking runs through the bounded-state top-k
    // aggregate (k+1 rows per language cross the exchange, never a
    // corpus sort); the weight joins back over the k·|langs| sample only.
    "q106_priority_sample" -> ((s, d) => {
      import graft.ext.TextAnalysis
      val k = 20
      val two64 = math.pow(2, 64) // exact: a power of two
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("w"))
        .filter(col("w") > 0)
      val h = fnv1a64(col("doc_id"))
      val u1 = h.cast("double") +
        when(h < 0, lit(two64)).otherwise(lit(0.0)) + lit(1.0)
      val top = docs
        .withColumn("__p", col("w").cast("double") * lit(two64) / u1)
        .groupBy("lang")
        .agg(graft.plans.TopKByAggregate.topkBy(col("__p"), col("doc_id"),
          k + 1).as("tk"))
        .select(col("lang"), posexplode(col("tk")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.id").as("doc_id"), col("col.score").as("__p"))
      top
        .withColumn("__tau", max(when(col("rnk") === k + 1, col("__p")))
          .over(Window.partitionBy("lang")))
        .filter(col("rnk") <= k)
        .join(docs.select(col("doc_id"), col("w")), Seq("doc_id"))
        .select(col("lang"), col("rnk"), col("doc_id"), col("w"),
          (floor(greatest(col("w").cast("double"),
            coalesce(col("__tau"), lit(0.0))) * 1e6 + 0.5) / 1e6)
            .as("est_w"))
    }),

    "q58_stratified_sample" -> ((s, d) => {
      val byLang = Window.partitionBy("lang")
      val w = byLang.orderBy(fnv1a64(col("doc_id")), col("doc_id"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w))
        .withColumn("quota",
          ceil(count(lit(1)).over(byLang) * 0.1).cast("long"))
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rnk"))
    }),
    // ---- bloom-filter semi-join pruning ------------------------------------
    // graft.ext.BloomPrune: the build side's keys (132 selective customers
    // at sf0.01) become a broadcast bitmap; the probe side (15000 orders,
    // 1293 matching) drops
    // non-candidate rows map-side BEFORE its shuffle. The oracle is the
    // PLAIN join — that is the contract: a bloom may only pass extra rows
    // to the exact join (false positives cost bytes), never change the
    // result. Effectiveness (measured fp rate) is pinned in BloomPruneSpec.
    "q78_bloom_pruned_join" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_acctbal"))
      val bloom = graft.ext.BloomPrune.build(cust, "c_custkey")
      graft.ext.BloomPrune.prune(Tables.orders(s, d), "o_custkey", bloom)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_acctbal"),
          col("o_totalprice"))
    }),
    // ---- z-order clustered layout, box query through the round-trip --------
    // graft.ext.ZOrder: synth coords (events has no geo at this sf), write
    // range-partitioned + z-sorted parquet, re-read, box-filter on BOTH
    // dims, aggregate. The oracle computes the same box aggregate straight
    // off the raw table: the clustered layout must be semantically
    // invisible — its value (files skipped per dimension) is measured in
    // ZOrderSpec, the q75 sink-transparency pattern applied to layout.
    "q79_zorder_box" -> ((s, d) => {
      val base = s"/tmp/graft_zorder_${new java.io.File(d).getName}"
      val fs = org.apache.hadoop.fs.FileSystem
        .get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = Tables.events(s, d).select(col("event_id"), col("value"),
        ((col("event_id") % 1801) / 10.0 - 90.0).as("lat"),
        ((col("event_id") % 3601) / 10.0 - 180.0).as("lon"))
      graft.ext.ZOrder.writeClustered(ev,
        graft.ext.ZOrder.zValue(col("lat"), col("lon")), 16, base)
      s.read.parquet(base)
        .filter(col("lat").between(-20.0, 20.0)
          && col("lon").between(100.0, 140.0))
        .agg(count(lit(1)).as("n_events"),
          XDet.moneySum(col("value"), 2).as("total_value"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    // same FNV uniform, same priority arithmetic in the same IEEE op
    // order, same (priority DESC, doc_id) ranking and (k+1)-th-priority
    // threshold — the whole sketch re-derives bit-for-bit
    "q106_priority_sample" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
      val hs = toSignedSqlText(
        longSqlText("14695981039346656037::HUGEINT", "doc_id::HUGEINT"))
      val two64 = "18446744073709551616.0"
      s"""WITH base AS (SELECT doc_id, lang, len(ws) AS w FROM (
         |    SELECT doc_id, lang, ${TextSql.words} AS ws FROM documents
         |    WHERE text IS NOT NULL) WHERE len(ws) > 0),
         |p AS (SELECT doc_id, lang, w,
         |    CAST(w AS DOUBLE) * $two64
         |      / ((CAST(hs AS DOUBLE) + (CASE WHEN hs < 0 THEN $two64
         |          ELSE 0.0 END)) + 1.0) AS pr
         |  FROM (SELECT doc_id, lang, w, $hs AS hs FROM base)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang
         |        ORDER BY pr DESC, doc_id) AS rnk FROM p),
         |tau AS (SELECT lang, max(CASE WHEN rnk = 21 THEN pr END) AS tau
         |        FROM r GROUP BY 1)
         |SELECT r.lang, CAST(rnk AS BIGINT) AS rnk, doc_id,
         |  CAST(w AS BIGINT) AS w,
         |  floor(greatest(CAST(w AS DOUBLE), coalesce(tau.tau, 0.0))
         |    * 1000000.0 + 0.5)/1000000.0 AS est_w
         |FROM r JOIN tau USING (lang) WHERE rnk <= 20""".stripMargin
    },

    // the same box aggregate straight off the raw table — the clustered
    // write + re-read must not change a single row
    "q79_zorder_box" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_events,
         |  ${XDet.moneySumSql("value", 2)} AS total_value,
         |  min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events
         |WHERE (event_id % 1801)/10.0 - 90.0 BETWEEN -20 AND 20
         |  AND (event_id % 3601)/10.0 - 180.0 BETWEEN 100 AND 140""".stripMargin,

    // the plain equi-join: bloom pruning must be invisible in the result
    "q78_bloom_pruned_join" ->
      """SELECT o_orderkey, o_custkey, c_acctbal, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000""".stripMargin,

    // DuckDB's NATIVE ASOF JOIN — a different algorithm than the Spark
    // side's union-marker window, which is the point of the check
    "q53_asof_join" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS rts, max(value) AS setting
        |  FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS lts
        |  FROM events WHERE event_id % 10 <> 0)
        |SELECT l.user_id, l.event_id, epoch_us(l.lts) AS ts_us,
        |  epoch_us(r.rts) AS setting_ts_us,
        |  floor(r.setting*1e6 + 0.5)/1e6 AS setting
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.lts >= r.rts""".stripMargin,

    // DuckDB's native forward ASOF (<= comparator) — independent algorithm
    "q83_asof_forward" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS rts, max(value) AS setting
        |  FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS lts
        |  FROM events WHERE event_id % 10 <> 0)
        |SELECT l.user_id, l.event_id, epoch_us(l.lts) AS ts_us,
        |  epoch_us(r.rts) AS setting_ts_us,
        |  floor(r.setting*1e6 + 0.5)/1e6 AS setting
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.lts <= r.rts""".stripMargin,

    "q55_hash_split" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
      val fnv = toSignedSqlText(
        longSqlText("14695981039346656037::HUGEINT", "doc_id::HUGEINT"))
      s"""WITH b AS (SELECT lang, n_chars,
         |  ((($fnv) % 100) + 100) % 100 AS bucket FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  floor(CAST(sum(n_chars) AS DOUBLE)/count(*)*1e6 + 0.5)/1e6 AS avg_chars
         |FROM b GROUP BY 1, 2""".stripMargin
    },

    // the window idiom the native aggregate replaces
    "q57_topk_per_group" ->
      """SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
        |  o_totalprice AS price
        |FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 5""".stripMargin,

    "q58_stratified_sample" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
      val fnv = toSignedSqlText(
        longSqlText("14695981039346656037::HUGEINT", "doc_id::HUGEINT"))
      s"""WITH ranked AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY $fnv, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM documents)
         |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rnk
         |FROM ranked WHERE rn <= CAST(ceil(n * 0.1) AS BIGINT)""".stripMargin
    },

    // the raw theta-join the binned operator replaces
    "q56_interval_join" ->
      s"""WITH bands AS (
         |  SELECT n_nationkey AS band_id,
         |    CAST(n_nationkey * 18000 AS DOUBLE) AS lo,
         |    CAST(n_nationkey * 18000 + 5000 + (n_nationkey*137 % 20000)
         |      AS DOUBLE) AS hi
         |  FROM nation)
         |SELECT band_id, CAST(count(*) AS BIGINT) AS n_orders,
         |  ${XDet.moneySumSql("o_totalprice", 2)} AS revenue
         |FROM bands JOIN orders ON o_totalprice >= lo AND o_totalprice <= hi
         |GROUP BY 1""".stripMargin,

    // the raw per-key overlap theta-join the binned operator replaces
    "q135_overlap_join" ->
      s"""WITH li AS (SELECT l_partkey,
         |    l_orderkey * 10 + l_linenumber AS item_id,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
         |      AS lo_day,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) + 1
         |      + (l_orderkey * 7 + l_linenumber) % 30 AS hi_day
         |  FROM lineitem)
         |SELECT a.l_partkey, a.item_id AS id_a, b.item_id AS id_b,
         |  a.lo_day AS lo_a, a.hi_day AS hi_a,
         |  b.lo_day AS lo_b, b.hi_day AS hi_b,
         |  least(a.hi_day, b.hi_day) - greatest(a.lo_day, b.lo_day) + 1
         |    AS overlap_days
         |FROM li a JOIN li b ON a.l_partkey = b.l_partkey
         |  AND a.item_id < b.item_id
         |  AND a.lo_day <= b.hi_day AND b.lo_day <= a.hi_day""".stripMargin,
  )
}
