package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics operators: windowed funnels, cohort retention,
  * market-basket lift. All three compute in exact integer arithmetic
  * (epoch-µs longs, counts, one truncating division at the end) so their
  * results hash-check cell-exact cross-engine — see the q107–q110 oracles
  * in [[graft.queries.AnalyticsOps]].
  */
object Behavioral {

  /** Windowed funnel with first-touch semantics (the ClickHouse-
    * windowFunnel-style greedy matcher): anchor at the user's FIRST
    * `steps.head` event, then per subsequent step take the first matching
    * event within `horizonUs` of the previous step's matched time
    * (inclusive bound). Greedy-from-first-anchor is deterministic and
    * one-pass; it is NOT the maximal matcher (a later anchor could open a
    * window the first one misses) — that variant is a per-user sequence
    * fold, deliberately out of scope.
    *
    * `ev` columns: `user_id`, `t` (epoch µs long), `event_type`.
    * Returns one row per user who reached step 1: `user_id`,
    * `t_<step>` epoch-µs per step (null once the chain breaks), and
    * `stage` = number of steps reached. By construction `t_<step i>`
    * is non-null only when `t_<step i-1>` is.
    *
    * Scale shape: every stage aggregation and every stage join is keyed
    * by `user_id` — one hash partitioning serves the whole chain with no
    * repartitioning between stages, and each stage's events are filtered
    * by type at the scan.
    */
  def funnelSteps(ev: DataFrame, steps: Seq[String],
                  horizonUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val frames = steps.foldLeft(List.empty[(DataFrame, String)]) {
      case (acc, step) =>
        val tc = s"t_$step"
        val f = acc match {
          case Nil =>
            ev.filter(col("event_type") === step)
              .groupBy("user_id").agg(min("t").as(tc))
          case (prev, prevCol) :: _ =>
            ev.filter(col("event_type") === step)
              .join(prev, Seq("user_id"))
              .filter(col("t") >= col(prevCol) &&
                col("t") <= col(prevCol) + horizonUs)
              .groupBy("user_id").agg(min("t").as(tc))
        }
        (f, tc) :: acc
    }.reverse
    val joined = frames.tail.foldLeft(frames.head._1) {
      case (acc, (f, _)) => acc.join(f, Seq("user_id"), "left")
    }
    joined.withColumn("stage",
      frames.map { case (_, tc) =>
        when(col(tc).isNotNull, 1L).otherwise(0L)
      }.reduce(_ + _))
  }

  /** Cohort retention matrix: cohort = the user's first-event bucket,
    * `k` = activity bucket − cohort bucket, cell = distinct users from
    * that cohort active `k` buckets later. Buckets are FIXED spans of
    * `bucketUs` µs from the pinned `originUs` (`(t − origin) div span`),
    * not calendar weeks: week-start conventions (ISO vs US) differ across
    * engines and locales, integer division does not.
    *
    * `ev` columns: `user_id`, `t` (epoch µs long). Returns
    * (cohort_w, k, users). Scale shape: one user-keyed aggregation + a
    * co-partitioned join back, then a (cohort, k)-keyed count-distinct
    * whose output cardinality is |buckets|² — tiny at any corpus size.
    */
  def cohortRetention(ev: DataFrame, originUs: Long,
                      bucketUs: Long): DataFrame = {
    val first = ev.groupBy("user_id").agg(min("t").as("t0"))
    ev.join(first, Seq("user_id"))
      .select(col("user_id"),
        expr(s"(t0 - ${originUs}L) div ${bucketUs}L").as("cohort_w"),
        expr(s"(t - ${originUs}L) div ${bucketUs}L" +
          s" - (t0 - ${originUs}L) div ${bucketUs}L").as("k"))
      .groupBy("cohort_w", "k")
      .agg(countDistinct("user_id").as("users"))
  }

  /** First-order Markov transition matrix over a per-user event stream:
    * for each ordered pair of consecutive events (by `(t, tieCol)` within
    * a user — the explicit tie column makes the order total and the
    * matrix deterministic), count transitions and estimate
    * P(next = b | cur = a) in integer micros (`n_ab·10⁶ div n_a`). The
    * resulting directed weighted graph is exactly the input shape
    * [[PageRank.pagerankInt]] ranks — transition extraction and walk
    * scoring compose into behavioral flow analysis.
    *
    * `ev` columns: `user_id`, `t` (epoch-µs long), `event_type`, plus
    * `tieCol`. Returns (from_type, to_type, n, p_micro). Scale shape: one
    * user-keyed window (the only data-sized exchange), then an
    * aggregation whose output is |types|² rows.
    */
  def markovTransitions(ev: DataFrame, tieCol: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("t"), col(tieCol))
    val pairs = ev
      .withColumn("__next", lead(col("event_type"), 1).over(byUser))
      .filter(col("__next").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = org.apache.spark.sql.expressions.Window
      .partitionBy("from_type")
    pairs
      .withColumn("__tot", sum("n").over(outTotals))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000L) div __tot").as("p_micro"))
  }

  /** Dyadic EWMA baseline of the `k` STRICTLY PRIOR values per key
    * (current row excluded — a baseline that contains the tested value
    * can never flag it): weighted sum Σ_{j=1..k} lag_j(v) div 2ʲ⁻¹
    * (nearest past value weight 1, then halving), using only truncating
    * integer division — so unlike a float EWMA (whose recurrence
    * accumulates rounding differently per evaluation order) it
    * hash-checks cell-exact cross-engine. Missing history (a key's first
    * rows) contributes 0 and `n_hist` reports how many real values
    * entered.
    *
    * `ev` columns: `key`, `t` (epoch-µs long), `v` (long, pre-quantized
    * by the caller), plus `tieCol` for total order. Returns
    * (key, t, v, ewma_num, n_hist) where `ewma_num` is the un-normalized
    * dyadic sum — the normalizer Σ_{j=1..k} 2¹⁻ʲ = (2ᵏ−1)/2ᵏ⁻¹ is a
    * constant, so callers test deviation by cross-multiplying into pure
    * integers (e.g. "v > 2× baseline" at k = 4 is 15·v > 16·ewma_num).
    * Scale shape: one key-partitioned window; the k lags share one
    * window spec and collapse into a single physical Window operator —
    * bounded per-key state, no global sort.
    */
  def dyadicEwma(ev: DataFrame, k: Int, tieCol: String): DataFrame = {
    require(k >= 1 && k <= 62, s"k must be in [1, 62], got $k")
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("t"), col(tieCol))
    val withLags = (1 to k).foldLeft(ev) { (df, j) =>
      df.withColumn(s"__l$j", lag(col("v"), j).over(byKey))
    }
    val num = (1 to k).map(j =>
      expr(s"coalesce(__l$j, 0L) div ${1L << (j - 1)}L")).reduce(_ + _)
    val hist = (1 to k).map(j =>
      when(col(s"__l$j").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    withLags.select(col("key"), col("t"), col("v"),
      num.as("ewma_num"), hist.as("n_hist"))
  }

  /** Daily gap-fill + forward-fill (time-series densification): expand
    * each key's observed span to EVERY day, then carry the last
    * observation forward into the gaps — the densification step that
    * turns an irregular event series into the regular grid dashboards
    * and models consume ([[graft.operators.AsOfJoin]] answers the same
    * question for a single point lookup; this materializes the whole
    * grid).
    *
    * `daily` columns: `key`, `day` (DateType, unique per key), `v`
    * (long). Returns (key, day, v_filled, filled) — `filled` = 1 on
    * fabricated rows. `last(v, ignoreNulls)` over the per-key day order
    * is deterministic because the grid makes `day` unique within a key.
    *
    * Scale shape: the grid explode is bounded by each key's span in
    * days; the span aggregate, the grid join, and the fill window all
    * key on `key` (the join adds `day`, a co-partitioned refinement) —
    * no global sort, bounded per-key window state.
    */
  def gapFillDaily(daily: DataFrame): DataFrame = {
    val spans = daily.groupBy("key")
      .agg(min("day").as("__d0"), max("day").as("__d1"))
    val grid = spans.select(col("key"),
      explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.join(daily, Seq("key", "day"), "left")
      .withColumn("filled", when(col("v").isNull, 1L).otherwise(0L))
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("key"), col("day"), col("v_filled"), col("filled"))
  }

  /** Market-basket lift (association mining): for part pairs co-occurring
    * in at least `minsup` baskets, lift = co·N/(s1·s2) in integer micros —
    * how much more often the pair appears together than independence
    * predicts (1e6 = independent). `bk` columns: `o` (basket id), `p`
    * (item id, long); rows must be distinct (o, p).
    *
    * Scale shape: candidate pairs come from a per-basket self-join on
    * `p1 < p2` — Σ|basket|² work per basket, never |items|² (the bounded-
    * explosion contract every dedup candidate generator here keeps);
    * supports and the basket count join/broadcast back per-part. Overflow
    * bound: co·N·10⁶ < 2⁶³ holds through ~9·10¹² basket-pair mass; past
    * that drop the scale a decade (the q105 Gram-matrix rule).
    */
  def basketLift(bk: DataFrame, minsup: Long): DataFrame = {
    val n = bk.select("o").distinct().agg(count(lit(1)).as("__n"))
    val supp = bk.groupBy("p").agg(count(lit(1)).as("s"))
    bk.as("a").join(bk.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("p1"), col("b.p").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minsup)
      .join(supp.select(col("p").as("p1"), col("s").as("s1")), Seq("p1"))
      .join(supp.select(col("p").as("p2"), col("s").as("s2")), Seq("p2"))
      .crossJoin(broadcast(n))
      .select(col("p1"), col("p2"), col("co"),
        expr("(co * __n * 1000000L) div (s1 * s2)").as("lift_micro"))
  }

  /** Linear (equal-split) multi-touch attribution over an attributed
    * click↔purchase pair stream — the CREDIT layer above the pairing
    * itself ([[graft.streaming.EventStream.attributionJoin]] produces the
    * pairs; this decides who gets how much): each purchase's value splits
    * equally across its touching clicks.
    *
    * Exact-integer conservation: the purchase value quantizes to micros
    * once (`floor(v·10⁶ + 0.5)` — the XDet device), each touch gets the
    * FLOOR quotient `(vm − pmod(vm, n)) div n`, and the remainder
    * `pmod(vm, n) ∈ [0, n)` lands one micro each on the FIRST `pmod`
    * touches in (click_us, click_id) order — so Σ credit_micro over a
    * purchase's touches equals the quantized value EXACTLY, on any
    * engine, under any partitioning, for ANY value sign (the property the
    * oracle pins; a float v/n split conserves only approximately, and a
    * truncating `div` with a signed `%` loses the remainder on negative
    * values — both Spark's `div` and DuckDB's `//` truncate toward zero,
    * so the floor/pmod pair is spelled out explicitly on both engines).
    *
    * One purchase-keyed window exchange serves both the touch count and
    * the remainder ranking. Input: the [[graft.streaming.EventStream
    * .attributionJoin]] output columns (user_id, click_id, purchase_id,
    * click_us, purchase_us, value).
    */
  def linearAttribution(pairs: DataFrame): DataFrame = {
    val byP = Window.partitionBy("purchase_id")
    val ord = byP.orderBy(col("click_us"), col("click_id"))
    pairs
      .withColumn("__vm", floor(col("value") * 1e6 + 0.5).cast("long"))
      .withColumn("__n", count(lit(1)).over(byP))
      .withColumn("__rn", row_number().over(ord))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("click_us"), col("__n").as("n_touches"),
        (expr("(__vm - pmod(__vm, __n)) div __n") +
          when(col("__rn") <= expr("pmod(__vm, __n)"), lit(1L))
            .otherwise(lit(0L)))
          .as("credit_micro"))
  }
}
