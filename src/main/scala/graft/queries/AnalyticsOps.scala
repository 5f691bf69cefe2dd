package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Behavioral, PageRank}
import graft.sources.Tables

/** Round-7 behavioral/graph analytics catalog: the product-analytics and
  * graph-scoring surface a warehouse serves beside curation — windowed
  * funnels (q107), cohort retention (q108), fixed-iteration PageRank
  * (q109), and market-basket lift (q110).
  *
  * Cross-engine device shared by all four: EVERY computation is integer
  * arithmetic on epoch-µs longs or scaled counts — division is Spark `div`
  * / DuckDB `//` (both truncate toward zero), sums are long sums
  * (associative, order-independent) — so all four queries hash-check
  * cell-exact with zero float tolerance. PageRank in particular runs
  * entirely in integer nano-rank units: the usual double-precision rank
  * vector is order-sensitive under distributed summation, while the
  * floored-integer fixed point is bit-identical on any cluster size.
  *
  * Scale shapes (the 100 TB contract):
  *  - q107: the three stage aggregations and both stage joins are ALL
  *    keyed by user_id — one hash partitioning serves the whole chain
  *    (co-partitioned joins, no repartitioning between stages), and each
  *    stage's events are filtered by type at the scan;
  *  - q108: one user-keyed aggregation + a co-partitioned join back, then
  *    a (cohort, offset)-keyed count-distinct whose cardinality is
  *    |weeks|² — tiny at any corpus size;
  *  - q109: the textbook distributed PageRank loop — ranks live in a
  *    DataFrame (never on the driver, unlike the k-means centroid state:
  *    node count grows with the data), each iteration is one src-keyed
  *    join (contributions) + one dst-keyed aggregation; the edge list
  *    with out-degrees is iteration-invariant and persisted once;
  *  - q110: candidate pairs come from a per-basket self-join — Σ|basket|²
  *    per order, never |parts|² (the same bounded-explosion contract as
  *    every dedup candidate generator); supports join back per-part.
  */
object AnalyticsOps extends Catalog {

  /** 24 h in µs — the funnel step horizon */
  private val HorizonUs = 86400000000L
  /** epoch µs of 2024-01-01 00:00 UTC — the cohort week origin */
  private val T0Us = 1704067200000000L
  /** 7 days in µs */
  private val WeekUs = 604800000000L

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- windowed funnel: signup -> click -> purchase ----------------------
    // First-touch semantics (the ClickHouse-windowFunnel-style greedy
    // matcher): the funnel anchors at the user's FIRST signup, then takes
    // the first click within 24 h of it, then the first purchase within
    // 24 h of that click. Greedy-from-first-anchor is deterministic and
    // one-pass; it is NOT the maximal matcher (a later signup could open a
    // window an earlier one misses) — that variant is a per-user sequence
    // fold, deliberately out of scope. Stage timestamps leave as epoch-µs
    // longs (never raw timestamps — driver comparator gotcha) and stage is
    // 1/2/3 by which timestamps resolved; by construction t_purchase
    // exists only under t_click. 150 -> 65 -> 29 users at sf0.01.
    "q107_funnel_steps" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          col("event_type"))
      Behavioral.funnelSteps(ev, Seq("signup", "click", "purchase"),
        HorizonUs)
    }),

    // ---- cohort retention matrix -------------------------------------------
    // Cohort = the user's first-event week; k = activity week − cohort
    // week; cell = distinct users from that cohort active k weeks later —
    // the classic retention triangle. Weeks are FIXED 7-day buckets from a
    // pinned origin ((t − T0) div WEEK), not calendar weeks: week-start
    // conventions (ISO vs US) differ across engines, integer division
    // does not. The (cohort_w, k) matrix is |weeks|² rows — the final
    // aggregation output is tiny regardless of corpus size.
    "q108_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
      Behavioral.cohortRetention(ev, T0Us, WeekUs)
    }),

    // ---- fixed-iteration integer PageRank over the supplier-part graph -----
    // The iterative-graph tier beside ConnectedComponents: PageRank
    // (d = 0.85, 3 iterations) on the bipartite supplier<->part graph from
    // lineitem (edges both directions, so no dangling nodes and the walk
    // is the standard co-purchasing authority score). Ranks are LONGS in
    // nano-rank units (total mass 10⁹): init r = 10⁹ div N; per iteration
    // each node sends r div deg along each out-edge (integer div — exact,
    // and the long sum over in-edges is associative hence shuffle-order-
    // independent), then r' = (15·10⁹) div (100·N) + (85·csum) div 100.
    // Flooring leaks a few nano-units of mass per step — the price of a
    // bit-exact distributed fixed point; a double-precision rank vector
    // would be cheaper arithmetic but its Σ over in-edges depends on
    // partitioning. Overflow bound: 85·csum ≤ 85·10⁹ ≪ 2⁶³. The contrast
    // with q84's k-means: centroid state was k·dims (driver-sized,
    // collected per iteration); the rank vector is node-count-sized and
    // STAYS a DataFrame — at 10¹⁰ nodes the loop shape is unchanged.
    "q109_pagerank_bipartite" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val e0 = li.select(col("l_suppkey").cast("long").as("s"),
          (col("l_partkey").cast("long") + 1000000L).as("p"))
        .distinct()
      val edges = e0.select(col("s").as("src"), col("p").as("dst"))
        .unionByName(e0.select(col("p").as("src"), col("s").as("dst")))
      PageRank.pagerankInt(edges, iters = 3)
    }),

    // ---- market-basket lift (association mining) ---------------------------
    // Which part pairs are bought together more than independence
    // predicts? support s(p) = baskets containing p, co(p1,p2) = baskets
    // containing both (per-basket self-join on p1 < p2 — Σ|basket|² per
    // order, max basket 13 here, never |parts|²), lift = co·N/(s1·s2) in
    // integer micros via one truncating division. minsup co ≥ 2 keeps
    // ~3.4k pairs at both test scales. Overflow bound: co·N·10⁶ < 2⁶³
    // holds through ~9·10¹² basket-pair mass; past that drop the scale a
    // decade (the q105 Gram-matrix rule).
    "q110_basket_lift" -> ((s, d) => {
      val bk = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"),
          col("l_partkey").cast("long").as("p"))
        .distinct()
      Behavioral.basketLift(bk, minsup = 2L)
    })
  )

  override def oracles: Map[String, String] = Map(
    "q107_funnel_steps" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |              event_type FROM events),
         |a AS (SELECT user_id, min(t) AS t_signup FROM ev
         |      WHERE event_type = 'signup' GROUP BY 1),
         |b AS (SELECT e.user_id, min(e.t) AS t_click FROM ev e
         |      JOIN a ON e.user_id = a.user_id
         |      WHERE e.event_type = 'click' AND e.t >= a.t_signup
         |        AND e.t <= a.t_signup + $HorizonUs GROUP BY 1),
         |c AS (SELECT e.user_id, min(e.t) AS t_purchase FROM ev e
         |      JOIN b ON e.user_id = b.user_id
         |      WHERE e.event_type = 'purchase' AND e.t >= b.t_click
         |        AND e.t <= b.t_click + $HorizonUs GROUP BY 1)
         |SELECT a.user_id, a.t_signup, b.t_click, c.t_purchase,
         |  CAST(1 + (CASE WHEN b.t_click IS NULL THEN 0 ELSE 1 END)
         |         + (CASE WHEN c.t_purchase IS NULL THEN 0 ELSE 1 END)
         |       AS BIGINT) AS stage
         |FROM a LEFT JOIN b ON a.user_id = b.user_id
         |       LEFT JOIN c ON a.user_id = c.user_id""".stripMargin,

    "q108_cohort_retention" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         |            FROM events),
         |f AS (SELECT user_id, min(t) AS t0 FROM ev GROUP BY 1)
         |SELECT (f.t0 - $T0Us) // $WeekUs AS cohort_w,
         |  (e.t - $T0Us) // $WeekUs - (f.t0 - $T0Us) // $WeekUs AS k,
         |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
         |FROM ev e JOIN f ON e.user_id = f.user_id
         |GROUP BY 1, 2""".stripMargin,

    "q109_pagerank_bipartite" -> {
      // 3 unrolled iterations; every step the same integer arithmetic in
      // the same order as the Spark loop (// and div both truncate)
      def iter(prev: String, out: String): String =
        s"""c$out AS (SELECT e.dst,
           |    CAST(sum(r.r // d.deg) AS BIGINT) AS csum
           |  FROM edges e JOIN deg d ON e.src = d.src
           |  JOIN $prev r ON r.node = e.src GROUP BY 1),
           |$out AS (SELECT nodes.node,
           |    CAST(15000000000 AS BIGINT) // (100 * nn.n)
           |      + (85 * coalesce(c$out.csum, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN c$out ON c$out.dst = nodes.node)""".stripMargin
      s"""WITH e0 AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
         |              CAST(l_partkey AS BIGINT) + 1000000 AS p
         |            FROM lineitem),
         |edges AS (SELECT s AS src, p AS dst FROM e0
         |          UNION ALL SELECT p AS src, s AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, 1000000000 // n AS r FROM nodes CROSS JOIN nn),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, CAST(r AS BIGINT) AS r FROM r3""".stripMargin
    },

    "q110_basket_lift" ->
      """WITH bk AS (SELECT DISTINCT l_orderkey AS o,
        |              CAST(l_partkey AS BIGINT) AS p FROM lineitem),
        |nn AS (SELECT count(DISTINCT o) AS n FROM bk),
        |supp AS (SELECT p, count(*) AS s FROM bk GROUP BY 1),
        |pairs AS (SELECT a.p AS p1, b.p AS p2, count(*) AS co
        |  FROM bk a JOIN bk b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pr.p1, pr.p2, CAST(pr.co AS BIGINT) AS co,
        |  CAST((pr.co * nn.n * 1000000) // (s1.s * s2.s) AS BIGINT)
        |    AS lift_micro
        |FROM pairs pr
        |JOIN supp s1 ON s1.p = pr.p1
        |JOIN supp s2 ON s2.p = pr.p2
        |CROSS JOIN nn""".stripMargin
  )
}
