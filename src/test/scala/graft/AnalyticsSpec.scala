package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavioral, PageRank}

/** Behavioral + graph analytics operators (q107–q110): windowed funnel,
  * cohort retention, integer PageRank, basket lift.
  */
class AnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "t", "event_type")

  // ---- funnel --------------------------------------------------------------

  test("funnel anchors at the FIRST step-1 event (first-touch semantics)") {
    // user 1: signup@100 -> click@150 (in) ; a later signup@400 with a
    // click@450 must NOT re-anchor: the chain matched from t=100 already
    val out = Behavioral.funnelSteps(
      ev((1, 100, "signup"), (1, 150, "click"), (1, 400, "signup"),
        (1, 450, "click")),
      Seq("signup", "click"), horizonUs = 100L)
      .as[(Long, Long, Option[Long], Long)].collect().toMap2
    assert(out(1L) === ((100L, Some(150L), 2L)))
  }

  test("horizon bound is inclusive at exactly +H and broken at +H+1") {
    val in = Behavioral.funnelSteps(
      ev((1, 0, "signup"), (1, 100, "click")),
      Seq("signup", "click"), horizonUs = 100L)
    assert(in.select("stage").as[Long].head() === 2L)
    val outB = Behavioral.funnelSteps(
      ev((2, 0, "signup"), (2, 101, "click")),
      Seq("signup", "click"), horizonUs = 100L)
    assert(outB.select("stage").as[Long].head() === 1L)
    assert(outB.select("t_click").as[Option[Long]].head().isEmpty)
  }

  test("events BEFORE the anchor never match, and the chain is ordered") {
    // click precedes signup -> stage 1; purchase within horizon of signup
    // but with no click -> still stage 1 (steps are sequential, not a set)
    val out = Behavioral.funnelSteps(
      ev((1, 100, "click"), (1, 200, "signup"), (1, 250, "purchase")),
      Seq("signup", "click", "purchase"), horizonUs = 1000L)
    assert(out.select("stage").as[Long].head() === 1L)
  }

  test("users with no step-1 event produce no row") {
    val out = Behavioral.funnelSteps(
      ev((1, 100, "click"), (2, 50, "signup")),
      Seq("signup", "click"), horizonUs = 10L)
    assert(out.select("user_id").as[Long].collect().toSeq === Seq(2L))
  }

  // ---- cohort retention ----------------------------------------------------

  test("cohort retention buckets by fixed spans from the origin") {
    // origin 0, bucket 100: user 1 first at 50 (cohort 0), active at 150
    // (k=1) and 250 (k=2); user 2 first at 150 (cohort 1), active 160 (k=0)
    val out = Behavioral.cohortRetention(
      Seq((1L, 50L), (1L, 150L), (1L, 250L), (2L, 150L), (2L, 160L))
        .toDF("user_id", "t"),
      originUs = 0L, bucketUs = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L)))
  }

  test("retention cell counts distinct users, not events") {
    val out = Behavioral.cohortRetention(
      Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 15L))
        .toDF("user_id", "t"),
      originUs = 0L, bucketUs = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 0L, 2L)))
  }

  // ---- integer PageRank ----------------------------------------------------

  test("integer PageRank matches a driver-side computation on a star graph") {
    // 1 hub <-> 3 spokes, symmetrized: hub deg 3, spokes deg 1, N=4
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L),
      (3L, 0L)).toDF("src", "dst")
    val got = PageRank.pagerankInt(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    graft.ext.Caches.releaseAll()
    // driver-side twin of the same integer recurrence
    val n = 4L
    var r = Map(0L -> 1000000000L / n, 1L -> 1000000000L / n,
      2L -> 1000000000L / n, 3L -> 1000000000L / n)
    val deg = Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 3L -> 1L)
    val tele = 15L * 1000000000L / (100L * n)
    for (_ <- 1 to 2) {
      val csum = Map(
        0L -> (r(1L) / deg(1L) + r(2L) / deg(2L) + r(3L) / deg(3L)),
        1L -> r(0L) / deg(0L), 2L -> r(0L) / deg(0L),
        3L -> r(0L) / deg(0L))
      r = r.keys.map(k => k -> (tele + 85L * csum(k) / 100L)).toMap
    }
    assert(got === r)
    assert(got(0L) > got(1L), "hub must outrank spokes")
  }

  test("integer PageRank is bit-identical under repartitioning") {
    val edges = spark.range(500).select(
      (col("id") % 37).as("src"), (col("id") * 7919 % 37).as("dst"))
      .filter(col("src") =!= col("dst"))
    val a = PageRank.pagerankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    graft.ext.Caches.releaseAll()
    val b = PageRank.pagerankInt(edges.repartition(13), iters = 3)
      .as[(Long, Long)].collect().toMap
    graft.ext.Caches.releaseAll()
    assert(a === b)
  }

  test("PageRank mass is conserved up to deterministic flooring loss") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val total = PageRank.pagerankInt(edges, iters = 3)
      .agg(sum("r")).as[Long].head()
    graft.ext.Caches.releaseAll()
    // each of N nodes can floor away < 1 nano-unit at the teleport term,
    // the damping div, and each contribution div, per iteration
    assert(total <= PageRank.Scale)
    assert(total > PageRank.Scale - 3 * 3 * 3)
  }

  // ---- basket lift ---------------------------------------------------------

  test("basket lift matches the hand-computed contingency") {
    // baskets: {a,b} {a,b} {a,c} {b} — N=4, s(a)=3 s(b)=3 s(c)=1,
    // co(a,b)=2 -> lift = 2*4/(3*3) = 0.888888...
    val bk = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L), (4L, 2L)).toDF("o", "p")
    val out = Behavioral.basketLift(bk, minsup = 2L)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L, 2L, 888888L)))
  }

  test("pairs are canonicalized p1 < p2 and minsup filters singletons") {
    val bk = Seq((1L, 5L), (1L, 3L), (2L, 3L), (2L, 5L), (3L, 9L),
      (3L, 3L)).toDF("o", "p")
    val out = Behavioral.basketLift(bk, minsup = 2L)
      .select("p1", "p2").as[(Long, Long)].collect().toSet
    assert(out === Set((3L, 5L))) // (3,9) occurs once -> filtered
  }

  private implicit class Map2Ops(
      rows: Array[(Long, Long, Option[Long], Long)]) {
    def toMap2: Map[Long, (Long, Option[Long], Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
