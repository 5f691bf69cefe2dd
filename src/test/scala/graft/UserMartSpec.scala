package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.UserMartJob
import Fixtures._

class UserMartSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // FIXTURES.md §A1 hard cases, encoding the *reference's* island semantics
  // (project_step_1.py:64-85): islands are runs of consecutive event-day ranks,
  // so only events in ANOTHER city break a run (not calendar gaps), and an
  // island that doesn't contain the user's latest day loses its boundary row
  // to the lag filter (effectively needs n+1 days).
  private lazy val events = eventsDf(spark,
    dailyRun(1, "Sydney", "2022-05-01", 28, idBase = 1000) ++   // 28: home even
      dailyRun(1, "Melbourne", "2022-05-29", 2, idBase = 2000) ++ // with later trip
      dailyRun(2, "Sydney", "2022-05-01", 26, idBase = 3000) ++ // 26 -> no home
      dailyRun(3, "Sydney", "2022-05-01", 20, idBase = 4000) ++ // broken by a
      dailyRun(3, "Melbourne", "2022-05-21", 3, idBase = 4500) ++ // Melbourne stay
      dailyRun(3, "Sydney", "2022-05-24", 20, idBase = 5000) ++
      dailyRun(4, "Sydney", "2022-01-01", 29, idBase = 6000) ++ // island 1 (29d)
      dailyRun(4, "Melbourne", "2022-03-01", 27, idBase = 7000) ++ // island 2 (wins)
      dailyRun(5, "Sydney", "2022-05-01", 1, idBase = 8000) ++  // route golden
      dailyRun(5, "Brisbane", "2022-05-02", 1, idBase = 8100) ++
      dailyRun(5, "Perth", "2022-05-03", 1, idBase = 8200))
  private lazy val geo = geoDf(spark)
  private lazy val mart = UserMartJob.transform(events, geo).cache()

  private def row(u: Long) = mart.filter($"user_id" === u)

  test("a long-enough run makes a home city; 26 days do not") {
    assert(row(1).select("home_city").as[String].head() === "Sydney")
    assert(row(2).select("home_city").as[Option[String]].head().isEmpty)
  }

  test("a stay in another city breaks the consecutive-day run") {
    assert(row(3).select("home_city").as[Option[String]].head().isEmpty)
  }

  test("with two qualifying islands the latest wins") {
    // island 1 (Sydney, 29d, older) qualifies too; Melbourne is more recent
    assert(row(4).select("home_city").as[String].head() === "Melbourne")
  }

  test("act_city is the city of the latest message") {
    assert(row(1).select("act_city").as[String].head() === "Melbourne")
    assert(row(4).select("act_city").as[String].head() === "Melbourne")
    assert(row(5).select("act_city").as[String].head() === "Perth")
  }

  test("travel route is ordered and excludes the home city") {
    assert(row(5).select("travel_array").as[Seq[String]].head()
      === Seq("Sydney", "Brisbane", "Perth"))
    assert(row(5).select("travel_count").as[Long].head() === 3L)
    // user 1: home Sydney excluded, Melbourne remains
    assert(row(1).select("travel_array").as[Seq[String]].head()
      === Seq("Melbourne"))
  }

  test("strictOrder travel rebuilds the same route deterministically") {
    val mg = UserMartJob.messageGeo(events, geo)
    val home = UserMartJob.homeGeo(mg)
    val strict = UserMartJob.travel(mg, home, strictOrder = true)
    assert(strict.filter($"user_id" === 5).select("travel_array")
      .as[Seq[String]].head() === Seq("Sydney", "Brisbane", "Perth"))
    // same elements and counts as the reference-shaped path for every user
    val loose = UserMartJob.travel(mg, home)
      .select($"user_id", $"travel_count").as[(Long, Long)].collect().toMap
    val strictCounts = strict
      .select($"user_id", $"travel_count").as[(Long, Long)].collect().toMap
    assert(strictCounts === loose)
  }

  test("messageGeo's decide-on-points shape matches the reference cross join " +
      "on ties and null coordinates") {
    import org.apache.spark.sql.functions._
    // two cities mirrored across the equator: the (0, 0) message is an
    // EXACT haversine tie (same formula, symmetric inputs) and must emit
    // one row per tied city, like the reference crossJoin + window-min;
    // the null-coordinate message must vanish in both shapes
    val tieGeo = Seq((1L, "North", 10.0, 20.0), (2L, "South", -10.0, 20.0))
      .toDF("id", "city", "lat", "lon")
    val evs = eventsDf(spark, Seq(
      msg(1, "2022-05-01 12:00:00", 0.0, 20.0, id = 1),   // exact tie
      msg(2, "2022-05-01 13:00:00", 9.0, 20.0, id = 2),   // clear North
      EvRow(message_from = Some(3L), message_id = Some(3L),
        message_ts = Some("2022-05-01 14:00:00"),
        datetime = Some("2022-05-01 14:00:00"),
        lat = None, lon = None)))                          // null coords
    val got = UserMartJob.messageGeo(evs, tieGeo)
    // the reference shape, verbatim (crossJoin + per-coordinate window-min)
    val msgs = evs.filter(col("event_type") === "message").select(
      col("event.message_from").as("user_id"), col("event.message_id"),
      coalesce(col("event.message_ts"), col("event.datetime"))
        .cast("timestamp").as("datetime"),
      col("lat").as("lat_message"), col("lon").as("lon_message"))
    val ref = graft.operators.NearestNeighborJoin
      .nearestAllTies(msgs, tieGeo, "lat_message", "lat", "lon_message", "lon")
      .drop("lat_message", "lon_message", "lat", "lon")
    val cols = got.columns.sorted.map(col)
    assert(got.select(cols: _*).collect().toSet
      === ref.select(cols: _*).collect().toSet)
    // the tie really is a tie: user 1 appears once per tied city
    assert(got.filter(col("user_id") === 1).count() === 2)
    assert(got.filter(col("user_id") === 3).count() === 0)
  }

  test("local_time converts UTC to Australia/Sydney (+10h in May)") {
    val lt = row(5).select("local_time").as[java.sql.Timestamp].head()
    assert(lt.toString.startsWith("2022-05-03 22:00:00")) // 12:00 UTC + 10h AEST
  }

  test("mart has one row per messaging user") {
    assert(mart.count() === 5)
  }
}
