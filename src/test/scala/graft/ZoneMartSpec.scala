package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.ZoneMartJob
import Fixtures._

class ZoneMartSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val (syLat, syLon) = cityCoord("Sydney")
  private val (meLat, meLon) = cityCoord("Melbourne")

  // user 1 messages from Sydney (weeks 18/19, May 2022); reactions carry no coords
  // and must inherit the last message's position; user 2 messages from Melbourne.
  // user 3 only reacts (no message) -> dropped by the reference's inner join.
  private lazy val events = eventsDf(spark, Seq(
    msg(1, "2022-05-02 10:00:00", syLat + 0.01, syLon + 0.01, id = 1),
    msg(1, "2022-05-03 10:00:00", syLat + 0.02, syLon + 0.02, id = 2),
    msg(1, "2022-05-09 10:00:00", syLat + 0.03, syLon + 0.03, id = 3), // week 19
    reaction(1, "2022-05-04 11:00:00", Double.NaN, Double.NaN)
      .copy(lat = None, lon = None), // no coords -> last msg position
    subscription(1, "chA", "2022-05-02 12:00:00", syLat, syLon),
    registration(1, "2022-05-02 09:00:00", syLat, syLon),
    msg(2, "2022-05-02 10:00:00", meLat + 0.01, meLon + 0.01, id = 4),
    reaction(3, "2022-05-02 10:00:00", meLat, meLon)))
  private lazy val mart = ZoneMartJob.transform(events, geoDf(spark)).cache()

  test("pivot produces week/month columns per zone") {
    assert(mart.columns.toSet === Set("month", "week", "city_id",
      "week_message", "week_reaction", "week_subscription", "week_user",
      "month_message", "month_reaction", "month_subscription", "month_user"))
  }

  test("sydney week 18 counts: 2 messages, 1 reaction, 1 sub, 1 registration") {
    val r = mart.filter($"city_id" === 1 && $"week" === 18)
      .select("week_message", "week_reaction", "week_subscription", "week_user")
      .as[(Long, Long, Long, Long)].head()
    assert(r === ((2L, 1L, 1L, 1L)))
  }

  test("week 19 message in Sydney counted separately; month rolls both weeks up") {
    val w19 = mart.filter($"city_id" === 1 && $"week" === 19)
      .select("week_message").as[Long].head()
    assert(w19 === 1L)
    val m5 = mart.filter($"city_id" === 1 && $"month" === 5)
      .select("month_message").as[Long].head()
    assert(m5 === 3L)
  }

  test("users with no message are dropped (reference quirk c)") {
    assert(mart.filter($"city_id" === 2).count() > 0) // user 2 present
    // user 3's reaction in Melbourne is NOT counted (no message to join on)
    val mel = mart.filter($"city_id" === 2 && $"week" === 18)
      .select("week_reaction").as[Option[Long]].head()
    assert(mel.isEmpty || mel.contains(0L))
  }
}
