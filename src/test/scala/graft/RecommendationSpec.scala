package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.RecommendationJob
import Fixtures._

class RecommendationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val (syLat, syLon) = cityCoord("Sydney")
  private val (peLat, peLon) = cityCoord("Perth")

  // channel chA: users 1,2,3 subscribed. 1 and 2 already messaged each other.
  // On the target date: 1,2,3 are near Sydney; 4 (chB with 5) is in Perth, 5 in
  // Sydney -> pair (5,4) fails the 100 km radius. Expected recommendation: (3,1),
  // (3,2) from chA within radius, never messaged.
  private val d = "2022-06-15"
  private lazy val allEvents = eventsDf(spark, Seq(
    subscription(1, "chA", "2022-06-01 10:00:00"),
    subscription(2, "chA", "2022-06-01 10:00:00"),
    subscription(3, "chA", "2022-06-01 10:00:00"),
    subscription(4, "chB", "2022-06-01 10:00:00"),
    subscription(5, "chB", "2022-06-01 10:00:00"),
    msg(1, "2022-06-02 10:00:00", syLat, syLon, id = 1, to = 2),
    msg(2, "2022-06-03 10:00:00", syLat, syLon, id = 2, to = 1)))
  private lazy val eventsAtDate = eventsDf(spark, Seq(
    msg(1, s"$d 10:00:00", syLat + 0.01, syLon + 0.01, id = 10, to = 2),
    msg(2, s"$d 11:00:00", syLat + 0.02, syLon + 0.02, id = 11, to = 1),
    msg(3, s"$d 12:00:00", syLat + 0.03, syLon + 0.03, id = 12, to = 1),
    msg(4, s"$d 10:00:00", peLat, peLon, id = 13, to = 5),
    msg(5, s"$d 10:00:00", syLat, syLon, id = 14, to = 4)))

  private lazy val mart = RecommendationJob.transform(
    allEvents, eventsAtDate, geoDf(spark), d, maxDistanceKm = 100.0).cache()

  test("recommends same-channel pairs within radius that never messaged") {
    // reference quirk: user_left == user_right == canonical (greater) user id,
    // so both expected pairs (3,1) and (3,2) surface as user_left=3
    assert(mart.count() === 2)
    assert(mart.select("user_left").as[Long].collect().toSeq === Seq(3L, 3L))
    assert(mart.select("user_right").as[Long].collect().toSeq === Seq(3L, 3L))
  }

  test("already-communicating pairs are anti-joined away") {
    val communicating = RecommendationJob.communicatingSubscribers(
      allEvents, RecommendationJob.subscribers(allEvents))
    val pairs = communicating.select("user_id", "message_to")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((2L, 1L))) // canonicalized: greater id first
  }

  test("pairs beyond the radius are filtered (Perth-Sydney > 100 km)") {
    val wide = RecommendationJob.transform(
      allEvents, eventsAtDate, geoDf(spark), d, maxDistanceKm = 5000.0)
    assert(wide.count() === 3) // (3,1),(3,2) plus the chB pair (5,4)
  }

  test("emitPeerId=true carries the real peer instead of the quirk") {
    val subs = RecommendationJob.subscribers(allEvents)
    val communicating = RecommendationJob.communicatingSubscribers(allEvents, subs)
    val cands = RecommendationJob.possibleSubscribersToCommunicate(
      subs, communicating, eventsAtDate, d, 100.0, emitPeerId = true)
    val pairs = cands.select("user_left", "user_right")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((3L, 1L), (3L, 2L)))
  }

  test("zone is the nearest city to the pair midpoint") {
    assert(mart.select("zone_id").distinct().as[Long].head() === 1L) // Sydney
    assert(mart.select("processed_dttm").distinct().as[String].head() === d)
  }

  test("gridZone scale tier is row-identical to the reference zone attach") {
    import org.apache.spark.sql.functions._
    val at = to_timestamp(lit("2022-06-15 02:00:00"))
    val ref = RecommendationJob.transform(
      allEvents, eventsAtDate, geoDf(spark), d, maxDistanceKm = 5000.0,
      processedAt = at)
    val grid = RecommendationJob.transform(
      allEvents, eventsAtDate, geoDf(spark), d, maxDistanceKm = 5000.0,
      processedAt = at, zoneTier = "grid") // forced: this test IS the tier proof
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_left"), col("user_right"), col("zone_id"),
        col("processed_dttm"),
        date_format(col("local_time"), "yyyy-MM-dd HH:mm:ss"))
      .as[(Long, Long, Long, String, String)].collect().sorted.toSeq
    try assert(rows(grid) === rows(ref) && rows(ref).nonEmpty)
    finally graft.ext.GridNearestJoin.releaseCaches()
  }

  test("auto zone tier: plan stats pick ref below the crossover, grid above") {
    // stats are plan-time (Range reports rows × 8 bytes) — no data moves.
    // The three branches: small/small -> reference shape; fact past the
    // measured 32 MiB crossover -> grid; dim past broadcastability -> grid
    // regardless of fact size (the 100 TB correctness guard).
    val smallFact = spark.range(1000L).toDF("x")
    val smallDim = spark.range(25L).toDF("id")
    assert(!RecommendationJob.chooseGridZone(smallFact, smallDim))
    val bigFact = spark.range(16L << 20).toDF("x") // 128 MiB plan estimate
    assert(RecommendationJob.chooseGridZone(bigFact, smallDim))
    val bigDim = spark.range(4L << 20).toDF("id") // 32 MiB > dim bound
    assert(RecommendationJob.chooseGridZone(smallFact, bigDim))
  }

  test("injected processedAt pins local_time (F5 made testable)") {
    import org.apache.spark.sql.functions._
    val pinned = RecommendationJob.transform(
      allEvents, eventsAtDate, geoDf(spark), d, maxDistanceKm = 100.0,
      processedAt = to_timestamp(lit("2022-06-15 02:00:00")))
    val lt = pinned.select(date_format(col("local_time"), "yyyy-MM-dd HH:mm:ss"))
      .distinct().as[String].collect().toSeq
    assert(lt === Seq("2022-06-15 12:00:00")) // UTC+10 (AEST, June = winter)
    // default path still produces a non-null wall-clock local_time
    assert(mart.filter(col("local_time").isNull).count() === 0)
  }
}
