package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo
import graft.operators.NearestNeighborJoin

class GeoSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("haversine matches known city-pair distances") {
    val pairs = Seq(
      // published great-circle distances (km)
      ("Sydney", "Melbourne", 713.0),
      ("Sydney", "Perth", 3290.0),
      ("Brisbane", "Adelaide", 1601.0))
    val df = pairs.map { case (a, b, exp) =>
      val (la1, lo1) = Fixtures.cityCoord(a)
      val (la2, lo2) = Fixtures.cityCoord(b)
      (la1, lo1, la2, lo2, exp)
    }.toDF("lat1", "lon1", "lat2", "lon2", "expected")
    val got = df.withColumn("d",
      Geo.haversineKm($"lat1", $"lat2", $"lon1", $"lon2"))
      .select("d", "expected").as[(Double, Double)].collect()
    got.foreach { case (d, exp) =>
      assert(math.abs(d - exp) / exp < 0.01, s"got $d expected ~$exp")
    }
  }

  test("haversine is symmetric and zero at identity") {
    val df = Seq((-33.8688, 151.2093, -37.8136, 144.9631))
      .toDF("lat1", "lon1", "lat2", "lon2")
    val Array((ab, ba, self)) = df.select(
      Geo.haversineKm($"lat1", $"lat2", $"lon1", $"lon2"),
      Geo.haversineKm($"lat2", $"lat1", $"lon2", $"lon1"),
      Geo.haversineKm($"lat1", $"lat1", $"lon1", $"lon1"))
      .as[(Double, Double, Double)].collect()
    assert(ab === ba)
    assert(self === 0.0)
  }

  test("nearestAllTies keeps all equidistant cities; nearestOne picks one") {
    val geo = Seq((1L, "A", 0.0, 0.0), (2L, "B", 0.0, 2.0))
      .toDF("id", "city", "lat", "lon")
    // (0,1) is exactly equidistant from A and B; (0.1, 0.2) is nearest to A
    val src = Seq((10L, 0.0, 1.0), (11L, 0.1, 0.2))
      .toDF("key", "slat", "slon")
    val ties = NearestNeighborJoin
      .nearestAllTies(src, geo, "slat", "lat", "slon", "lon")
    assert(ties.filter($"key" === 10).count() === 2)
    assert(ties.filter($"key" === 11).select("city").as[String].collect()
      .toSeq === Seq("A"))
    val one = NearestNeighborJoin.nearestOne(src, geo,
      "slat", "lat", "slon", "lon", Seq("key"), Seq(col("id")))
    assert(one.count() === 2)
    assert(one.filter($"key" === 10).select("id").as[Long].head() === 1L)
  }
}
