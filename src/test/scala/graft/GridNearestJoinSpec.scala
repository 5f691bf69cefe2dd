package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.GridNearestJoin
import graft.functions.Geo
import graft.operators.NearestNeighborJoin

/** The grid-bucketed geo joins must be exactly equivalent to the brute-force
  * shapes they replace, and their plans must be equi-joins, not cartesians.
  */
class GridNearestJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random points over lat [-60, 60), lon [-170, 170)
  private def points(n: Int, aMul: Long, bMul: Long) =
    (1 to n).map { i =>
      (i.toLong,
        -60.0 + (i * aMul % 1200) / 10.0,
        -170.0 + (i * bMul % 3400) / 10.0)
    }

  private lazy val src = points(300, 67, 131).toDF("id", "lat", "lon")
  private lazy val dim = points(500, 73, 179).toDF("site", "site_lat", "site_lon")

  test("grid nearest equals brute-force nearest on every row") {
    val grid = GridNearestJoin.nearest(src, dim,
        "lat", "site_lat", "lon", "site_lon",
        srcKey = Seq("id"), tieBreak = Seq(col("site")),
        cellDeg = 12.0, maxAbsLatDeg = 60.0)
      .select($"id", $"site", round($"distance", 6).as("d"))
    val brute = NearestNeighborJoin.nearestOne(src, dim,
        "lat", "site_lat", "lon", "site_lon",
        srcKey = Seq("id"), tieBreak = Seq(col("site")))
      .select($"id", $"site", round($"distance", 6).as("d"))
    assert(grid.count() === 300)
    assert(grid.except(brute).isEmpty && brute.except(grid).isEmpty)
  }

  test("grid nearest stays exact even when cells are too small (fallback path)") {
    // 1° cells over sparse points: most rows miss the 3×3 neighborhood and
    // must be resolved by the exact fallback.
    val grid = GridNearestJoin.nearest(src, dim,
        "lat", "site_lat", "lon", "site_lon",
        srcKey = Seq("id"), tieBreak = Seq(col("site")),
        cellDeg = 1.0, maxAbsLatDeg = 60.0)
      .select($"id", $"site")
    val brute = NearestNeighborJoin.nearestOne(src, dim,
        "lat", "site_lat", "lon", "site_lon",
        srcKey = Seq("id"), tieBreak = Seq(col("site")))
      .select($"id", $"site")
    assert(grid.except(brute).isEmpty && brute.except(grid).isEmpty)
  }

  test("radius pairs equal brute-force all-pairs within radius") {
    val r = 800.0
    val got = GridNearestJoin.radiusPairs(src, "id", "lat", "lon",
        radiusKm = r, maxAbsLatDeg = 60.0)
      .select($"id", $"id_b", round($"distance", 6).as("d"))
    val b = src.select($"id".as("id_b"), $"lat".as("lat_b"), $"lon".as("lon_b"))
    val brute = src.crossJoin(b)
      .filter($"id" < $"id_b")
      .withColumn("distance",
        Geo.haversineKmDet($"lat", $"lat_b", $"lon", $"lon_b"))
      .filter($"distance" < r)
      .select($"id", $"id_b", round($"distance", 6).as("d"))
    assert(brute.count() > 0)
    assert(got.except(brute).isEmpty && brute.except(got).isEmpty)
  }

  test("radius pairs plan is an equi-join, not a cartesian / nested loop") {
    val plan = GridNearestJoin.radiusPairs(src, "id", "lat", "lon",
        radiusKm = 800.0, maxAbsLatDeg = 60.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("antimeridian pairs are found: lon cells wrap at 180 degrees") {
    // points hugging both sides of the date line, physically ~11-22° apart
    val pts = Seq(
      (1L, 10.0, -179.5), (2L, 10.0, 179.5),  // 1° apart across the line
      (3L, -20.0, -170.0), (4L, -20.0, 172.0), // 18° apart across the line
      (5L, 30.0, 0.0)                          // far from everything
    ).toDF("id", "lat", "lon")
    val got = GridNearestJoin.radiusPairs(pts, "id", "lat", "lon",
        radiusKm = 2500.0, maxAbsLatDeg = 35.0)
      .select($"id", $"id_b").as[(Long, Long)].collect().toSet
    val b = pts.select($"id".as("id_b"), $"lat".as("lat_b"), $"lon".as("lon_b"))
    val brute = pts.crossJoin(b).filter($"id" < $"id_b")
      .withColumn("d", Geo.haversineKmDet($"lat", $"lat_b", $"lon", $"lon_b"))
      .filter($"d" < 2500.0)
      .select($"id", $"id_b").as[(Long, Long)].collect().toSet
    assert(brute.contains((1L, 2L)) && brute.contains((3L, 4L)))
    assert(got === brute)
    // and nearest() certifies correctly across the line too
    val src = Seq((10L, 10.0, -179.9)).toDF("id", "lat", "lon")
    val dim = Seq((20L, 10.0, 179.8), (21L, 10.0, -150.0))
      .toDF("site", "site_lat", "site_lon")
    val nn = GridNearestJoin.nearest(src, dim, "lat", "site_lat",
        "lon", "site_lon", Seq("id"), Seq(col("site")),
        cellDeg = 5.0, maxAbsLatDeg = 15.0)
      .select("site").as[Long].head()
    assert(nn === 20L) // the cross-line site is the true nearest
  }

  test("lon banding disables itself near the poles and stays safe") {
    assert(GridNearestJoin.lonBandDegFor(500.0, 89.9).isEmpty)
    val band = GridNearestJoin.lonBandDegFor(1500.0, 60.0)
    assert(band.exists(b => b > 27.0 && b < 28.0)) // 2·asin(sin(r/2R)/cos 60°)
  }
}
