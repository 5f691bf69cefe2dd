package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ZOrder

class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("interleave matches a driver-side reference Morton code") {
    def morton(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (j <- 0 until bits) {
        z |= ((x >> j) & 1L) << (2 * j)
        z |= ((y >> j) & 1L) << (2 * j + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (4095L, 4095L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.interleave($"x", $"y", 12)).as[Long].collect().toSeq
    assert(got === cases.map { case (x, y) => morton(x, y, 12) })
  }

  test("quantize clamps the domain edges instead of wrapping") {
    val got = Seq(-91.0, -90.0, 0.0, 89.99, 90.0, 91.0).toDF("v")
      .select(ZOrder.quantizeDim($"v", -90, 90, 4)).as[Long].collect().toSeq
    assert(got.head === 0L && got.last === 15L)
    assert(got.forall(c => c >= 0L && c <= 15L))
    assert(got === got.sorted) // monotone
  }

  test("z-order prunes on the dimension a single-column sort neglects") {
    // uniform grid; two layouts of the same rows: z-clustered vs lat-sorted.
    // A lon-selective box query can skip nothing in the lat-sorted layout
    // (every lat stripe spans all longitudes) but most z-files. "Skippable"
    // is judged exactly the way parquet row-group pruning does: does the
    // file's (min,max) stats box intersect the predicate box?
    val pts = spark.range(20000).select(
      (($"id" % 181) - 90).cast("double").as("lat"),
      ((($"id" * 7) % 361) - 180).cast("double").as("lon"))
    val zdir = "/tmp/graft_zorder_spec/z"
    val latdir = "/tmp/graft_zorder_spec/lat"
    ZOrder.writeClustered(pts, ZOrder.zValue($"lat", $"lon"), 16, zdir)
    pts.repartitionByRange(16, $"lat").sortWithinPartitions($"lat")
      .write.mode("overwrite").parquet(latdir)
    def filesIntersecting(dir: String, lonLo: Double, lonHi: Double): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("lon").as("lon0"), max("lon").as("lon1"))
        .filter($"lon1" >= lonLo && $"lon0" <= lonHi)
        .count()
    val zFiles = filesIntersecting(zdir, 100, 110)
    val latFiles = filesIntersecting(latdir, 100, 110)
    assert(latFiles === 16L, "every lat stripe contains every longitude")
    // 16 z-files ≈ 4 lat-quarters × 4 lon-quarters; a 10° lon box lives in
    // one lon quarter (+ sampled-boundary slop) → ≤ 8 of 16
    assert(zFiles <= 8L, s"z-order files intersecting: $zFiles of 16")
  }

  test("clustered write round-trips rows exactly") {
    val pts = spark.range(0, 500).select(
      (($"id" % 181) - 90).cast("double").as("lat"),
      ((($"id" * 7) % 361) - 180).cast("double").as("lon"))
    val dir = "/tmp/graft_zorder_spec/rt"
    ZOrder.writeClustered(pts, ZOrder.zValue($"lat", $"lon"), 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 500L)
    assert(back.exceptAll(pts).isEmpty && pts.exceptAll(back).isEmpty)
  }
}
