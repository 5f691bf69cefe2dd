package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.GridNearestJoin
import graft.functions.Geo

/** Property-based invariants (SURVEY §5 item 3): driver-side math twins of
  * the column expressions checked over seeded random samples, plus
  * distributed spot-checks of the same invariants through Spark.
  * (Plain seeded sampling — the scalatestplus/scalacheck bridge is not in
  * the offline artifact cache.)
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val N = 2000
  private def rng = new scala.util.Random(42)

  /** driver-side twin of Geo.haversineKmDet */
  private def hav(lat1: Double, lat2: Double, lon1: Double, lon2: Double): Double = {
    val k = Geo.DegToRad
    val sLat = math.sin((lat1 - lat2) * k / 2)
    val sLon = math.sin((lon1 - lon2) * k / 2)
    2 * Geo.EarthRadiusKm * math.asin(math.sqrt(
      (sLat * sLat + math.cos(lat1 * k) * math.cos(lat2 * k) * sLon * sLon)
        .min(1.0)))
  }

  test("haversine: zero at identity, symmetric, non-negative, bounded") {
    val r = rng
    (1 to N).foreach { _ =>
      val (a1, a2) = (r.nextDouble * 178 - 89, r.nextDouble * 178 - 89)
      val (o1, o2) = (r.nextDouble * 358 - 179, r.nextDouble * 358 - 179)
      val d = hav(a1, a2, o1, o2)
      assert(d >= 0.0 && d <= math.Pi * Geo.EarthRadiusKm + 1e-6)
      assert(math.abs(d - hav(a2, a1, o2, o1)) < 1e-9)
      assert(hav(a1, a1, o1, o1) === 0.0)
    }
  }

  test("haversine: meridian distance matches the latitude gap") {
    val r = rng
    (1 to N).foreach { _ =>
      val (a1, a2) = (r.nextDouble * 178 - 89, r.nextDouble * 178 - 89)
      val o = r.nextDouble * 358 - 179
      val d = hav(a1, a2, o, o)
      val expected = math.abs(a1 - a2) * Geo.DegToRad * Geo.EarthRadiusKm
      assert(math.abs(d - expected) < 1e-6)
    }
  }

  test("lat band bound is safe: |dlat| > band implies distance > radius") {
    val r = rng
    (1 to N).foreach { _ =>
      val radius = 10 + r.nextDouble * 4990
      val band = GridNearestJoin.latBandDegFor(radius)
      val (a1, o1, o2) = (r.nextDouble * 178 - 89,
        r.nextDouble * 358 - 179, r.nextDouble * 358 - 179)
      val a2raw = a1 + (if (r.nextBoolean()) 1 else -1) *
        (band + r.nextDouble * 20)
      if (a2raw.abs <= 89)
        assert(hav(a1, a2raw, o1, o2) > radius,
          s"r=$radius band=$band a1=$a1 a2=$a2raw")
    }
  }

  test("lon band bound is safe within the latitude limit") {
    val r = rng
    (1 to N).foreach { _ =>
      val radius = 10 + r.nextDouble * 2990
      GridNearestJoin.lonBandDegFor(radius, 60.0).foreach { band =>
        val (a1, a2) = (r.nextDouble * 120 - 60, r.nextDouble * 120 - 60)
        val o1 = r.nextDouble * 358 - 179
        val sep = band + r.nextDouble * (358 - 2 * band).max(0.0)
        if (sep < 360 - band) {
          val o2 = if (o1 + sep <= 180) o1 + sep else o1 - sep
          assert(hav(a1, a2, o1, o2) > radius,
            s"r=$radius band=$band sep=$sep")
        }
      }
    }
  }

  test("spark haversine equals the driver-side twin on generated points") {
    val pts = (1 to 200).map { i =>
      (-89.0 + (i * 37 % 178), -179.0 + (i * 91 % 358),
        -89.0 + (i * 53 % 178), -179.0 + (i * 17 % 358))
    }
    val got = pts.toDF("a1", "o1", "a2", "o2")
      .select(Geo.haversineKmDet($"a1", $"a2", $"o1", $"o2")).as[Double].collect()
    pts.zip(got).foreach { case ((a1, o1, a2, o2), d) =>
      assert(d === hav(a1, a2, o1, o2))
    }
  }

  test("quantized cosine dot stays exact: double sum equals integer sum") {
    val r = rng
    (1 to 200).foreach { _ =>
      val a = List.fill(64)(r.nextFloat * 2 - 1)
      val b = List.fill(64)(r.nextFloat * 2 - 1)
      val qa = a.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      val qb = b.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      assert(math.abs(dot.toDouble) < (1L << 53).toDouble)
      val dblSum = qa.zip(qb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(dblSum === dot.toDouble)
    }
  }

  test("canonicalized radius pairs are unique and unordered-complete") {
    val pts = (1 to 120).map(i =>
      (i.toLong, -60.0 + (i * 67 % 1200) / 10.0, -170.0 + (i * 131 % 3400) / 10.0))
      .toDF("id", "lat", "lon")
    val pairs = GridNearestJoin.radiusPairs(pts, "id", "lat", "lon",
        radiusKm = 2000.0, maxAbsLatDeg = 60.0)
      .select("id", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.distinct.length === pairs.length)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("as-of duality: forward on ts == backward on negated ts") {
    // the two directions are mirror images — running backward over negated
    // timestamps (numeric surrogate, ordering reversed) must reproduce
    // forward exactly, including the left-outer NULLs and inclusive bounds
    import org.apache.spark.sql.functions._
    val r0 = rng
    val l = (1 to 400).map(_ =>
      (r0.nextInt(20).toLong, r0.nextInt(100000).toLong)).zipWithIndex
      .map { case ((k, t), i) => (k, i.toLong, t) }
      .toDF("k", "ev", "t")
    val r = (1 to 80).map(_ =>
      (r0.nextInt(20).toLong, r0.nextInt(100000).toLong,
        r0.nextInt(1000).toDouble)).toDF("k", "t", "v")
      .groupBy("k", "t").agg(max("v").as("v"))
    val fwd = graft.operators.AsOfJoin.forward(l, r, Seq("k"), "t", "t", Seq("v"))
      .select("k", "ev", "asof_v")
    val neg = graft.operators.AsOfJoin.backward(
        l.withColumn("t", -col("t")), r.withColumn("t", -col("t")),
        Seq("k"), "t", "t", Seq("v"))
      .select("k", "ev", "asof_v")
    assert(fwd.exceptAll(neg).isEmpty && neg.exceptAll(fwd).isEmpty)
  }

  test("z-order interleave is a bijection on the cell grid") {
    import org.apache.spark.sql.functions._
    val r0 = rng
    val cells = (1 to N).map(_ =>
      (r0.nextInt(4096).toLong, r0.nextInt(4096).toLong)).distinct
    val zs = cells.toDF("x", "y")
      .select(graft.ext.ZOrder.interleave(col("x"), col("y"), 12))
      .as[Long].collect()
    // injective on distinct inputs, bounded by 2^24, and bit-exactly
    // invertible by de-interleaving driver-side
    assert(zs.distinct.length === cells.length)
    assert(zs.forall(z => z >= 0 && z < (1L << 24)))
    def deinterleave(z: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      for (j <- 0 until 12) {
        x |= ((z >> (2 * j)) & 1L) << j
        y |= ((z >> (2 * j + 1)) & 1L) << j
      }
      (x, y)
    }
    assert(zs.map(deinterleave).toSet === cells.toSet)
  }
}
