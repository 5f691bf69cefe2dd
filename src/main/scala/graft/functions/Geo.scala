package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic column expressions.
  *
  * Semantics follow the reference's haversine (`/root/reference/src/scripts/
  * common_func.py:4-13`): R = 6371 km, deg->rad via 3.1415926535/180, the
  * 2*R*asin(sqrt(...)) form. Pure built-in Catalyst expressions — codegen'd,
  * no UDF, so the whole computation stays inside WholeStageCodegen.
  */
object Geo {

  /** reference constant, common_func.py:6 — kept bit-identical for parity */
  val DegToRad: Double = 3.1415926535 / 180
  val EarthRadiusKm: Double = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2), degrees. */
  def haversineKm(lat1: Column, lat2: Column, lon1: Column, lon2: Column): Column = {
    val k = lit(DegToRad)
    lit(2) * lit(EarthRadiusKm) * asin(sqrt(
      pow(sin((lat1 - lat2) * k / lit(2)), lit(2)) +
        cos(lat1 * k) * cos(lat2 * k) *
          pow(sin((lon1 - lon2) * k / lit(2)), lit(2))
    ))
  }

  def haversineKm(lat1: String, lat2: String, lon1: String, lon2: String): Column =
    haversineKm(col(lat1), col(lat2), col(lon1), col(lon2))

  /** Cross-engine-deterministic haversine: same math as [[haversineKm]] but
    * squares via self-multiplication (IEEE-exact) instead of `pow`, so a
    * DuckDB oracle evaluating [[haversineSqlText]] computes bit-for-bit the
    * same double apart from ≤1-ulp libm-vs-JVM differences in sin/cos/asin —
    * absorbed by rounding any emitted distance.
    */
  def haversineKmDet(lat1: Column, lat2: Column, lon1: Column, lon2: Column): Column = {
    val k = lit(DegToRad)
    val sLat = sin((lat1 - lat2) * k / lit(2))
    val sLon = sin((lon1 - lon2) * k / lit(2))
    lit(2) * lit(EarthRadiusKm) * asin(sqrt(
      sLat * sLat + cos(lat1 * k) * cos(lat2 * k) * sLon * sLon))
  }

  /** DuckDB SQL text computing exactly [[haversineKmDet]] over the given
    * column expressions (operation order and constants kept identical).
    */
  def haversineSqlText(lat1: String, lat2: String, lon1: String, lon2: String): String = {
    val k = f"CAST($DegToRad%.17g AS DOUBLE)" // 17 sig digits round-trip the double
    val sLat = s"sin((($lat1)-($lat2))*$k/2)"
    val sLon = s"sin((($lon1)-($lon2))*$k/2)"
    s"2*$EarthRadiusKm*asin(sqrt($sLat*$sLat + cos(($lat1)*$k)*cos(($lat2)*$k)*$sLon*$sLon))"
  }
}
