package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Nearest-neighbor (nearest-city) join.
  *
  * The reference implements this as crossJoin + per-coordinate window-min + equality
  * filter (`/root/reference/src/scripts/common_func.py:15-25`). Two variants here:
  *
  *  - [[nearestAllTies]] — the reference's exact shape: keeps *all* rows tied at the
  *    minimum distance and partitions the window by the source (lat, lon) pair.
  *  - [[nearestOne]] — deterministic top-1 per source row: `row_number` over
  *    (distance, tieBreak) == 1, partitioned by a source row key. Preferred: no
  *    duplicate-on-tie, window partitions by a high-cardinality key instead of a
  *    coordinate pair, and the result is reproducible for oracle comparison.
  *
  * Scale notes (100 TB): the dimension side is expected to be small (cities); we
  * `broadcast()` it so the physical plan is a BroadcastNestedLoopJoin — no shuffle of
  * the fact side for the join itself. The blow-up factor is |dim|; the follow-up
  * argmin runs map-side within the window shuffle. For large dimension tables use
  * [[graft.ext.GridNearestJoin]] which buckets both sides into geohash-like grid
  * cells and turns the cross join into an equi-join.
  */
object NearestNeighborJoin {

  /** Reference-parity shape (common_func.py:15-25): all ties kept, helper column
    * `distance` retained, `distance_min` dropped.
    */
  def nearestAllTies(src: DataFrame, geo: DataFrame,
                     srcLat: String, geoLat: String,
                     srcLon: String, geoLon: String): DataFrame = {
    val w = Window.partitionBy(srcLat, srcLon)
    src.crossJoin(broadcast(geo))
      .withColumn("distance", Geo.haversineKm(srcLat, geoLat, srcLon, geoLon))
      .withColumn("distance_min", min("distance").over(w))
      .filter(col("distance") === col("distance_min"))
      .drop("distance_min")
  }


  /** Deterministic nearest-one join: exactly one dim row per source row.
    *
    * @param srcKey   unique key column(s) of the source side (window partition)
    * @param tieBreak deterministic ordering among equidistant dim rows (e.g. city id)
    */
  def nearestOne(src: DataFrame, geo: DataFrame,
                 srcLat: String, geoLat: String,
                 srcLon: String, geoLon: String,
                 srcKey: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    // argmin on the quantized distance, matching GridNearestJoin.nearest —
    // the two operators must pick the same row on near-ties
    val w = Window.partitionBy(srcKey.map(col): _*)
      .orderBy(round(col("distance"), 9).asc +: tieBreak.map(_.asc): _*)
    src.crossJoin(broadcast(geo))
      .withColumn("distance", Geo.haversineKm(srcLat, geoLat, srcLon, geoLon))
      .withColumn("__nn_rank", row_number().over(w))
      .filter(col("__nn_rank") === 1)
      .drop("__nn_rank")
  }
}
