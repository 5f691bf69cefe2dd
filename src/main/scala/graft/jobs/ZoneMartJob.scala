package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.NearestNeighborJoin

/** Step 2 — zone mart (reference `/root/reference/src/scripts/project_step_2.py`).
  *
  * Event counts by type, pivoted into week_* / month_* columns per city ("zone")
  * per ISO week and per month.
  *
  * The key manual optimization preserved from the reference (SURVEY.md §4): events
  * are pre-aggregated to (week, month, event_type, lat, lon) *before* the expensive
  * nearest-city join (project_step_2.py:54 "предрасчет") — at 100 TB that turns the
  * cross-join input from billions of events into the number of distinct coordinates.
  */
object ZoneMartJob {

  /** Last message's coordinates per sender (project_step_2.py:18-33). */
  def lastMessage(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("datetime").desc)
    events
      .filter(col("event_type") === "message")
      .select(
        col("event.message_from").as("user_id"),
        coalesce(col("event.datetime"), col("event.message_ts")).as("datetime"),
        col("lat").as("lat_last_msg"),
        col("lon").as("lon_last_msg"))
      .withColumn("row_number", row_number().over(w))
      .filter(col("row_number") === lit(1))
      .drop("datetime", "row_number")
  }

  /** Fill missing coordinates from the last message, then pre-aggregate
    * (project_step_2.py:37-57). The inner join deliberately drops users with no
    * messages — reference quirk (c) in SURVEY.md §7.
    */
  def eventsWithGeo(events: DataFrame, lastMsg: DataFrame): DataFrame =
    events
      .select(
        coalesce(col("event.message_from"), col("event.reaction_from"),
          col("event.user")).as("user_id"),
        coalesce(col("event.datetime"), col("event.message_ts")).as("datetime"),
        col("event_type"), col("lat"), col("lon"))
      .join(lastMsg, Seq("user_id"), "inner")
      .select(
        col("user_id"),
        month(col("datetime")).as("month"),
        weekofyear(col("datetime")).as("week"),
        col("event_type"),
        coalesce(col("lat"), col("lat_last_msg")).as("lat_def"),
        coalesce(col("lon"), col("lon_last_msg")).as("lon_def"))
      .groupBy("week", "month", "event_type", "lat_def", "lon_def")
      .count()

  /** Nearest city per pre-aggregated coordinate (project_step_2.py:60-75). */
  def eventsWithZone(geo: DataFrame, withGeo: DataFrame): DataFrame = {
    val cities = geo.select(col("id").as("city_id"), col("lat"), col("lon"))
    NearestNeighborJoin
      .nearestAllTies(withGeo, cities, "lat_def", "lat", "lon_def", "lon")
      .select(col("week"), col("month"), col("event_type"),
        col("count").as("events_count"), col("city_id"))
  }

  /** Week/month pivots joined back to the distinct (month, week, city) grain
    * (project_step_2.py:79-100). Pivot value lists are pinned to skip the
    * distinct-discovery scan.
    */
  def eventsCountPeriod(withZone: DataFrame,
                        eventTypes: Seq[String] =
                          Seq("message", "reaction", "subscription", "registration"))
  : DataFrame = {
    val week = withZone
      .groupBy("week", "city_id", "event_type")
      .agg(sum("events_count").as("week_count"))
      .groupBy("week", "city_id")
      .pivot("event_type", eventTypes)
      .agg(sum("week_count"))
      .withColumnRenamed("message", "week_message")
      .withColumnRenamed("reaction", "week_reaction")
      .withColumnRenamed("subscription", "week_subscription")
      .withColumnRenamed("registration", "week_user")
    val monthDf = withZone
      .groupBy("month", "city_id", "event_type")
      .agg(sum("events_count").as("month_count"))
      .groupBy("month", "city_id")
      .pivot("event_type", eventTypes)
      .agg(sum("month_count"))
      .withColumnRenamed("message", "month_message")
      .withColumnRenamed("reaction", "month_reaction")
      .withColumnRenamed("subscription", "month_subscription")
      .withColumnRenamed("registration", "month_user")
    // weeks can span months: anchor on the observed (month, week, city) triples
    withZone.select("month", "week", "city_id").distinct()
      .join(week, Seq("week", "city_id"), "left")
      .join(monthDf, Seq("month", "city_id"), "left")
  }

  def transform(events: DataFrame, geo: DataFrame): DataFrame = {
    val withGeo = eventsWithGeo(events, lastMessage(events)).cache() // ref :55
    eventsCountPeriod(eventsWithZone(geo, withGeo))
  }

  /** CLI parity with project_step_2.py:103-127: events geo out. */
  def main(args: Array[String]): Unit = {
    val Array(eventsPath, geoPath, outPath) = args.take(3)
    val spark = JobSession.create("graft step_2 zone_mart")
    transform(spark.read.parquet(eventsPath), spark.read.parquet(geoPath))
      .write.mode("overwrite").parquet(outPath)
    spark.stop()
  }
}
