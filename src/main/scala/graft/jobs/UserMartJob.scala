package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.NearestNeighborJoin

/** Step 1 — user mart (reference `/root/reference/src/scripts/project_step_1.py`).
  *
  * Input: a reference-shaped `events` table (nested `event` struct, `event_type`,
  * `lat`, `lon`) and a `geo` city dimension (`id`, `city`, `lat`, `lon`).
  * Output: `user_id, local_time, act_city, home_city, travel_count, travel_array`.
  *
  * Semantics preserved deliberately (SURVEY.md §7 "hard parts"):
  *  - argmax/argmin keep all tied rows, then `first()` resolves ties — matching the
  *    reference's nondeterministic tie behavior (project_step_1.py:47,51,81-82);
  *  - `local_time` is hard-coded Australia/Sydney (project_step_1.py:49);
  *  - the home-city rule counts `minDays` consecutive *event* days, not calendar
  *    days (project_step_1.py:56-62).
  *
  * Scale notes: `messageGeo` is cached because three branches fan out of it
  * (project_step_1.py:35); the nearest-city join broadcasts the city dim; every
  * window partitions by `user_id` (high cardinality — no skew hot-spot unless one
  * user dominates, which salting could address without changing results).
  */
object UserMartJob {

  /** Messages with their nearest city (project_step_1.py:19-37).
    *
    * The message projection rides the gated widen (round-16): the nearest
    * join is a broadcast cross join whose ×|cities| fan-out runs INSIDE
    * the message scan's tasks, and in the single-file mid-scale band that
    * scan is one task — measured at sf0.1, q46's head stage was one task
    * writing the full 2.5M-row (msgs × 25 cities) product to the window
    * exchange in 2.7 s while 31 cores idled. One slim exchange of the
    * 5-column message rows buys full-width fan-out; the plan-estimate
    * gate keeps sf0.001/0.01 on the plain scan and passes anything past
    * 1 GiB through untouched (a real events lake scans wide on its own).
    */
  def messageGeo(events: DataFrame, geo: DataFrame): DataFrame = {
    val base = events
      .filter(col("event_type") === "message")
      .select(
        col("event.message_from").as("user_id"),
        col("event.message_id"),
        coalesce(col("event.message_ts"), col("event.datetime"))
          .cast("timestamp").as("datetime"),
        col("lat").as("lat_message"),
        col("lon").as("lon_message"))
    val msgs = graft.sources.Tables.wide(base,
      minBytes = 1L << 20, hashKey = "message_id")
    // Decide on the DISTINCT coordinate set, attach by equi-join (round-16,
    // guide §8 "decide with small rows"): the nearest city is a pure
    // function of the point, yet the reference shape crossed EVERY message
    // with the dim and shuffled the |msgs|×|cities| product into the
    // (lat, lon) window — at sf0.1 that 2.5M-row exchange + window were
    // q46's two hottest stages (17.8 + 9.7 CPU-s). The argmin now runs
    // over the distinct points (the cross join, haversine, and window see
    // |points| rows); one join replicates the winners back. Row-identical
    // BY KEY ALGEBRA: ties survive (same point → same tied city set,
    // UserMartSpec pins the tie/null fixture row-equal to the reference
    // shape), null-coordinate rows drop exactly as before (the reference
    // filter's `null === null` is false; an inner join on a null key
    // matches nothing), and -0.0/NaN normalize identically in the window
    // exchange and the join key. The distinct reads the UNWIDENED slim
    // projection — the points side must not replay the widen exchange
    // (the round-12 lesson), and the same trade rules out this device
    // where src is a join pipeline: wiring it under the q49/q148
    // candidate stream re-ran the whole pair generator (+28 jobs at the
    // PlanAuditSpec scale) and was reverted — the marts' projected scans
    // re-evaluate as one cheap scan.
    val zoneOf = NearestNeighborJoin
      .nearestAllTies(
        base.select(col("lat_message"), col("lon_message")).distinct(),
        geo, "lat_message", "lat", "lon_message", "lon")
    msgs.join(zoneOf, Seq("lat_message", "lon_message"))
      .drop("lat_message", "lon_message", "lat", "lon")
  }

  /** Latest message's city + local time per user (project_step_1.py:40-54).
    *
    * `perCityTz = false` is the reference as shipped: local time hard-coded
    * Australia/Sydney. `perCityTz = true` is the reference's own commented
    * intent one line below (project_step_1.py:52 — per-city local time):
    * the zone comes from the geo dimension's `timezone` column, which
    * [[messageGeo]] carries through the nearest join like any other dim
    * attribute. One behavioral consequence worth naming: a user whose
    * last-instant messages TIE across cities in different zones groups
    * into one row per distinct local_time (the reference's
    * groupBy(user, local_time) retained verbatim) — unreachable on the
    * fixture, where city separation forbids ties.
    */
  def lastGeo(messageGeo: DataFrame, perCityTz: Boolean = false): DataFrame = {
    val w = Window.partitionBy("user_id")
    val cols = if (perCityTz) Seq("user_id", "datetime", "city", "timezone")
               else Seq("user_id", "datetime", "city")
    messageGeo
      .select(cols.map(col): _*)
      .withColumn("dt_max", max("datetime").over(w))
      .filter(col("datetime") === col("dt_max"))
      .drop("dt_max")
      .withColumn("local_time",
        if (perCityTz) from_utc_timestamp(col("datetime"), col("timezone"))
        else from_utc_timestamp(col("datetime"), "Australia/Sydney"))
      .drop("datetime", "timezone")
      .groupBy("user_id", "local_time")
      .agg(first("city").as("act_city"))
  }

  /** Home city: latest run of >= minDays consecutive event-days in one city
    * (project_step_1.py:56-85 — the gaps-and-islands query).
    */
  def homeGeo(messageGeo: DataFrame, minDays: Int = 27): DataFrame = {
    val wDense = Window.partitionBy("user_id").orderBy(col("date").desc)
    val wCity  = Window.partitionBy("user_id", "city").orderBy(col("date").desc)
    val wUser  = Window.partitionBy("user_id")
    messageGeo
      .select(col("user_id"), col("datetime").cast("date").as("date"), col("city"))
      .distinct()
      .withColumn("dense_rank", dense_rank().over(wDense))
      .withColumn("lag_dense_rank", lag("dense_rank", 1, 0).over(wCity))
      .filter(col("dense_rank") === col("lag_dense_rank") + lit(1))
      .withColumn("row_number", row_number().over(wCity))
      .withColumn("diff", col("dense_rank") - col("row_number"))
      .groupBy("user_id", "city", "diff")
      .agg(max("date").as("date"), count(lit(1)).as("count"))
      .filter(col("count") >= lit(minDays))
      .withColumn("max_dt", max("date").over(wUser))
      .filter(col("date") === col("max_dt"))
      .groupBy("user_id")
      .agg(first("city").as("home_city"))
  }

  /** Ordered list of visited cities, home city excluded (project_step_1.py:87-105).
    *
    * `strictOrder = false` reproduces the reference exactly: `collect_list`
    * ordering is inherited from the upstream exchange, which is only stable
    * on a single partition (SURVEY.md §7). With `strictOrder = true` the
    * route is rebuilt from (datetime, city) structs sorted inside the
    * aggregation — deterministic on any cluster, same elements.
    */
  def travel(messageGeo: DataFrame, homeCity: DataFrame,
             strictOrder: Boolean = false): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("datetime"), col("city"))
    val stops = messageGeo
      .select("user_id", "datetime", "city")
      .distinct()
      .withColumn("lag_city", lag("city", 1).over(w))
      .filter(col("city") =!= col("lag_city") || col("lag_city").isNull)
      .join(homeCity.withColumnRenamed("home_city", "city"),
        Seq("user_id", "city"), "left_anti")
    if (strictOrder)
      stops
        .groupBy("user_id")
        .agg(count("city").as("travel_count"),
          org.apache.spark.sql.functions.transform(
            array_sort(collect_list(struct(col("datetime"), col("city")))),
            s => s.getField("city")).as("travel_array"))
    else
      stops
        .groupBy("user_id")
        .agg(count("city").as("travel_count"),
          collect_list("city").as("travel_array"))
  }

  /** Reassemble the three branches (project_step_1.py:107-112). */
  def userMart(last: DataFrame, home: DataFrame, travel: DataFrame): DataFrame =
    last.join(home, Seq("user_id"), "left").join(travel, Seq("user_id"), "left")

  /** Full step-1 transform. `strictOrder` follows [[travel]]: false is the
    * reference's exchange-inherited `collect_list` order, true rebuilds the
    * route deterministically (required when the output is oracle-compared).
    * `perCityLocalTime` follows [[lastGeo]]: true requires a `timezone`
    * column on `geo` and emits each user's local time in their act city's
    * zone instead of the reference's hard-coded Sydney.
    */
  def transform(events: DataFrame, geo: DataFrame, minDays: Int = 27,
                strictOrder: Boolean = false,
                perCityLocalTime: Boolean = false): DataFrame = {
    val mg = messageGeo(events, geo).cache() // 3 branches fan out (ref :35)
    val home = homeGeo(mg, minDays).cache() // reused by travel + final join (ref :83)
    userMart(lastGeo(mg, perCityLocalTime), home,
      travel(mg, home, strictOrder))
  }

  /** CLI parity with project_step_1.py:114-140: events geo out. */
  def main(args: Array[String]): Unit = {
    val Array(eventsPath, geoPath, outPath) = args.take(3)
    val spark = JobSession.create("graft step_1 user_mart")
    val out = transform(
      spark.read.parquet(eventsPath), spark.read.parquet(geoPath))
    out.write.mode("overwrite").parquet(outPath)
    spark.stop()
  }
}
