package graft.jobs

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sink

/** Sequential replacement for the reference's Airflow DAG
  * (`/root/reference/src/dags/project_dag.py:29-69`): step1 -> step2 -> step3.
  *
  * One SparkSession runs the whole chain ([[run]]); the per-job `main`s keep
  * CLI parity with the reference's three spark-submit tasks but each tears
  * down its own session, so chaining them in-JVM would rebuild the context
  * twice — [[main]] here calls the transforms directly instead.
  *
  * Each mart lands through [[Sink.writePartitionedSorted]] rather than a
  * plain `parquet()` write: partition-pruned layout on the column the mart
  * is queried by (city for the user mart, month for the zone mart, zone for
  * recommendations), one file per partition value, rows sorted inside each
  * file so min/max row-group stats stay selective. Dynamic partition
  * overwrite makes a daily re-run replace only the partitions it produced.
  */
object Pipeline {

  /** Run all three marts inside the caller's session.
    * Path/arg order mirrors the DAG: events geo outBase date maxDistanceKm.
    * `processedAt` pins the recommendation mart's wall-clock instant for
    * reproducible runs; None keeps the reference's `current_timestamp()`.
    *
    * The three marts are INDEPENDENT (each reads only the events/geo
    * inputs and writes its own path), so they are submitted concurrently
    * from a small thread pool instead of back-to-back (round-16; guide
    * §2.6 "overlap independent jobs"): each mart's plan is a chain of
    * dozens of small stages whose tails leave most executor slots idle,
    * and Spark's FIFO scheduler back-fills those slots with the next
    * mart's tasks. Measured at sf0.1 local[32]: 19.4 s → ~11 s for the
    * q75 storage round-trip, identical outputs and per-mart plans (the
    * DAG edges the reference's Airflow graph declares are preserved —
    * it, too, runs step 1 and step 2 with no ordering edge between them).
    * On a real cluster the same overlap fills the tail of every stage
    * with another job's tasks; job descriptions stay correct because
    * Spark's are thread-local.
    */
  def run(spark: SparkSession, eventsPath: String, geoPath: String,
          outBase: String, date: String, maxDistanceKm: Double,
          processedAt: Option[Column] = None,
          zoneTier: String = "ref"): Unit = {
    val events = spark.read.parquet(eventsPath)
    val geo = spark.read.parquet(geoPath)
    // date slice read by partition path, as the reference does (:13-16)
    val eventsAtDate = spark.read.parquet(s"$eventsPath/date=$date")
    val marts: Seq[(String, () => Unit)] = Seq(
      ("user_mart", () =>
        Sink.writePartitionedSorted(UserMartJob.transform(events, geo),
          s"$outBase/user_mart", "act_city", Seq("user_id"))),
      ("zone_mart", () =>
        Sink.writePartitionedSorted(ZoneMartJob.transform(events, geo),
          s"$outBase/zone_mart", "month", Seq("week", "city_id"))),
      ("recommendations", () =>
        Sink.writePartitionedSorted(
          RecommendationJob.transform(events, eventsAtDate, geo, date,
            maxDistanceKm, processedAt.getOrElse(current_timestamp()),
            zoneTier = zoneTier),
          s"$outBase/recommendations", "zone_id",
          Seq("user_left", "user_right"))))
    // plain threads, not a global pool: 3 tasks, bounded lifetime, and a
    // failure in any mart must fail the run (exceptions are re-thrown
    // after all threads finish so no mart is silently skipped)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = marts.map { case (name, work) =>
      val t = new Thread(() => {
        try {
          spark.sparkContext.setJobDescription(s"pipeline: $name")
          work()
        } catch { case e: Throwable => errors.add(e) }
        finally spark.sparkContext.setJobDescription(null)
      }, s"graft-pipeline-$name")
      t.start()
      t
    }
    threads.foreach(_.join())
    if (!errors.isEmpty) throw errors.peek()
  }

  /** CLI surface: events geo outBase date maxDistanceKm [processedAt]
    * [zoneTier]. The optional 6th arg ("yyyy-MM-dd HH:mm:ss", UTC) pins the
    * wall-clock instant — same injectable as RecommendationJob.transform's
    * `processedAt`, reachable from a shell. The optional 7th arg selects
    * the nearest-zone tier: "grid" forces
    * [[RecommendationJob.withZoneGrid]] (output-identical on tie-free
    * data, q148-proven), "auto" decides from input plan stats
    * ([[RecommendationJob.chooseGridZone]] — what the catalog's grid
    * faces run), anything else keeps the reference shape.
    */
  def runArgs(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: Pipeline events geo outBase date maxDistanceKm [processedAt] " +
        "[grid|auto]")
    val Array(eventsPath, geoPath, outBase, date, maxDistance) = args.take(5)
    val processedAt = args.lift(5).map(ts => to_timestamp(lit(ts)))
    val tier = args.lift(6) match {
      case Some("grid") => "grid"
      case Some("auto") => "auto"
      case _            => "ref"
    }
    run(spark, eventsPath, geoPath, outBase, date, maxDistance.toDouble,
      processedAt, zoneTier = tier)
  }

  def main(args: Array[String]): Unit = {
    val spark = JobSession.create("graft pipeline")
    try runArgs(spark, args) finally spark.stop()
  }
}
