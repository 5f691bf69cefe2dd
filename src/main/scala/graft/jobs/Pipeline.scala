package graft.jobs

import org.apache.spark.sql.SparkSession

/** Sequential replacement for the reference's Airflow DAG
  * (`/root/reference/src/dags/project_dag.py:29-69`): step1 -> step2 -> step3.
  *
  * One SparkSession runs the whole chain ([[run]]); the per-job `main`s keep
  * CLI parity with the reference's three spark-submit tasks but each tears
  * down its own session, so chaining them in-JVM would rebuild the context
  * twice — [[main]] here calls the transforms directly instead.
  */
object Pipeline {

  /** Run all three marts inside the caller's session.
    * args order mirrors the DAG: events geo outBase date maxDistanceKm.
    */
  def run(spark: SparkSession, eventsPath: String, geoPath: String,
          outBase: String, date: String, maxDistanceKm: Double): Unit = {
    val events = spark.read.parquet(eventsPath)
    val geo = spark.read.parquet(geoPath)
    UserMartJob.transform(events, geo)
      .write.mode("overwrite").parquet(s"$outBase/user_mart")
    ZoneMartJob.transform(events, geo)
      .write.mode("overwrite").parquet(s"$outBase/zone_mart")
    // date slice read by partition path, as the reference does (:13-16)
    val eventsAtDate = spark.read.parquet(s"$eventsPath/date=$date")
    RecommendationJob.transform(events, eventsAtDate, geo, date, maxDistanceKm)
      .write.mode("overwrite").parquet(s"$outBase/recommendations")
  }

  def main(args: Array[String]): Unit = {
    val Array(eventsPath, geoPath, outBase, date, maxDistance) = args.take(5)
    val spark = JobSession.create("graft pipeline")
    run(spark, eventsPath, geoPath, outBase, date, maxDistance.toDouble)
    spark.stop()
  }
}
