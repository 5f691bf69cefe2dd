package graft.jobs

/** Sequential replacement for the reference's Airflow DAG
  * (`/root/reference/src/dags/project_dag.py:29-69`): step1 -> step2 -> step3.
  *
  * args: eventsPath geoPath outBase date maxDistanceKm
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val Array(eventsPath, geoPath, outBase, date, maxDistance) = args.take(5)
    UserMartJob.main(Array(eventsPath, geoPath, s"$outBase/user_mart"))
    ZoneMartJob.main(Array(eventsPath, geoPath, s"$outBase/zone_mart"))
    RecommendationJob.main(Array(date, maxDistance, eventsPath, geoPath,
      s"$outBase/recommendations"))
  }
}
