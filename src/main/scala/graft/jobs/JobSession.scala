package graft.jobs

import org.apache.spark.sql.SparkSession

/** Session factory shared by the job mains.
  *
  * The reference pins YARN + 3g/2-core executors (project_step_1.py:119-124); here
  * the master comes from the environment/spark-submit so the same jar runs on a real
  * cluster or local[N]. AQE is left on: it handles join-strategy switches, skew
  * splitting and shuffle-partition coalescing at run time, which is exactly what a
  * 100 TB run needs and costs nothing at test scale.
  */
object JobSession {
  def create(appName: String, defaultShufflePartitions: String = "32"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (!sys.props.contains("spark.master") && sys.env.get("MASTER").isEmpty)
      b.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultShufflePartitions))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
