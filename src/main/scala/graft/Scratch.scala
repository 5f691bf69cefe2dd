package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // mirror PlanAuditSpec's session (local[4], 4 shuffle partitions) to
    // measure execution-shape counts for new contract pins
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    names.foreach { name =>
      spark.catalog.clearCache()
      graft.ext.Caches.releaseAll()
      val fn = SparkEntry.queries(name)
      val (_, c) = Instrument.countStages(spark) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      println(s"[scratch] $name: ${c.jobs} jobs / ${c.stages} stages")
    }
    spark.stop()
  }
}
