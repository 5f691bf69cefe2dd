package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // mirror PlanAuditSpec's session (local[4], 4 shuffle partitions) to
    // measure execution-shape counts for new contract pins;
    // SPARK_GRAFT_SCRATCH_CPUS overrides to mirror the Bench session
    val cpus = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    // SPARK_GRAFT_SCRATCH_JOBS=1: also print each job's callsite line —
    // attributes a +1-job plan growth to the operator that submitted it
    val verbose = sys.env.get("SPARK_GRAFT_SCRATCH_JOBS").contains("1")
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (verbose) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val d = Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(Option(j.properties)
                .flatMap(p => Option(p.getProperty("callSite.short"))))
              .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
            jobLog.add(s"job ${j.jobId} (${j.stageIds.size} stages): $d")
            ()
          }
        })
    }
    names.foreach { name =>
      spark.catalog.clearCache()
      graft.ext.Caches.releaseAll()
      jobLog.clear()
      val fn = SparkEntry.queries(name)
      val (_, c) = Instrument.countStages(spark) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      println(s"[scratch] $name: ${c.jobs} jobs / ${c.stages} stages")
      if (verbose) jobLog.forEach(l => println(s"[scratch]   $l"))
    }
    spark.stop()
  }
}
