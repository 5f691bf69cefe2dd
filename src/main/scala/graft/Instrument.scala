package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Execution-shape counters: how many jobs and stages a block of Spark
  * actions actually submits.
  *
  * Wall time drifts ±20% with machine load (round-5/6 bench protocol
  * notes); submitted-stage counts do not — for a fixed plan, data, and
  * config they are deterministic, so they separate PLAN regressions (stage
  * count moved) from machine noise (only wall time moved). Used two ways:
  *  - `Bench` records {jobs, stages} per query alongside the wall medians
  *    (BENCH_PLANSHAPE.json) so rounds diff mechanically;
  *  - `PlanAuditSpec` pins ≤-bounds for the expensive multi-job queries
  *    (the iterative connected-components chain, the storage pipeline)
  *    whose shape a single `executedPlan` string cannot capture.
  *
  * Stages SUBMITTED are counted — a stage skipped via shuffle/exchange
  * reuse never submits and correctly does not count.
  */
object Instrument {
  final case class Counts(jobs: Int, stages: Int)

  /** Run `thunk`, returning its result plus the jobs/stages the Spark
    * scheduler submitted while it ran. The listener bus is asynchronous, so
    * after the block completes we poll until the counters stop moving
    * (bounded) before detaching. Counting assumes no concurrent Spark
    * actions from other threads — true in Bench and the sequential test
    * JVM.
    */
  def countStages[T](spark: SparkSession)(thunk: => T): (T, Counts) = {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet(); ()
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    val result =
      try thunk
      finally {
        var last = (-1, -1)
        var cur = (jobs.get, stages.get)
        var waitedMs = 0
        while (cur != last && waitedMs < 5000) {
          Thread.sleep(150)
          waitedMs += 150
          last = cur
          cur = (jobs.get, stages.get)
        }
        sc.removeSparkListener(listener)
      }
    (result, Counts(jobs.get, stages.get))
  }
}
