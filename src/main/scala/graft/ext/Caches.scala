package graft.ext

import org.apache.spark.sql.DataFrame

/** Registry of frames operators pin with `.cache()` mid-plan — currently
  * the per-ring argmins of [[GridNearestJoin.nearest]] ([[Dedup]] measured
  * pinning slower than recompute and deliberately registers nothing).
  *
  * Long-lived sessions call [[releaseAll]] once a returned frame has been
  * materialized — `graft.Verify` does this after each query; `graft.Bench`
  * additionally clears the whole session cache between timed runs
  * (cold-cache timing), which also drops these entries.
  */
object Caches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df`, register it for later release, and return it. */
  def pin(df: DataFrame): DataFrame = {
    val cached = df.cache()
    live.add(cached)
    cached
  }

  /** Unpersist every frame pinned by prior operator calls. Safe to call at
    * any time; frames not yet materialized just recompute.
    */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) { df.unpersist(); df = live.poll() }
  }

  /** Release the storage blocks behind a `localCheckpoint`-ed frame
    * (ADVICE r11: iterative peel/star loops otherwise hold rounds×chains
    * superseded edge snapshots until the ContextCleaner's next GC-driven
    * sweep). DANGER: a local checkpoint is NON-RECOMPUTABLE — its lineage
    * is truncated — so callers must release only frames they created and
    * fully consumed inside the same loop (never an input, never the frame
    * they return). No-op on frames that are not checkpoint-backed (the
    * pattern match falls through), so loop-entry frames derived lazily
    * from an input are safe to pass.
    */
  // Spark WARNs on every unpersist of a localCheckpointed RDD ("lineage
  // has been truncated and cannot be recomputed") — here that is the
  // POINT: the frame is provably dead, and ~1 warning per peel/star round
  // would drown real warnings in every bench log. Demote that one logger
  // once; best-effort (a log4j-less classpath just keeps the noise).
  private lazy val silenceCheckpointWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        silenceCheckpointWarn
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
