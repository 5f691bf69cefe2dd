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
}
