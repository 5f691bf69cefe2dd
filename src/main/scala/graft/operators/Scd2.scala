package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build: turn a change-event stream
  * (key, t, value) into versioned dimension rows
  * (key, value, valid_from, valid_to, version) with half-open validity
  * `[valid_from, valid_to)` and NULL `valid_to` on the current version —
  * the warehouse posture for "what was this attribute worth at time T".
  * The query-side twin is [[AsOfJoin]]: an SCD2 lookup at time T is
  * exactly a backward as-of join against `valid_from`, so the two
  * operators share one semantic contract from opposite directions.
  *
  * True SCD2 collapses no-change events: an event whose value equals the
  * key's previous value opens no new version (the version count tracks
  * CHANGES, not events). Events are ordered by `(t, tieCol)` — the
  * explicit tie column makes the order total, so the build is
  * deterministic under any partitioning even when timestamps collide.
  *
  * Scale shape: two windows and both partition by `key` — one exchange,
  * bounded per-key state (Spark's window buffers one key's rows), no
  * global sort. At 100 TB the dimension build shuffles each key's change
  * stream once; version chains are per-key and typically short.
  */
object Scd2 {

  /** `ev` columns: `key`, `t` (epoch-µs long), `v` (the tracked value),
    * plus `tieCol` for total ordering. Returns
    * (key, v, valid_from, valid_to, version).
    */
  def build(ev: DataFrame, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy("key").orderBy(col("t"), col(tieCol))
    val changes = ev
      .withColumn("__prev", lag(col("v"), 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
      // a key's first event always opens version 1 — the explicit rn = 1
      // arm matters when that first value is NULL, where the null-safe
      // inequality alone (NULL <=> NULL) would drop it; later events open
      // a version iff the value changed, null-safely in both directions
      .filter(col("__rn") === 1 || !(col("v") <=> col("__prev")))
    val byKeyKept = Window.partitionBy("key").orderBy(col("t"), col(tieCol))
    changes
      .withColumn("valid_to", lead(col("t"), 1).over(byKeyKept))
      .withColumn("version", row_number().over(byKeyKept).cast("long"))
      .select(col("key"), col("v"), col("t").as("valid_from"),
        col("valid_to"), col("version"))
  }
}
