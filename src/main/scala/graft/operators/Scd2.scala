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

  /** Fold a NEW change batch into an EXISTING SCD2 dimension without
    * re-reading unaffected history — the daily-update shape
    * ([[graft.operators.ConnectedComponents.merge]]'s posture applied to
    * dimensions): cost is |batch| plus the affected keys' dimension rows;
    * every other dimension row passes through untouched on the
    * anti-join side.
    *
    * Mechanics: each affected key's OPEN row re-enters the gaps-and-
    * islands pass as an anchor event carrying its version number; batch
    * events chain after it under the same (t, tieCol) total order, the
    * same null-safe no-change collapse applies (a batch event repeating
    * the current value opens NO version — the first thing naive
    * implementations get wrong), the anchor's `valid_to` closes onto the
    * first kept batch event, and versions continue from the anchor's.
    * Batch keys absent from the dimension open version 1.
    *
    * CONTRACT (append-only, STRICT): every batch event's `t` must be
    * strictly GREATER than its key's open `valid_from`. An older event
    * would need to SPLIT closed history — a rebuild, not a merge — and
    * an EXACT-tie event (t == open valid_from) is excluded too: the
    * anchor re-enters the order via the `__anchor DESC` leg (the
    * dimension does not carry the original tie value), so an exact-t
    * batch event with a smaller tie value would order after the anchor
    * here but before the underlying event in a from-scratch [[build]],
    * and merge ≠ rebuild. There is no cheap runtime check (it would cost
    * a per-key max join), so the contract lives here like the
    * cross-frame id-disjointness contract on `Dedup.crossJaccardPairs`.
    * The spec pins merge == from-scratch [[build]] on a strictly
    * time-split stream, and the q139 oracle re-derives the FULL rebuild
    * independently.
    *
    * `dim` is a [[build]] output (key, v, valid_from, valid_to, version);
    * `batch` carries (key, t, v, tieCol).
    */
  def merge(dim: DataFrame, batch: DataFrame, tieCol: String): DataFrame = {
    val keys = batch.select("key").distinct()
    val untouched = dim.join(keys, Seq("key"), "left_anti")
    val affected = dim.join(keys, Seq("key"), "left_semi")
    val closed = affected.filter(col("valid_to").isNotNull)
    val anchor = affected.filter(col("valid_to").isNull)
      .select(col("key"), col("v"), col("valid_from").as("t"),
        col("version").as("__v0"), lit(1).as("__anchor"))
    val stream = batch
      .select(col("key"), col("t"), col("v"), lit(null).cast("long")
        .as("__v0"), lit(0).as("__anchor"), col(tieCol).as("__tie"))
      // the anchor's NullType __tie coerces to the batch tie's type; one
      // anchor per key, so it never needs the tie-break itself
      .unionByName(anchor.withColumn("__tie", lit(null)),
        allowMissingColumns = false)
    // anchors sort first: their t precedes the batch under the contract,
    // and the __anchor DESC leg settles exact-t ties deterministically
    val byKey = Window.partitionBy("key")
      .orderBy(col("t"), col("__anchor").desc, col("__tie"))
    val kept = stream
      .withColumn("__prev", lag(col("v"), 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
      .filter(col("__rn") === 1 || !(col("v") <=> col("__prev")))
    val byKeyKept = Window.partitionBy("key")
      .orderBy(col("t"), col("__anchor").desc, col("__tie"))
    val rebuilt = kept
      .withColumn("valid_to", lead(col("t"), 1).over(byKeyKept))
      .withColumn("version",
        coalesce(max(when(col("__anchor") === 1, col("__v0")))
          .over(Window.partitionBy("key")), lit(1L)) +
          row_number().over(byKeyKept) - lit(1L))
      .select(col("key"), col("v"), col("t").as("valid_from"),
        col("valid_to"), col("version"))
    untouched.unionByName(closed).unionByName(rebuilt)
  }
}
