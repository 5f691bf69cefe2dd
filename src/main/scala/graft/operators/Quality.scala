package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality operators (the Deequ-shaped surface a production pipeline
  * runs beside its transforms): snapshot diffing, single-pass column
  * profiling, and declarative constraint checks. All outputs are plain
  * rows (strings/longs) so every one of them oracle-checks cell-exact.
  */
object Quality {

  /** Row-level diff of two snapshots sharing a key column and schema:
    * one row per difference — `op` = 'A' (added in `after`), 'R'
    * (removed), 'C' (changed payload). Unchanged rows emit nothing. The
    * payload comparison is a conjunction of per-column null-safe
    * equalities (`<=>`, SQL `IS NOT DISTINCT FROM`) — no string
    * rendering, no separator, so it is collision-free for ANY payload
    * value (control characters, NULL-lookalike strings, doubles whose
    * text rendering differs across engines), and it matches the exact
    * semantics an independent engine's `IS DISTINCT FROM` uses.
    *
    * Scale shape: one full-outer key-equi join — at 100 TB both sides
    * shuffle once on the key (co-located and exchange-free when both
    * snapshots are bucketed on it, the warehouse posture for nightly
    * reconciliation). Widening the payload widens the shuffled row but
    * adds no exchange; the per-column comparisons stay inside
    * whole-stage codegen.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   key: String): DataFrame = {
    require(before.columns.sameElements(after.columns),
      "snapshots must share a schema")
    val payload = before.columns.filterNot(_ == key).toSeq
    val b = before.select(col(key) +: lit(true).as("__bp") +:
      payload.map(c => col(c).as(s"__b_$c")): _*)
    val a = after.select(col(key) +: lit(true).as("__ap") +:
      payload.map(c => col(c).as(s"__a_$c")): _*)
    val same = payload.map(c => col(s"__b_$c") <=> col(s"__a_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    b.join(a, Seq(key), "full_outer")
      .withColumn("op",
        when(col("__bp").isNull, "A")
          .when(col("__ap").isNull, "R")
          .when(!same, "C"))
      .filter(col("op").isNotNull)
      .select(col(key), col("op"))
  }

  /** Single-pass column profile (the Deequ/Glue-crawler analyzer shape):
    * per column — row count, nulls, approx-free distinct count, min/max
    * as strings. One aggregation computes every analyzer in one scan
    * (the whole point of the analyzer pattern: N profiles, one pass);
    * the per-column rows are unpivoted from that single row, so the plan
    * is one aggregate + a constant-sized projection. min/max leave as
    * strings: numeric columns compare numerically BEFORE the cast, so
    * the string is just the rendering.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Declarative constraint checks, one row per check:
    * (check_name, violations). Provided checks: primary-key uniqueness
    * (rows − distinct keys), referential integrity (child keys without a
    * parent — left anti), and a caller-supplied row predicate (rows
    * violating it). Each check is a count the engine can verify
    * independently; a green run is all-zeros. Checks run as separate
    * small aggregates unioned together — each is one scan + one
    * aggregation, and a failed check's count is exact, not sampled.
    */
  def checks(df: DataFrame, pkCol: String,
             fk: Option[(DataFrame, String, String)],
             predicate: (String, org.apache.spark.sql.Column)): DataFrame = {
    val pkViol = df.agg(
      (count(lit(1)) - countDistinct(col(pkCol))).as("violations"))
      .select(lit("pk_unique").as("check_name"), col("violations"))
    val predViol = df.filter(!predicate._2)
      .agg(count(lit(1)).as("violations"))
      .select(lit(predicate._1).as("check_name"), col("violations"))
    val fkViol = fk.map { case (parent, childKey, parentKey) =>
      df.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
          "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("fk_exists").as("check_name"), col("violations"))
    }
    fkViol.foldLeft(pkViol.unionByName(predViol))(_ unionByName _)
  }

  /** Strictly-below empirical CDF of an integer column, in parts-per-
    * million: `out = (#rows with value < x) · 10⁶ div N` — the percentile
    * rank device WITHOUT the single-partition global window. A
    * `percent_rank() OVER (ORDER BY x)` (no PARTITION BY) drags the whole
    * corpus through one task (the q49 window pathology); here the rank is
    * derived on the VALUE-AGGREGATE frame instead: one groupBy(value)
    * count, one running sum over the distinct values, one value-keyed
    * join back. The windows order the distinct-value frame — bounded by
    * the signal's quantization (≤ 10⁶+1 rows for a micro-ratio, max doc
    * length for a token count), never by the corpus — so the single
    * ordered partition holds the value HISTOGRAM, which is the state a
    * 100 TB percentile pass has to centralize anyway.
    *
    * Strictly-below (not ≤) makes ties rank together at the LOW side —
    * deterministic and engine-portable: it equals
    * `(rank() OVER (ORDER BY x) − 1)·10⁶ div N`, the formulation an
    * independent oracle can run directly. Integer throughout; rows with
    * NULL `value` are the caller's problem (quantized signals here are
    * coalesced upstream) — they would hash-diverge on engines' NULL
    * ordering, so the join simply drops them, loudly shrinking the row
    * count rather than silently mis-ranking.
    */
  def empiricalCdfMicro(df: DataFrame, value: String,
                        out: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(value))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val ranks = df.groupBy(col(value)).agg(count(lit(1)).as("__vn"))
      .withColumn("__below",
        coalesce(sum("__vn").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__N", sum("__vn").over(all))
      .withColumn(out, expr(s"(__below * 1000000) div __N"))
      .select(col(value), col(out))
    df.join(ranks, Seq(value))
  }
}
