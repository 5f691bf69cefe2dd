package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture allocation across domains under a shared token/doc
  * budget. Companion to the proportional tiers already in the catalog
  * (q82 rebalance, q123 temperature sampling, q126/q129 token mixtures):
  * those allocate `target = B·w/Z` and silently UNDER-FILL when a domain
  * has less material than its share — the shortfall is lost. The
  * max-min fair (water-filling) allocation redistributes it.
  */
object Mixtures {

  /** Max-min fair shares: split `budget` units across domains, each with
    * capacity `cap`, equal shares with caps — the classic water-filling /
    * progressive-filling allocation (max-min fairness): raise one common
    * level until the budget is spent, freezing every domain at its
    * capacity as the level passes it. The result is the unique allocation
    * where no domain can gain without a SMALLER domain losing.
    *
    * Closed form instead of the level iteration: sort domains by
    * (cap, key) ascending. Domain i (1-based, k domains, prefix sum
    * cum(i) = Σ_{j<i} cap_j) SATURATES iff
    *
    *   cap_i · (k − i + 1) ≤ budget − cum(i)
    *
    * — "if every remaining domain got cap_i, the remaining budget would
    * cover it" — and the saturated set is a PREFIX of the sort: if the
    * test fails at i, then for any j > i the left side only grows
    * (cap_j ≥ cap_i while k − j + 1 decreases by exactly the rows whose
    * cap also moved into cum) and the right side only shrinks by
    * caps ≥ cap_i, so it fails at j too (the standard water-filling
    * argument). Unsaturated domains split the residue
    * R = budget − Σ_{saturated} cap equally: floor(R/m) each, with the
    * R mod m remainder going to the FIRST R mod m unsaturated domains in
    * the same (cap, key) order — all integer arithmetic, so the result
    * is deterministic and hash-exact cross-engine, and Σ alloc = budget
    * exactly whenever Σ cap ≥ budget (otherwise every domain saturates
    * and Σ alloc = Σ cap).
    *
    * Scale shape: the input is the per-domain AGGREGATE (|domains| rows —
    * the frame a mixture planner holds, thousands at most), so the two
    * global windows here order domains, never data; the corpus-sized work
    * is whatever aggregation produced `caps`, upstream.
    *
    * Input: (key, cap) — one row per domain, cap ≥ 0 (load-bearing: the
    * multiplication-free saturation test below is only equivalent to
    * c·(k−i+1) ≤ B−cum for non-negative caps).
    * Output: (key, cap, saturated, alloc), alloc ≤ cap.
    */
  def maxMinFairShares(caps: DataFrame, key: String, cap: String,
                       budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val byCap = Window.orderBy(col("__c"), col(key))
    val all = Window.partitionBy()
    val ranked = caps
      .select(col(key), col(cap).cast("long").as("__c"))
      .withColumn("__i", row_number().over(byCap).cast("long"))
      .withColumn("__cum",
        coalesce(sum("__c").over(byCap.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__k", count(lit(1)).over(all).cast("long"))
      // saturation test c·(k−i+1) ≤ B−cum, written multiplication-free
      // (ADVICE r12: c·(k−i+1) can overflow Long for huge caps × many
      // domains and silently flip the decision). For c ≥ 0 and n = k−i+1
      // ≥ 1:  c·n ≤ R  ⟺  R ≥ 0 ∧ c ≤ R div n  — exact under truncating
      // division because both sides are false whenever R < 0.
      .withColumn("saturated",
        expr(s"($budget - __cum) >= 0 AND " +
          s"__c <= ($budget - __cum) div (__k - __i + 1)"))
    val sat = ranked
      .withColumn("__nSat",
        sum(when(col("saturated"), 1L).otherwise(0L)).over(all))
      .withColumn("__satCap",
        coalesce(sum(when(col("saturated"), col("__c"))).over(all), lit(0L)))
    sat
      .withColumn("__R", lit(budget) - col("__satCap"))
      .withColumn("__m", col("__k") - col("__nSat"))
      .withColumn("alloc",
        when(col("saturated"), col("__c"))
          .otherwise(expr("__R div __m") +
            when(col("__i") - col("__nSat") <= expr("__R % __m"), 1L)
              .otherwise(0L)))
      .select(col(key), col("__c").as(cap), col("saturated"), col("alloc"))
  }
}
