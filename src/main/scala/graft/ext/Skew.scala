package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the failure mode of `groupBy`/`join` at
  * 100 TB when one key (a mega-channel, a null-ish default coordinate)
  * collects a large share of rows and pins a single reducer.
  *
  * AQE's skew-join splitting handles the join case at runtime; these helpers
  * cover what AQE does not: skewed *aggregations* (salted two-phase) and
  * broadcast-threshold-exceeding skewed joins (hot-key replication). Both
  * are pure DataFrame rewrites with unchanged semantics.
  */
object Skew {

  /** Two-phase aggregation for additive aggregates over skewed keys:
    * partial-aggregate on (keys, salt) — spreading each hot key over
    * `saltBuckets` reducers — then final-aggregate on the keys.
    *
    * @param partial per-bucket aggregates, e.g. `Seq(sum("x").as("x"))`
    * @param merge   how to merge buckets, e.g. `Seq(sum("x").as("x"))` —
    *                must be the additive counterpart of `partial`
    *                (count → sum, sum → sum, min → min, max → max)
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skewed equi-join: replicate the (small) right side `saltBuckets` times
    * and scatter left rows across the replicas, so a hot key's rows land on
    * `saltBuckets` reducers instead of one. Inner/left semantics preserved;
    * right side grows by the salt factor — keep it the dimension side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // replicating the right side is only semantics-preserving when unmatched
    // RIGHT rows never surface — a right/full join would emit each of them
    // saltBuckets times
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves semantics only for inner/left-family joins, " +
        s"got $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt", joinType).drop("__salt")
  }
}
