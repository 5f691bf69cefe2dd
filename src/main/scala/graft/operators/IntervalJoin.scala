package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join via bin replication — Spark plans a raw
  * `lo <= p AND p <= hi` theta-join as BroadcastNestedLoopJoin (every point
  * against every interval): O(|P|·|I|) comparisons and a broadcast of one
  * whole side. The binned form replaces that with ONE equi-join:
  *
  *  - every point lands in exactly one bin: `floor(p / binWidth)`;
  *  - every interval is replicated to each bin its span overlaps
  *    (`sequence(floor(lo/w), floor(hi/w))` + explode);
  *  - the equi-join on bin + the residual range predicate yields each
  *    matching (point, interval) pair exactly once — no post-dedup, because
  *    a point exists in a single bin.
  *
  * Scale shape (the 100 TB contract): shuffle keyed on bin, join fan-in
  * bounded by bin population, interval-side blow-up = Σ ceil(span/binWidth),
  * so `binWidth` tunes replication vs selectivity: pick it near the median
  * interval span (replication ≈ 2×) — far smaller wins than the nested-loop
  * alternative whenever |I| exceeds a broadcast. Degenerate giant intervals
  * (span ≫ binWidth) fail fast at `maxBinsPerInterval` instead of silently
  * exploding the replication (or hitting Spark's sequence-length cap with
  * an opaque error): cap them upstream or raise the width/cap. This is the
  * static half of the published IEJoin/bin-join designs; Catalyst's own
  * optimizer never rewrites theta-joins this way.
  */
object IntervalJoin {

  /** Inner-join `points` to `intervals` on `loCol <= pointCol <= hiCol`
    * (closed on both ends). Column sets must be disjoint (checked); all
    * columns of both inputs survive. Rows with NULL point or NULL bounds
    * drop (no range containment is satisfiable), same as the theta-join
    * would. Any interval spanning more than `maxBinsPerInterval` bins
    * raises a runtime error naming the offending span.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    // the internal bin column must not silently shadow (then drop) a real
    // input column — same refusal contract as AsOfJoin's output columns
    for (c <- points.columns ++ intervals.columns)
      require(c != "__bin",
        "inputs must not contain the internal column name __bin")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"point/interval column sets must be disjoint; shared: " +
        shared.toSeq.sorted.mkString(", "))
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    // fail fast WITH the offending values — a span/binWidth mismatch at
    // scale should name itself, not surface as an executor OOM or Spark's
    // generic array-length error deep inside sequence()
    val guardedHiBin = when(hiBin - loBin < lit(maxBinsPerInterval), hiBin)
      .otherwise(raise_error(concat(
        lit("IntervalJoin: interval ["), col(loCol).cast("string"),
        lit(", "), col(hiCol).cast("string"),
        lit(s"] replicates to more than $maxBinsPerInterval bins at " +
          s"binWidth $binWidth; raise binWidth/maxBinsPerInterval or cap " +
          "interval spans upstream"))).cast("long"))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(loBin, guardedHiBin)))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Self interval-OVERLAP pairs per key — the interval×interval twin of
    * [[pointInInterval]] (point containment is the degenerate lo = hi
    * case): all pairs of rows sharing `keyCol` whose closed intervals
    * [lo, hi] overlap (`lo_a <= hi_b AND lo_b <= hi_a`), each pair
    * reported EXACTLY once.
    *
    * Same bin-replication device: every interval lands in each bin its
    * span touches, candidates meet in a (key, bin) equi-join — never the
    * per-key cartesian the raw theta-join plans — and the residual
    * predicate keeps true overlaps. Dedup across bins is positional, not
    * a distinct: an overlapping pair is kept only in the bin containing
    * max(lo_a, lo_b) — a point both intervals cover (it is ≥ both los by
    * construction and ≤ both his by the overlap predicate), so both sides
    * are replicated there, and it names exactly one bin. No post-join
    * `distinct()` shuffle.
    *
    * Scale shape: shuffle keyed on (key, bin); fan-in per bin =
    * co-resident intervals; replication = Σ ceil(span/binWidth) with the
    * same fail-fast `maxBinsPerInterval` guard. Output is canonicalized
    * `idCol` pairs (id_a < id_b — ties on identical ids are the caller's
    * id-uniqueness contract), with both intervals' bounds.
    */
  def overlapPairs(intervals: DataFrame, keyCol: String, idCol: String,
                   loCol: String, hiCol: String, binWidth: Double,
                   maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val guardedHiBin = when(hiBin - loBin < lit(maxBinsPerInterval), hiBin)
      .otherwise(raise_error(concat(
        lit("IntervalJoin: interval ["), col(loCol).cast("string"),
        lit(", "), col(hiCol).cast("string"),
        lit(s"] replicates to more than $maxBinsPerInterval bins at " +
          s"binWidth $binWidth; raise binWidth/maxBinsPerInterval or cap " +
          "interval spans upstream"))).cast("long"))
    val binned = intervals
      .filter(col(loCol) <= col(hiCol))
      .select(col(keyCol).as("__k"), col(idCol).as("__id"),
        col(loCol).as("__lo"), col(hiCol).as("__hi"),
        explode(sequence(loBin, guardedHiBin)).as("__bin"))
    binned.select(col("__k"), col("__bin"), col("__id").as("id_a"),
      col("__lo").as("lo_a"), col("__hi").as("hi_a"))
      .join(binned.select(col("__k"), col("__bin"), col("__id").as("id_b"),
        col("__lo").as("lo_b"), col("__hi").as("hi_b")),
        Seq("__k", "__bin"))
      .filter(col("id_a") < col("id_b") &&
        col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a") &&
        col("__bin") ===
          floor(greatest(col("lo_a"), col("lo_b")) / binWidth).cast("long"))
      .select(col("__k").as(keyCol), col("id_a"), col("id_b"),
        col("lo_a"), col("hi_a"), col("lo_b"), col("hi_b"))
  }
}
