package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Fnv1a64Expression.fnv1a64

/** Explicit bloom-filter semi-join pruning: build a compact bitmap of the
  * build side's join keys, broadcast it, and drop probe rows whose key
  * cannot match BEFORE the probe side pays the shuffle.
  *
  * The 100 TB gap this fills: a broadcast-hash join ships the build side's
  * whole ROWS (caps out around tens of MB), while a shuffle join moves the
  * ENTIRE probe side even when 99% of its rows match nothing. The bloom sits
  * between: `m` bits summarize millions of keys (~1.2 MB per 10M keys at
  * k=3), the probe side filters map-side under WholeStageCodegen, and only
  * might-match rows enter the exchange. Spark's own runtime row-level
  * filtering (`InjectRuntimeFilter`) has the same aim but triggers on
  * optimizer heuristics (creation-cost thresholds, one filter per join) and
  * hashes with engine-internal functions; this operator is explicit,
  * deterministic (FNV-1a 64 probes — the repo's portable hash family), and
  * composable anywhere a `DataFrame` flows.
  *
  * Semantics contract: pruning is TRANSPARENT to an equi-join — no false
  * negatives ever (a present key always sets its bits); false positives
  * only let non-matching rows through to the exact join, costing shuffle
  * bytes, never correctness. q78 pins the transparency against a plain-join
  * oracle; `BloomPruneSpec` pins the effectiveness (measured false-positive
  * rate on a planted fixture).
  *
  * Sizing: classic `fp ≈ (1 − e^(−k·n/m))^k` — the defaults (m = 2²⁰ bits =
  * 128 KiB, k = 3) hold fp under 1% to ~87k build keys; size m ~10 bits per
  * build key at k=3 for ~1% at scale.
  */
object BloomPrune {

  /** 2^j masks — constant-folded; element_at replaces the variable-distance
    * shift the Column API lacks. */
  private val pow2: Column = array((0 until 64).map(j => lit(1L << j)): _*)

  /** k bit positions of a key: pmod(fnv(seed, key), m) per seed — the same
    * seed-chained FNV family MinHash uses, so positions are reproducible
    * across runs, engines, and cluster topologies. */
  private def positions(key: Column, numBits: Long, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), s =>
      pmod(fnv1a64(s.cast("long"), key), lit(numBits)))

  /** One-row bloom bitmap (`__bloom`: map<word-index, 64-bit word>) over the
    * build side's non-null keys. Sparse map, not a dense array: only touched
    * words are stored, so a lightly-loaded filter costs |distinct words|
    * entries. One shuffle of |keys|·k (word, mask) pairs, then a singleton
    * aggregate; null keys are skipped (they never match an equi-join).
    */
  def build(keys: DataFrame, key: String, numBits: Long = 1L << 20,
            numHashes: Int = 3): DataFrame = {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
    keys.where(col(key).isNotNull)
      .select(explode(positions(col(key), numBits, numHashes)).as("__pos"))
      .select(shiftright(col("__pos"), 6).as("__word"),
        element_at(pow2, col("__pos").bitwiseAND(lit(63L)).cast("int") + lit(1))
          .as("__mask"))
      .groupBy("__word").agg(bit_or(col("__mask")).as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__word"), col("__bits"))))
        .as("__bloom"))
  }

  /** Keep only probe rows whose key MIGHT be in the build set: all k probe
    * bits set. The bloom row broadcasts (one map, ≤ numBits/64 entries) and
    * the conjunction evaluates map-side in codegen — no shuffle is added,
    * one is shrunk. Rows with a null key are dropped (equi-join semantics).
    */
  def prune(probe: DataFrame, key: String, bloom: DataFrame,
            numBits: Long = 1L << 20, numHashes: Int = 3): DataFrame = {
    val mightMatch = (0 until numHashes).map { s =>
      val pos = pmod(fnv1a64(lit(s.toLong), col(key)), lit(numBits))
      val word = element_at(col("__bloom"), shiftright(pos, 6))
      val mask = element_at(pow2, pos.bitwiseAND(lit(63L)).cast("int") + lit(1))
      word.isNotNull && word.bitwiseAND(mask) === mask
    }.reduce(_ && _)
    probe.crossJoin(broadcast(bloom)).filter(mightMatch).drop("__bloom")
  }
}
