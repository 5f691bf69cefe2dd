package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: co-locate rows that are close in TWO
  * dimensions so parquet min/max statistics prune files and row groups for
  * predicates on EITHER dimension — the layout trick behind lakehouse
  * `OPTIMIZE ZORDER BY`.
  *
  * Why not just sort: a lat-sorted table stores full-longitude stripes, so
  * a longitude-selective scan still reads EVERY file; partitioning by both
  * dims explodes the partition count at fine granularity. Interleaving the
  * quantized bits of both dims into one sort key keeps each file's
  * (lat, lon) bounding box compact, so min/max skipping works on both
  * columns at once from a single one-dimensional sort — no new operator at
  * read time, no partition explosion, and the written files stay plain
  * parquet readable by anything.
  *
  * At 100 TB this is a WRITE-side investment (one range-partitioned sort)
  * that every subsequent selective read amortizes; `ZOrderSpec` measures the
  * effect directly (files whose stats-box intersects a box query: z-order
  * beats a single-dim sort on the dimension the sort neglects), and q79
  * pins that the layout is semantically invisible — a box aggregate over
  * the clustered-and-reread table must equal the plain computation.
  */
object ZOrder {

  /** `v` in [lo, hi] → `bits`-bit cell index, clamped at the domain edges
    * (out-of-range rows land in the boundary cells rather than corrupting
    * the curve). Plain IEEE floor arithmetic — deterministic everywhere.
    */
  def quantizeDim(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val cells = (1L << bits).toDouble
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((v - lit(lo)) / lit(hi - lo) * lit(cells)).cast("long")))
  }

  /** Interleave the low `bits` of two cell indices: x occupies even bit
    * positions, y odd — the Morton z-value. Unrolled shift/mask terms stay
    * inside WholeStageCodegen; 2·bits ≤ 62 keeps the sum overflow-free.
    */
  def interleave(xq: Column, yq: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { j =>
      shiftright(xq, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
        shiftright(yq, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  /** z-value for a (lat, lon) pair on the standard geo domain */
  def zValue(lat: Column, lon: Column, bits: Int = 12): Column =
    interleave(quantizeDim(lat, -90.0, 90.0, bits),
      quantizeDim(lon, -180.0, 180.0, bits), bits)

  /** Cluster-write: range-partition into `numFiles` z-ranges, sort each by
    * z, write plain parquet. Range partitioning samples the z distribution,
    * so skewed data still yields balanced files; the sort key is an
    * expression — nothing extra is stored in the files.
    */
  def writeClustered(df: DataFrame, z: Column, numFiles: Int,
                     path: String): Unit =
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
}
