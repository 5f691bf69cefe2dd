package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side layout control — the sink half of the 100 TB contract the read
  * side already assumes (partition-pruned scans S3/q45 prune `date=` dirs;
  * min/max row-group stats only skip if files are sorted).
  *
  * The naive `df.write.partitionBy(p)` makes EVERY task open a writer for
  * every partition value it sees: T tasks × P values → up to T·P small
  * files, the classic lake-rot failure mode. Repartitioning on the
  * partition column first sends each value to one task (one file per
  * value); `filesPerPartition > 1` splits hot partitions by a stable hash
  * of the sort keys so a skewed date still parallelizes without reverting
  * to T·P files.
  */
object Sink {

  /** Partition-pruned + stats-friendly parquet lake:
    * `path/partitionCol=value/part-*.parquet`, each file internally sorted
    * by `sortCols` (writers keep the sort through the parquet row groups,
    * so readers filtering on a sort column skip row groups via min/max).
    *
    * One shuffle total — the repartition; `sortWithinPartitions` sorts the
    * already-shuffled partitions in place, and the writer opens at most
    * `filesPerPartition` files per partition value.
    */
  def writePartitionedSorted(df: DataFrame, path: String,
                             partitionCol: String, sortCols: Seq[String],
                             filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val keyed =
      if (filesPerPartition == 1) df.repartition(col(partitionCol))
      else df.repartition(col(partitionCol),
        pmod(hash(sortCols.map(col): _*), lit(filesPerPartition)))
    keyed
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write.partitionBy(partitionCol)
      // dynamic: overwrite ONLY the partition values present in df. The
      // default (static) mode truncates the whole `path` first — a daily
      // incremental writer would destroy every prior day's partition.
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)
  }
}
