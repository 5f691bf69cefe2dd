package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE apply (the Debezium-compaction / Delta-MERGE batch
  * semantics): fold a change feed of upserts and deletes into a target
  * snapshot. Per key, the change with the HIGHEST `seq` wins (ties broken
  * by preferring the delete — a tie means the feed emitted two ops at one
  * sequence point and a tombstone must not resurrect); an upsert replaces
  * the whole row whether or not the key existed (insert = upsert on a new
  * key), a delete tombstones it.
  *
  * result = target ⟕̸ change-keys  ∪  latest-changes[op ≠ D]
  *
  * Scale shape: one window over the change feed (key-partitioned, picks
  * the winning change), one left-anti join (key-equi, broadcastable when
  * the batch is small — the daily-ingestion case), one union. The target
  * is never shuffled beyond the anti join; at 100 TB with a bucketed
  * target the anti join co-locates and the apply is exchange-free on the
  * big side.
  *
  * `changes` columns: `key`, `seq` (long), `op` ('U' or 'D'), plus the
  * full payload columns of `target` (ignored on 'D' rows). `target`
  * columns: `key` + payload.
  */
object CdcApply {

  def run(target: DataFrame, changes: DataFrame): DataFrame = {
    val payload = target.columns.filterNot(_ == "key").toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry the target payload columns ${payload.mkString(",")}")
    // winning change per key: highest seq, delete beats upsert on a tie
    val byKey = Window.partitionBy("key")
      .orderBy(col("seq").desc, when(col("op") === "D", 0).otherwise(1))
    val latest = changes
      .withColumn("__rn", row_number().over(byKey))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = target.join(latest.select("key"), Seq("key"), "left_anti")
    survivors.unionByName(
      latest.filter(col("op") =!= "D")
        .select("key", payload: _*))
  }
}
