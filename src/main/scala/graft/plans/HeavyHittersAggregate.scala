package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Misra–Gries summary: at most k (value, counter) pairs. The classic
  * guarantee (and the reason the candidate set is usable at all): every
  * value with true frequency > n/(k+1) is GUARANTEED present in the summary
  * regardless of arrival order, and merging summaries preserves the bound
  * over the combined stream (Agarwal et al., "Mergeable Summaries", PODS
  * 2012 — merge = add counters pairwise, then subtract the (k+1)-th largest
  * counter from all and drop the non-positive). Counter VALUES are
  * order-dependent; only the superset property is contractual, which is why
  * [[HeavyHittersAggregate]] callers must re-count candidates exactly.
  */
final class MgBuffer(val k: Int) {
  val counts = new scala.collection.mutable.LongMap[Long](k * 2)

  def add(v: Long): Unit = {
    val cur = counts.getOrElse(v, 0L)
    if (cur > 0L) counts(v) = cur + 1L
    else if (counts.size < k) counts(v) = 1L
    else {
      // full and unseen: decrement everything, drop zeros (classic MG)
      val dead = scala.collection.mutable.ArrayBuffer[Long]()
      counts.foreachEntry { (key, c) =>
        if (c == 1L) dead += key else counts(key) = c - 1L
      }
      dead.foreach(counts.remove)
    }
  }

  /** Weighted add — the mergeable-summaries rule applied to a singleton:
    * add the whole weight, and if the table now exceeds k, subtract the
    * minimum counter (the (k+1)-th largest of k+1) from all and drop the
    * non-positive. Error grows only by the subtracted amount, so every
    * value with total weight > W/(k+1) still survives any order — the
    * same bound as unit updates, with W the total weight instead of n.
    */
  def addWeighted(v: Long, w: Long): Unit = {
    if (w <= 0L) return
    counts(v) = counts.getOrElse(v, 0L) + w
    if (counts.size > k) {
      var d = Long.MaxValue
      counts.foreachEntry { (_, c) => if (c < d) d = c }
      val dead = scala.collection.mutable.ArrayBuffer[Long]()
      counts.foreachEntry { (key, c) =>
        if (c - d <= 0L) dead += key else counts(key) = c - d
      }
      dead.foreach(counts.remove)
    }
  }

  def mergeFrom(o: MgBuffer): Unit = {
    o.counts.foreachEntry { (v, c) => counts(v) = counts.getOrElse(v, 0L) + c }
    if (counts.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val d = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      val dead = scala.collection.mutable.ArrayBuffer[Long]()
      counts.foreachEntry { (key, c) =>
        if (c - d <= 0L) dead += key else counts(key) = c - d
      }
      dead.foreach(counts.remove)
    }
  }

  /** (value, counter) pairs, counter desc then value asc — a total order,
    * so serialization and eval are deterministic GIVEN the buffer state
    * (the state itself is order-dependent; see class doc). */
  def sortedEntries(): Array[(Long, Long)] =
    counts.toArray.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
}

/** `graft_heavy_hitters(value, k)` — a Misra–Gries candidate summary of the
  * values with frequency > n/(k+1), as `array<struct<value bigint, mgcount
  * bigint>>` (counter desc, value asc).
  *
  * This is the two-phase heavy-hitters shape for 100 TB: the aggregate is
  * partial-mergeable with O(k) state, so each map task ships ≤ k counters —
  * the exchange carries k·P rows where a plain `groupBy(value).count()`
  * would shuffle every distinct value. The summary is CANDIDATES ONLY
  * (superset of the true heavy set, counters are lower-bound-ish
  * estimates): callers semi-join it back and re-count exactly, after which
  * the sketch is invisible — the final result provably equals the plain
  * GROUP BY / HAVING answer whenever the threshold exceeds n/(k+1), which
  * is what makes the composed query DuckDB-oracle-able (q93) even though
  * the sketch state itself is order-dependent.
  *
  * NULL values are skipped.
  */
case class HeavyHittersAggregate(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters wants (bigint, k > 0), got (${child.dataType}, $k)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("mgcount", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: MgBuffer): Any =
    new GenericArrayData(b.sortedEntries().map { case (v, c) =>
      InternalRow(v, c)
    }.asInstanceOf[Array[Any]])

  override def serialize(b: MgBuffer): Array[Byte] = {
    val entries = b.sortedEntries()
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new MgBuffer(k)
    var i = 0
    while (i < n) { val v = bb.getLong; val c = bb.getLong; b.counts(v) = c; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAggregate =
    copy(child = newChild)
}

/** `graft_heavy_hitters_w(value, weight, k)` — the WEIGHTED twin of
  * [[HeavyHittersAggregate]]: candidates for the values whose total weight
  * exceeds W/(k+1) (W = summed weight). Same candidates-only contract,
  * same exact-recount composition (q96 weighs sources by token mass);
  * non-positive and NULL weights are skipped.
  */
case class WeightedHeavyHittersAggregate(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "graft_heavy_hitters_w"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters_w wants (bigint, bigint, k > 0), " +
        s"got (${left.dataType}, ${right.dataType}, $k)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("mgweight", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null)
      b.addWeighted(v.asInstanceOf[Long], w.asInstanceOf[Long])
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: MgBuffer): Any =
    new GenericArrayData(b.sortedEntries().map { case (v, c) =>
      InternalRow(v, c)
    }.asInstanceOf[Array[Any]])

  override def serialize(b: MgBuffer): Array[Byte] = {
    val entries = b.sortedEntries()
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new MgBuffer(k)
    var i = 0
    while (i < n) { val v = bb.getLong; val c = bb.getLong; b.counts(v) = c; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedHeavyHittersAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedHeavyHittersAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedHeavyHittersAggregate =
    copy(left = newLeft, right = newRight)
}

object HeavyHittersAggregate {
  /** DataFrame-API entry point: MG candidate summary of `value` with k
    * counters. Pair with an exact re-count of the candidates (see q93). */
  def heavyHitters(value: Column, k: Int): Column =
    ColumnBridge.column(HeavyHittersAggregate(
      ColumnBridge.expression(value), k).toAggregateExpression())

  /** Weighted variant: candidates for total `weight` mass > W/(k+1). */
  def heavyHittersW(value: Column, weight: Column, k: Int): Column =
    ColumnBridge.column(WeightedHeavyHittersAggregate(
      ColumnBridge.expression(value), ColumnBridge.expression(weight), k)
      .toAggregateExpression())
}
