package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k state: the k best (score, id) pairs seen so far, kept in a
  * binary MIN-heap keyed by "worst first" so an incoming row replaces the
  * root in O(log k) when it beats it. "Better" = higher score, ties broken
  * by LOWER id — total order, so results are deterministic under any
  * partitioning/merge order.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a is strictly worse than b */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); scores(i) = scores(m); scores(m) = ts
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  def add(s: Double, id: Long): Unit = {
    if (size < k) {
      // grow phase: append then sift up
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); scores(i) = scores(p); scores(p) = ts
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        } else return
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  /** best-first (score desc, id asc). Sorts a COPY — the heap arrays are
    * left untouched, because eval() may run repeatedly against a LIVE
    * buffer (running window frames call update+eval per row), and an
    * in-place heap-sort-then-restore-size would leave duplicated worst
    * elements behind for every subsequent update/eval.
    */
  def sortedPairs(): Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    // same total order as `worse`: higher score first, ties to lower id
    out.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
  }
}

/** `graft_topk_by(score, id, k)` — the k highest-scoring (score, id) pairs
  * per group as `array<struct<score double, id bigint>>`, best first, ties
  * on score broken by lower id.
  *
  * This is the scale-correct replacement for the `row_number() OVER
  * (PARTITION BY g ORDER BY s DESC) <= k` idiom: the window form shuffles
  * and sorts EVERY row of every group; this aggregate is partial-mergeable
  * (`TypedImperativeAggregate`), so each map task ships at most k pairs per
  * group it saw — at 100 TB the exchange carries k·|groups| rows instead of
  * the whole table, and no per-group sort of the full data ever happens.
  * State is O(k) with O(log k) updates (bounded min-heap), serialized as
  * 4 + 16k bytes between partial and final aggregation.
  *
  * NULL score or id rows are skipped (same as the window idiom, where NULLS
  * LAST puts them beyond any finite k).
  */
case class TopKByAggregate(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "graft_topk_by"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_by wants (double, bigint, k > 0), " +
        s"got (${left.dataType}, ${right.dataType}, $k)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.size) { b.add(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedPairs().map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.add(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByAggregate =
    copy(left = newLeft, right = newRight)
}

object TopKByAggregate {
  /** DataFrame-API entry point: top `k` (score, id) pairs per group. */
  def topkBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByAggregate(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
