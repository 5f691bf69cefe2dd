package graft.plans

import java.nio.ByteBuffer
import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** The k smallest DISTINCT hash values in UNSIGNED order — the KMV
  * (k-minimum-values) cardinality sketch state. Internally values are kept
  * sign-bit-flipped (`h ^ Long.MinValue`), so SIGNED array order equals
  * unsigned order of the original hashes; a sorted array + binary search
  * gives O(log k) dup checks and O(k) bounded inserts (k is small by
  * construction).
  *
  * Unlike Misra–Gries counters, this state is fully ORDER-INDEPENDENT: the
  * k smallest of a set do not depend on arrival or merge order, so the
  * whole sketch — not just a derived answer — is deterministic and
  * cross-engine checkable.
  */
final class KmvBuffer(val k: Int) {
  val arr = new Array[Long](k) // flipped values, ascending
  var size = 0

  def add(h: Long): Unit = {
    val f = h ^ Long.MinValue
    val pos = Arrays.binarySearch(arr, 0, size, f)
    if (pos >= 0) return // already present
    val ins = -pos - 1
    if (size < k) {
      System.arraycopy(arr, ins, arr, ins + 1, size - ins)
      arr(ins) = f
      size += 1
    } else if (ins < k) {
      System.arraycopy(arr, ins, arr, ins + 1, k - ins - 1)
      arr(ins) = f
    }
  }

  def mergeFrom(o: KmvBuffer): Unit = {
    var i = 0
    while (i < o.size) { add(o.arr(i) ^ Long.MinValue); i += 1 }
  }

  /** original (signed) hashes, ascending in unsigned order */
  def sortedHashes(): Array[Long] =
    Array.tabulate(size)(i => arr(i) ^ Long.MinValue)
}

/** `graft_kmv(hash, k)` — the k smallest distinct hashes per group as
  * `array<long>` in unsigned-ascending order: the KMV distinct-count
  * sketch (Bar-Yossef et al.) over a caller-chosen hash column.
  *
  * This is the PORTABLE approximate-distinct beside q66's
  * `approx_count_distinct`: HLL registers are engine-specific (q66 is the
  * catalog's one rows-only row by construction), but the k smallest FNV
  * hashes of a set are a deterministic, order-independent VALUE — DuckDB
  * re-derives the identical array in HUGEINT SQL, so the sketch itself is
  * hash-exact cross-engine, and the estimator `(k−1)·2⁶⁴ / (u_k + 1)`
  * (u_k = k-th minimum, unsigned) is plain IEEE arithmetic on it (q97).
  *
  * Scale shape: partial-mergeable with O(k) state — k longs per group per
  * map task cross the exchange, vs the full per-key shuffle of
  * `countDistinct`. NULL hashes are skipped.
  */
case class KmvBottomKAggregate(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv wants (bigint, k > 0), got (${child.dataType}, $k)")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: KmvBuffer): Any =
    new GenericArrayData(b.sortedHashes())

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvBuffer(k)
    var i = 0
    while (i < n) { b.arr(i) = bb.getLong; i += 1 }
    b.size = n
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvBottomKAggregate =
    copy(child = newChild)
}

object KmvBottomKAggregate {
  /** DataFrame-API entry point: the k smallest distinct values of a
    * LongType hash column, unsigned-ascending (see q97 for the estimator).
    */
  def kmv(hash: Column, k: Int): Column =
    ColumnBridge.column(KmvBottomKAggregate(
      ColumnBridge.expression(hash), k).toAggregateExpression())
}
