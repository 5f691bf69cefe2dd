package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact dot product of two SPARSE integer vectors, each carried as a pair
  * of parallel `array<bigint>` columns — sorted keys and their values — as
  * a native Catalyst expression: one merge walk over the two key arrays,
  * `Σ va[i]·vb[j]` over key matches, in plain Java `long` math.
  *
  * Why it exists — the tf-vector verify joins ([[graft.ext.Dedup
  * .cosinePairs]], [[graft.ext.Dedup.cosineNearDupsSimhash]]) previously
  * folded one doc's term→tf MAP against the other's
  * (`aggregate(map_entries(a), …, element_at(b, key))`): Spark's
  * `ArrayBasedMapData` lookup is a LINEAR SCAN with per-key string
  * equality, so each candidate pair cost |a|·|b| string compares inside an
  * interpreted fold — measured as the dominant term of the q134 verify at
  * sf1 (124M candidate pairs × ~23² term probes). The merge walk is
  * O(|a|+|b|) long compares, ~40 bytes of bytecode, and stays inside
  * whole-stage codegen (the [[DotLongExpression]] lesson applied to the
  * sparse shape; keys ride as FNV-64 hashes of the terms — the q100
  * 8-byte-key rule — so the walk never touches a string).
  *
  * CONTRACT: each (keys, values) pair comes from one
  * `sort_array(collect_list(struct(k, v)))` over per-doc DISTINCT terms —
  * keys strictly ascending, lengths equal. Key equality means term
  * equality up to FNV-64 collision; a collision would corrupt the dot and
  * hash-fail against the string-keyed oracle, the same guard q100's
  * hashed shingles live under. Null arrays → null; null elements cannot
  * occur by construction (collect_list drops nothing here, struct fields
  * are non-null aggregates).
  */
case class SparseDotLongExpression(first: Expression, second: Expression,
                                   third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (children.forall(c => ok(c.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four array<bigint> inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sparse_dot_long"

  override def nullSafeEval(ka: Any, va: Any, kb: Any, vb: Any): Any =
    SparseDotOps.dot(ka.asInstanceOf[ArrayData], va.asInstanceOf[ArrayData],
      kb.asInstanceOf[ArrayData], vb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ka, va, kb, vb) =>
      s"${ev.value} = graft.plans.SparseDotOps.dot($ka, $va, $kb, $vb);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object SparseDotOps {
  /** Merge walk over two strictly-ascending key arrays; called from
    * generated code — must stay a plain static-shaped method. */
  def dot(ka: ArrayData, va: ArrayData, kb: ArrayData, vb: ArrayData): Long = {
    val n = ka.numElements()
    val m = kb.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < n && j < m) {
      val x = ka.getLong(i)
      val y = kb.getLong(j)
      if (x == y) {
        s += va.getLong(i) * vb.getLong(j)
        i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    s
  }
}

object SparseDotLongExpression {
  /** Column API: Σ va·vb over matching sorted keys. */
  def sparseDot(ka: Column, va: Column, kb: Column, vb: Column): Column =
    ColumnBridge.column(SparseDotLongExpression(
      ColumnBridge.expression(ka), ColumnBridge.expression(va),
      ColumnBridge.expression(kb), ColumnBridge.expression(vb)))
}

/** Driver-collected sparse-vector table in compact CSR-style layout:
  * `ids` sorted ascending, doc i's postings at `keys`/`vals` positions
  * `[offsets(i), offsets(i+1))` (keys ascending within a doc), squared
  * norm in `n2s(i)`. One shared reference object per executor — the
  * q84/q85 collected-model pattern applied to the verify join: when the
  * candidate frame is enormous and the vector table is small (the
  * vocabulary-degenerate regime), verifying per candidate ROW against
  * this table needs no join, no array materialization per row, and no
  * pre-verify distinct.
  */
final class SparseVecModel(val ids: Array[Long], val offsets: Array[Int],
                           val keys: Array[Long], val vals: Array[Long],
                           val n2s: Array[Long]) extends Serializable {

  // open-addressing id index (linear probing, load ≤ 0.5): a binary
  // search over `ids` was measured memory-latency-bound at 124M probes
  // (log₂(50k) dependent misses per lookup); the hash table pays 1-2.
  // Rebuilt lazily after deserialization on each executor. The index is
  // ONE volatile array reference (mask derived as table.length-1) so a
  // racing reader either sees null (and builds/waits under the lock) or
  // a fully-published table — two separate non-volatile fields let a
  // second thread observe table != null with mask still 0.
  @transient @volatile private var table: Array[Int] = _

  private def ensure(): Array[Int] = {
    val t0 = table
    if (t0 != null) return t0
    synchronized {
      val t1 = table
      if (t1 != null) return t1
      var cap = 16
      while (cap < ids.length * 2) cap <<= 1
      val t = new Array[Int](cap)
      val m = cap - 1
      var i = 0
      while (i < ids.length) {
        var h = (ids(i) * -7046029254386353131L >>> 40).toInt & m
        while (t(h) != 0) h = (h + 1) & m
        t(h) = i + 1
        i += 1
      }
      table = t
      t
    }
  }

  private def find(t: Array[Int], id: Long): Int = {
    val mask = t.length - 1
    var h = (id * -7046029254386353131L >>> 40).toInt & mask
    while (t(h) != 0) {
      val idx = t(h) - 1
      if (ids(idx) == id) return idx
      h = (h + 1) & mask
    }
    -1
  }

  /** [dot, n2_a, n2_b] for the pair when den·dot² ≥ num·n2_a·n2_b, else
    * null (also null when either id is absent) — thresholding INSIDE the
    * model means the certificate array allocates only for survivors.
    * Called from generated code — plain static-shaped method. */
  def check(a: Long, b: Long, num: Long,
            den: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val t = ensure()
    val ia = find(t, a)
    val ib = find(t, b)
    if (ia < 0 || ib < 0) return null
    var i = offsets(ia)
    val ie = offsets(ia + 1)
    var j = offsets(ib)
    val je = offsets(ib + 1)
    var s = 0L
    while (i < ie && j < je) {
      val x = keys(i)
      val y = keys(j)
      if (x == y) { s += vals(i) * vals(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (den * s * s < num * n2s(ia) * n2s(ib)) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(s, n2s(ia), n2s(ib)))
  }
}

object SparseVecModel {
  /** Hard in-function ceiling on collected postings (16 B each → ≤ ~128 MB
    * of model arrays) — twice the measured caller gate
    * ([[graft.ext.Dedup.VerifyBroadcastPostings]]), so a caller that skips
    * or mis-sizes its own gate still fails loudly here instead of OOMing
    * the driver with a 100 TB vector table. */
  val MaxCollectedPostings = 8000000L

  /** Collect a (id, __ks, __vs, __n2) frame ([[graft.ext.Dedup]]'s
    * sparseVecs shape) into the compact model. The caller gates the size
    * with a MEASURED posting count (`maxPostings` is that gate, re-checked
    * here); [[MaxCollectedPostings]] is the absolute ceiling enforced
    * regardless of what the caller passes. Both checks run before the
    * model arrays allocate, so misuse throws with the observed count in
    * the message rather than doubling driver memory first. */
  def collect(vecs: org.apache.spark.sql.DataFrame,
              maxPostings: Long = MaxCollectedPostings): SparseVecModel = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, size, sum}
    // Gate BEFORE collecting: the posting count is a distributed aggregate
    // (one tiny extra job), accumulated as Long, so a mis-gated 100 TB
    // table throws here without the driver ever materializing a row. The
    // post-collect require below it would otherwise fire only AFTER the
    // OOM-risk allocation it exists to prevent.
    val bound = math.min(maxPostings, MaxCollectedPostings)
    val nPost = vecs
      .agg(coalesce(sum(size(col(vecs.columns(1)))).cast("long"), lit(0L)))
      .first().getLong(0)
    require(nPost <= bound,
      s"SparseVecModel.collect: $nPost postings exceed the " +
        s"regime bound $bound — this tier is for DEGENERATE (tiny-" +
        "vocabulary) vector tables only; route to the distributed " +
        "merge-dot verify instead (graft.ext.Dedup.verifyCosine)")
    require(nPost <= Int.MaxValue.toLong,
      s"SparseVecModel.collect: $nPost postings exceed array addressing")
    val rows = vecs.collect().sortBy(_.getLong(0))
    val n = rows.length
    val ids = new Array[Long](n)
    val offsets = new Array[Int](n + 1)
    val keys = new Array[Long](nPost.toInt)
    val vals = new Array[Long](nPost.toInt)
    val n2s = new Array[Long](n)
    var p = 0
    var i = 0
    while (i < n) {
      val r = rows(i)
      ids(i) = r.getLong(0)
      n2s(i) = r.getLong(3)
      offsets(i) = p
      val ks = r.getSeq[Long](1)
      val vs = r.getSeq[Long](2)
      var j = 0
      while (j < ks.size) {
        keys(p) = ks(j); vals(p) = vs(j); p += 1; j += 1
      }
      i += 1
    }
    offsets(n) = p
    new SparseVecModel(ids, offsets, keys, vals, n2s)
  }
}

/** `[dot, n2_a, n2_b]` (array<bigint>) of the doc pair `(idA, idB)` looked
  * up in a [[SparseVecModel]] WHEN den·dot² ≥ num·n2_a·n2_b, else null —
  * the zero-join verify: the model compiles into one shared reference
  * object per executor, the pair check is a hash probe + merge walk with
  * no per-row array copies, and the certificate allocates only for pairs
  * that pass the threshold. Null also when either id is missing from the
  * model (cannot happen for candidates derived from the model's own
  * postings; kept defensive).
  */
case class SparseDotLookupExpression(left: Expression, right: Expression,
                                     num: Long, den: Long,
                                     model: SparseVecModel)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sparse_dot_lookup"

  override def nullSafeEval(a: Any, b: Any): Any =
    model.check(a.asInstanceOf[Long], b.asInstanceOf[Long], num, den)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("sparseVecModel", model,
      classOf[SparseVecModel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |${ev.value} = $vref.check($a, $b, ${num}L, ${den}L);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SparseDotLookupExpression {
  /** Column API: [dot, n2_a, n2_b] of (idA, idB) under `model` when
    * den·dot² ≥ num·n2_a·n2_b, else null. */
  def cosineCheck(idA: Column, idB: Column, num: Long, den: Long,
                  model: SparseVecModel): Column =
    ColumnBridge.column(SparseDotLookupExpression(
      ColumnBridge.expression(idA), ColumnBridge.expression(idB),
      num, den, model))
}
