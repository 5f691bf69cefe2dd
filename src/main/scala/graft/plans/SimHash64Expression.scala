package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array in ONE pass.
  *
  * [[graft.ext.Dedup.simHash64]] computes the same fingerprint with built-ins
  * by exploding tokens and aggregating 64 conditional sums — correct, but it
  * shuffles |tokens| rows per document and the aggregate carries 64 buffer
  * slots. This expression folds the whole computation into a per-row scalar
  * (no explode, no shuffle, stays inside WholeStageCodegen), the
  * "custom Expression beats composition" case reserved for operators the
  * built-ins can't express efficiently.
  *
  * Bit semantics are identical to the aggregation form: token hash is
  * xxhash64 (seed 42, same as `functions.xxhash64`), bit b of the result is
  * set iff the count of set bits at position b across tokens exceeds half.
  *
  * With `portable = true` the token hash is code-point FNV-1a 64
  * ([[Fnv1a64Ops.hashString]]) instead — bit-identical to the DuckDB SQL of
  * [[Fnv1a64Expression.stringSqlText]], which is what lets the SimHash
  * near-dup catalog query carry a full hash-checked oracle.
  */
case class SimHash64Expression(child: Expression, portable: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h =
          if (portable) Fnv1a64Ops.hashString(Fnv1a64Ops.Offset, arr.getUTF8String(i))
          else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          sums(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sums = ctx.freshName("sums")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      val hashCall =
        if (portable)
          s"graft.plans.Fnv1a64Ops.hashString(${Fnv1a64Ops.Offset}L, $c.getUTF8String($i))"
        else
          s"org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($c.getUTF8String($i), 42L)"
      s"""
         |int[] $sums = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $hashCall;
         |    for (int $b = 0; $b < 64; $b++) {
         |      $sums[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($sums[$b] > 0) $fp |= 1L << $b;
         |}
         |${ev.value} = $fp;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expression {
  /** DataFrame-API entry point: `simhash64(tokensArrayColumn)`. */
  def simhash64(tokens: Column, portable: Boolean = false): Column =
    ColumnBridge.column(
      SimHash64Expression(ColumnBridge.expression(tokens), portable))
}

/** Session extension registering `graft_simhash64` for SQL callers:
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.simhashFunction)
}

object GraftExtensions {
  private val simhashFunction = (
    new FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64Expression].getName, "graft_simhash64"),
    (args: Seq[Expression]) => SimHash64Expression(args.head): Expression)

  private val fnvFunction = (
    new FunctionIdentifier("graft_fnv1a64"),
    new ExpressionInfo(classOf[Fnv1a64Expression].getName, "graft_fnv1a64"),
    (args: Seq[Expression]) => Fnv1a64Expression(args): Expression)

  private val topkFunction = (
    new FunctionIdentifier("graft_topk_by"),
    new ExpressionInfo(classOf[TopKByAggregate].getName, "graft_topk_by"),
    (args: Seq[Expression]) => {
      // analysis errors, not builder crashes: a SQL caller writing
      // graft_topk_by(s, i, 5) gets an IntegerType literal, but 5::BIGINT,
      // CAST(5 AS INT), or 2+3 are equally legitimate SQL — accept any
      // FOLDABLE integral k and raise AnalysisException otherwise so the
      // error carries the SQL position instead of an internal stack
      def analysisError(msg: String): Nothing =
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
      if (args.length != 3) analysisError("graft_topk_by(score, id, k)")
      val kExpr = args(2)
      val k: Int =
        if (!kExpr.foldable)
          analysisError(s"graft_topk_by k must be a constant, got $kExpr")
        else kExpr.eval() match {
          case i: Int => i
          case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => analysisError(
            s"graft_topk_by k must be an integral constant, got $other")
        }
      if (k < 1) analysisError(s"graft_topk_by k must be >= 1, got $k")
      TopKByAggregate(args(0), args(1), k).toAggregateExpression(): Expression
    })

  private val heavyHittersFunction = (
    new FunctionIdentifier("graft_heavy_hitters"),
    new ExpressionInfo(classOf[HeavyHittersAggregate].getName,
      "graft_heavy_hitters"),
    (args: Seq[Expression]) => {
      if (args.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" -> "graft_heavy_hitters(value, k)"))
      HeavyHittersAggregate(args(0),
        foldableK("graft_heavy_hitters", args(1)))
        .toAggregateExpression(): Expression
    })

  /** shared foldable-integral-k extraction for the sketch aggregates */
  private def foldableK(name: String, kExpr: Expression): Int = {
    def analysisError(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
    val k: Int =
      if (!kExpr.foldable)
        analysisError(s"$name k must be a constant, got $kExpr")
      else kExpr.eval() match {
        case i: Int => i
        case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => analysisError(
          s"$name k must be an integral constant, got $other")
      }
    if (k < 1) analysisError(s"$name k must be >= 1, got $k")
    k
  }

  private val weightedHhFunction = (
    new FunctionIdentifier("graft_heavy_hitters_w"),
    new ExpressionInfo(classOf[WeightedHeavyHittersAggregate].getName,
      "graft_heavy_hitters_w"),
    (args: Seq[Expression]) => {
      if (args.length != 3)
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" -> "graft_heavy_hitters_w(value, weight, k)"))
      WeightedHeavyHittersAggregate(args(0), args(1),
        foldableK("graft_heavy_hitters_w", args(2)))
        .toAggregateExpression(): Expression
    })

  private val kmvFunction = (
    new FunctionIdentifier("graft_kmv"),
    new ExpressionInfo(classOf[KmvBottomKAggregate].getName, "graft_kmv"),
    (args: Seq[Expression]) => {
      if (args.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" -> "graft_kmv(hash, k)"))
      KmvBottomKAggregate(args(0), foldableK("graft_kmv", args(1)))
        .toAggregateExpression(): Expression
    })

  /** Register every graft SQL function (`graft_simhash64`, `graft_fnv1a64`,
    * `graft_topk_by`, `graft_heavy_hitters`, `graft_heavy_hitters_w`,
    * `graft_kmv`) on an already-running session — the
    * SparkSessionExtensions surface that makes the native expressions
    * reachable from `spark.sql(...)` text, not just the Column API.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(simhashFunction, fnvFunction, topkFunction, heavyHittersFunction,
      weightedHhFunction, kmvFunction)
      .foreach { f =>
        ColumnBridge.registerFunction(spark, f._1, f._2, f._3)
      }
}
