package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable FNV-1a 64 hash as a native Catalyst expression.
  *
  * Why not `xxhash64`: it has no DuckDB twin, so any operator keyed on it
  * (MinHash signatures, SimHash fingerprints) can only be rows-checked by the
  * correctness harness, never hash-checked. FNV-1a is four lines of integer
  * arithmetic — spelled identically here (Java `long` wrap-around) and in
  * DuckDB SQL ([[Fnv1a64Expression.stringSqlText]] — HUGEINT mod 2⁶⁴), both
  * engines produce bit-identical signatures and the whole dedup family
  * becomes oracle-checkable.
  *
  * Why a native expression and not `Column` arithmetic: Spark 4 runs ANSI
  * mode by default, where the wrap-around multiply FNV depends on throws
  * `ARITHMETIC_OVERFLOW`. Inside an expression the fold is plain Java
  * `long` math (two's-complement wrap ≡ mod 2⁶⁴), stays in WholeStageCodegen,
  * and needs no ANSI exemption.
  *
  * Fold semantics (state starts at the FNV offset basis):
  *  - string child: per Unicode code point `h = (h ^ cp) * prime` — for
  *    ASCII this matches the standard byte-oriented FNV-1a test vectors,
  *    and DuckDB's `ascii(s[i])` sees the same code points;
  *  - long/int child: 8 little-endian bytes `h = (h ^ byte_k) * prime`.
  * Children fold left-to-right, so `fnv(litLong, baseHash)` is the k-member
  * hash family used by MinHash. Any null child → null.
  */
case class Fnv1a64Expression(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(c => !Seq(StringType, LongType, IntegerType).contains(c.dataType))
      .map(c => TypeCheckResult.TypeCheckFailure(
        s"$prettyName accepts string/long/int children, got ${c.dataType.catalogString}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv1a64"

  override def eval(input: InternalRow): Any = {
    var h = Fnv1a64Ops.Offset
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      h = children(i).dataType match {
        case StringType => Fnv1a64Ops.hashString(h, v.asInstanceOf[UTF8String])
        case LongType   => Fnv1a64Ops.hashLong(h, v.asInstanceOf[Long])
        case IntegerType => Fnv1a64Ops.hashLong(h, v.asInstanceOf[Int].toLong)
      }
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.freshName("fnvH")
    val ops = "graft.plans.Fnv1a64Ops"
    val folds = children.map { c =>
      val g = c.genCode(ctx)
      val step = c.dataType match {
        case StringType => s"$h = $ops.hashString($h, ${g.value});"
        case _          => s"$h = $ops.hashLong($h, (long) ${g.value});"
      }
      s"""
         |if (!${ev.isNull}) {
         |  ${g.code}
         |  if (${g.isNull}) { ${ev.isNull} = true; } else { $step }
         |}
         |""".stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      |boolean ${ev.isNull} = false;
      |long $h = ${Fnv1a64Ops.Offset}L;
      |$folds
      |long ${ev.value} = $h;
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** The fold kernels, Java-static so generated code can call them directly. */
object Fnv1a64Ops {
  /** FNV-1a 64 offset basis 14695981039346656037 (as a signed long). */
  final val Offset = 0xcbf29ce484222325L
  /** FNV-1a 64 prime 1099511628211. */
  final val Prime = 0x100000001b3L

  /** Folds the string's Unicode code points, decoding UTF-8 directly from
    * the UTF8String's bytes — no java.lang.String materialization in what
    * is the hottest expression of the dedup family (millions of shingles
    * per scale factor). Spark strings are valid UTF-8 by construction, so
    * the 1-4-byte sequence decode below is total; output is identical to a
    * `String.codePointAt` walk (surrogate pairs decode to the same code
    * point), which Fnv1a64Spec pins against the published vectors and
    * non-ASCII cases.
    */
  def hashString(h0: Long, s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = h0
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      if (b0 < 0x80) {
        cp = b0; i += 1
      } else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F); i += 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); i += 4
      }
      h = (h ^ cp) * Prime
    }
    h
  }

  def hashLong(h0: Long, v: Long): Long = {
    var h = h0
    var k = 0
    while (k < 8) {
      h = (h ^ ((v >>> (8 * k)) & 0xFFL)) * Prime
      k += 1
    }
    h
  }
}

object Fnv1a64Expression {
  /** DataFrame-API entry point: `fnv1a64(cols…)` folds all children. */
  def fnv1a64(cols: Column*): Column =
    ColumnBridge.column(Fnv1a64Expression(cols.map(ColumnBridge.expression)))

  private val Mod64 = "18446744073709551616::HUGEINT"
  private val PrimeSql = s"${Fnv1a64Ops.Prime}::HUGEINT"

  /** DuckDB SQL computing [[Fnv1a64Ops.hashString]] from the offset basis
    * over a string expression, as a HUGEINT in [0, 2⁶⁴). Same device as
    * `Geo.haversineSqlText`: the arithmetic is spelled once per engine,
    * identically.
    *
    * The lambda variables are deliberately obscure: a plain `i` here once
    * shadowed an outer query's `i` column referenced inside `expr`, silently
    * hashing a per-character-moving substring. Prefer passing a simple
    * column reference as `expr`; never pass an expression that reads
    * columns named like the lambda variables below.
    */
  def stringSqlText(expr: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |  list_transform(range(1, length($expr) + 1),
       |                 __fnv_i -> ascii($expr[__fnv_i])::HUGEINT)),
       |  (__fnv_h, __fnv_c) ->
       |    (xor(__fnv_h, __fnv_c) * $PrimeSql) % $Mod64)""".stripMargin

  /** DuckDB SQL folding the 8 little-endian bytes of `vExpr` (HUGEINT in
    * [0, 2⁶⁴)) into state `hExpr` — [[Fnv1a64Ops.hashLong]].
    */
  def longSqlText(hExpr: String, vExpr: String): String =
    (0 until 8).foldLeft(hExpr) { (h, k) =>
      s"((xor($h, ($vExpr >> ${8 * k}) & 255::HUGEINT) * $PrimeSql) % $Mod64)"
    }

  /** DuckDB SQL reinterpreting an unsigned HUGEINT in [0, 2⁶⁴) as the signed
    * BIGINT Spark's LongType holds — required before any cross-engine `min`
    * or output compare (unsigned and two's-complement orderings differ).
    */
  def toSignedSqlText(hExpr: String): String =
    s"""CAST(CASE WHEN ($hExpr) >= 9223372036854775808::HUGEINT
       |  THEN ($hExpr) - $Mod64 ELSE ($hExpr) END AS BIGINT)""".stripMargin
}
