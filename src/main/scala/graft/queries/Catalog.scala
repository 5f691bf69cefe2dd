package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named set of driver-checkable queries.
  *
  * Every entry in [[queries]] is a pure `(SparkSession, sfDir) => DataFrame`
  * over the synthetic tables in `sfDir` (see /root/repo/TESTDATA.md). Entries
  * present in [[oracles]] additionally carry ANSI SQL that DuckDB evaluates
  * against the same parquet files; the driver hash-compares both results with
  * columns sorted by name, so column names AND values must match exactly.
  */
trait Catalog {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Cross-engine determinism helpers.
  *
  * Double sums are order-dependent (Spark's partial aggregation adds in
  * shuffle order, DuckDB adds in scan order), so any money-style SUM must be
  * made associative before aggregation: scale to an integer (`round(x*10^s)`,
  * exact in IEEE double up to 2^53), sum as long, divide once at the end.
  * The same expression text goes into the DuckDB oracle.
  */
/** DuckDB SQL text of the shared text-normalization pipeline — the oracle
  * twin of [[graft.ext.Dedup.normalizeText]] / its word split. Central so
  * every catalog's oracle uses byte-identical normalization (the whitespace
  * class is spelled out because Java `\s` includes \x0B while RE2 does not).
  */
object TextSql {
  val norm =
    """lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')))"""
  val words = s"list_filter(string_split($norm, ' '), x -> x != '')"
}

/** DuckDB re-derivation of greedy longest-match subword tokenization —
  * the oracle twin of [[graft.plans.WordpieceExpression]]. An INDEPENDENT
  * formulation: where the Spark side is an imperative per-row scalar, the
  * oracle is a recursive CTE over the corpus's DISTINCT words (the
  * recursion advances one matched piece per step; `pos > length(w)` is the
  * fixpoint), with the longest-match probe expressed as a CASE ladder over
  * per-length `list_contains` literals generated from the same vocabulary
  * constant. Scalar-only recursion — no joins or aggregates in the
  * recursive term, the subset every recursive-CTE implementation supports.
  */
object WordpieceSql {
  /** CASE ladder returning the longest piece length matching at `pos`
    * (NULL when none): one WHEN per piece length, longest first. */
  private def lenCase(byLen: Seq[(Int, Seq[String])]): String =
    byLen.map { case (l, ps) =>
      val list = ps.sorted.map(p => s"'$p'").mkString("[", ", ", "]")
      s"WHEN list_contains($list, substr(w, pos, $l)) THEN $l"
    }.mkString("CASE ", " ", " END")

  /** CTE block `dw, tk, wp` mapping every distinct corpus word `w` to its
    * subword token count `ntok`. Prepend `WITH RECURSIVE`. */
  def tokenCtes(vocab: Seq[String]): String = {
    val startCase = lenCase(vocab.filterNot(_.startsWith("##"))
      .filter(_.nonEmpty).groupBy(_.length).toSeq.sortBy(-_._1))
    val contCase = lenCase(vocab.filter(_.startsWith("##")).map(_.drop(2))
      .filter(_.nonEmpty).groupBy(_.length).toSeq.sortBy(-_._1))
    s"""dw AS (SELECT DISTINCT w
       |  FROM (SELECT unnest(${TextSql.words}) AS w FROM documents) u),
       |tk(w, pos, cont, ntok, unk) AS (
       |  SELECT w, 1, 0, 0, 0 FROM dw
       |  UNION ALL
       |  SELECT w,
       |    CASE WHEN bl IS NULL THEN length(w) + 1 ELSE pos + bl END,
       |    1,
       |    CASE WHEN bl IS NULL THEN 1 ELSE ntok + 1 END,
       |    CASE WHEN bl IS NULL THEN 1 ELSE 0 END
       |  FROM (SELECT w, pos, cont, ntok, unk,
       |      CASE WHEN cont = 0 THEN $startCase ELSE $contCase END AS bl
       |    FROM tk WHERE pos <= length(w) AND unk = 0) s),
       |wp AS (SELECT w, ntok FROM tk WHERE pos > length(w))""".stripMargin
  }
}

object XDet {
  /** order-independent SUM(x) at `scale` decimal digits, as double */
  def moneySum(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    sum(round(c * lit(p)).cast("long")) / lit(p)
  }
  /** order-independent AVG(x) at `scale` decimal digits, as double */
  def moneyAvg(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    sum(round(c * lit(p)).cast("long")) / lit(p) / count(lit(1))
  }
  /** DuckDB text of [[moneySum]] */
  def moneySumSql(x: String, scale: Int): String = {
    val p = s"1e$scale"
    s"sum(CAST(round(($x)*$p) AS BIGINT))/$p"
  }
  def moneyAvgSql(x: String, scale: Int): String =
    s"${moneySumSql(x, scale)}/count(*)"
}
