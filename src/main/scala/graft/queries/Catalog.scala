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
