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

/** DuckDB CTE chain re-deriving [[graft.ext.Similarity.kmeansFit]] from
  * scratch: FNV-ranked seeds, `iters` rounds of (argmax-cosine assignment,
  * exact-integer mean update with empty-cell carry-over). `from` is the
  * source relation text exposing (vec_id, embedding); the returned chain
  * defines `qv` (quantized vectors) and `c$iters` (final centroids).
  * Shared by the q84/q85 oracles and the q152 IVF-PQ replay.
  *
  * Every CTE is `AS MATERIALIZED`: consumers reference `qv`/`c2`/`fin`
  * several times, and DuckDB's default inlining re-evaluates the WHOLE
  * upstream Lloyd chain per reference — measured on the q176 oracle at
  * sf0.01 this multiplied a ~1 MB problem to a >256 MB memory floor (the
  * round-14 driver OOM); materialized, the same statement runs in 0.2 s
  * under a 64 MB cap (bisected, scripts/oracle_mem_audit.py).
  */
object KmeansSql {
  import graft.ext.Similarity

  def kmeansCtes(kSql: String, iters: Int, dims: Int,
                 from: String): String = {
    import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
    val fnv = toSignedSqlText(
      longSqlText("14695981039346656037::HUGEINT", "vec_id::HUGEINT"))
    def cos(a: String, b: String) = Similarity.cosineLongSqlText(a, b)
    val sb = new StringBuilder
    sb.append(
      s"""qv AS MATERIALIZED (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)
         |   FOR i IN range(1, len(embedding)+1)] AS v FROM $from),
         |c0 AS MATERIALIZED (SELECT cell, v FROM (
         |    SELECT CAST(row_number() OVER (ORDER BY $fnv, vec_id) AS INTEGER)
         |      AS cell, v
         |    FROM qv) WHERE cell <= ($kSql))""".stripMargin)
    for (it <- 1 to iters) {
      val prev = s"c${it - 1}"
      sb.append(
        s""",
           |a$it AS MATERIALIZED (SELECT vec_id, v, cell FROM (
           |    SELECT q.vec_id, q.v, c.cell,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${cos("q.v", "c.v")} DESC, c.cell) AS rn
           |    FROM qv q CROSS JOIN $prev c) WHERE rn = 1),
           |s$it AS MATERIALIZED (SELECT cell, i,
           |      CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END
           |        * (abs(sum(x)) // count(*)) AS BIGINT) AS cx
           |    FROM (SELECT cell, i, v[i] AS x
           |          FROM a$it CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i))
           |    GROUP BY cell, i),
           |n$it AS MATERIALIZED (SELECT cell, list(cx ORDER BY i) AS v FROM s$it GROUP BY cell),
           |c$it AS MATERIALIZED (SELECT p.cell, coalesce(n$it.v, p.v) AS v
           |         FROM $prev p LEFT JOIN n$it USING (cell))""".stripMargin)
    }
    sb.toString
  }

  /** final-assignment CTE (`fin`): every qv row against the final centroids */
  def finAssignCte(iters: Int): String = {
    val cos = Similarity.cosineLongSqlText("q.v", "c.v")
    s"""fin AS MATERIALIZED (SELECT vec_id, cell, cs FROM (
       |    SELECT q.vec_id, c.cell, $cos AS cs,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cos DESC, c.cell) AS rn
       |    FROM qv q CROSS JOIN c$iters c) WHERE rn = 1)""".stripMargin
  }
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

/** DuckDB CTE block replaying [[graft.plans.UnigramExpression]]'s exact
  * integer Viterbi decode per distinct corpus word — the DP itself, not a
  * reformulation: the recursion advances one END POSITION per step carrying
  * a sliding window of the last `maxLen` DP states as a list of
  * `[score, -pieces]` pairs (so DuckDB's lexicographic `list_sort` IS the
  * (score DESC, pieces ASC) argmax), each candidate's piece score looked up
  * scalar-only via `list_position` against per-length literal lists
  * generated from the same vocabulary constant. An unreachable final
  * position (`win[1] IS NULL`) is the whole-word `[UNK]`. Scalar-only
  * recursion — no joins or aggregates in the recursive term.
  */
object UnigramSql {
  /** CTE block `u_dw, u_dp, ug` mapping every distinct corpus word `w` to
    * its Viterbi piece count `ntok` and summed score `score`. Prepend
    * `WITH RECURSIVE`. */
  def segCtes(vocab: Seq[(String, Long)], unkScore: Long): String = {
    val byLen = vocab.filter(_._1.nonEmpty).groupBy(_._1.length)
    val maxLen = byLen.keys.max
    val cands = (1 to maxLen).flatMap { l =>
      byLen.get(l).map { ps =>
        val sorted = ps.sortBy(_._1)
        val plist = sorted.map(p => s"'${p._1}'").mkString("[", ", ", "]")
        val slist = sorted.map(p => s"CAST(${p._2} AS BIGINT)")
          .mkString("[", ", ", "]")
        val sc = s"($slist)[list_position($plist, substr(w, pos + 2 - $l, $l))]"
        s"""CASE WHEN pos + 1 >= $l AND win[$l] IS NOT NULL
           |      AND $sc IS NOT NULL
           |      THEN [win[$l][1] + $sc, win[$l][2] - 1] END""".stripMargin
      }
    }.mkString(",\n        ")
    s"""u_dw AS (SELECT DISTINCT w
       |  FROM (SELECT unnest(${TextSql.words}) AS w FROM documents) uu),
       |u_dp(w, pos, win) AS (
       |  SELECT w, 0, [[CAST(0 AS BIGINT), CAST(0 AS BIGINT)]] FROM u_dw
       |  UNION ALL
       |  SELECT w, pos + 1,
       |    list_prepend(
       |      list_sort(list_filter([
       |        $cands], x -> x IS NOT NULL))[-1],
       |      win)[:$maxLen]
       |  FROM u_dp WHERE pos < length(w)),
       |ug AS (SELECT w,
       |    CASE WHEN win[1] IS NULL THEN CAST(1 AS BIGINT)
       |         ELSE -win[1][2] END AS ntok,
       |    CASE WHEN win[1] IS NULL THEN CAST($unkScore AS BIGINT)
       |         ELSE win[1][1] END AS score
       |  FROM u_dp WHERE pos = length(w))""".stripMargin
  }
}

/** DuckDB CTE chain re-deriving the full PQ pipeline —
  * [[graft.ext.Similarity.pqFit]] (fnv-ranked seeds sliced per subspace,
  * `iters` L2-Lloyd rounds: argmax of 2·dot − ‖c‖² with ties to the lower
  * cell, sign·(|Σ| div n) integer means, empty-cell carry) → encode →
  * per-query lookup tables (queries = vec_id % 50 = 0, the catalog's
  * sample) → ADC = Σ_j table lookups → top-10 per query. Shared by the
  * q147/q156/q157 oracles; q152's RESIDUAL variant keeps its own copy
  * (codes keyed `code`, composed with the kmeans a/s/n namespace).
  *
  * `p` prefixes every CTE name so two chains coexist in one query
  * (q157 runs "" and "o"). `src` must expose (vec_id, v: BIGINT list);
  * a `jj` CTE (SELECT unnest(range(m)) AS j) must be in scope. Defines
  * ${p}seeds, ${p}cb0..cb$iters, ${p}pa/ps/pn$it, ${p}sv, ${p}codes,
  * ${p}lut, ${p}adc, and ${p}approx (query_id, neighbor_id).
  */
object PqSql {
  import graft.ext.Similarity
  import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}

  def chain(p: String, src: String, m: Int, kc: Int, iters: Int,
            sub: Int): String = {
    val fnv = toSignedSqlText(
      longSqlText("14695981039346656037::HUGEINT", "vec_id::HUGEINT"))
    def dot(a: String, b: String) = Similarity.dotLongSqlText(a, b)
    val lloyd = (1 to iters).map { it =>
      s"""${p}pa$it AS MATERIALIZED (SELECT vec_id, j, sv, cell FROM (
         |    SELECT s.vec_id, s.j, s.sv, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "c.v")} - ${dot("c.v", "c.v")}
         |          DESC, c.cell) AS rn
         |    FROM ${p}sv s JOIN ${p}cb${it - 1} c ON s.j = c.j)
         |  WHERE rn = 1),
         |${p}ps$it AS (SELECT j, cell, i,
         |      CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END
         |        * (abs(sum(x)) // count(*)) AS BIGINT) AS cx
         |    FROM (SELECT j, cell, i, sv[i] AS x
         |          FROM ${p}pa$it
         |          CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS i))
         |    GROUP BY j, cell, i),
         |${p}pn$it AS (SELECT j, cell, list(cx ORDER BY i) AS v
         |         FROM ${p}ps$it GROUP BY j, cell),
         |${p}cb$it AS MATERIALIZED (SELECT pr.j, pr.cell,
         |      coalesce(${p}pn$it.v, pr.v) AS v
         |    FROM ${p}cb${it - 1} pr
         |    LEFT JOIN ${p}pn$it USING (j, cell))""".stripMargin
    }.mkString(",\n")
    s"""${p}seeds AS (SELECT v, rn FROM (
       |    SELECT v, row_number() OVER (ORDER BY $fnv, vec_id) AS rn
       |    FROM $src) WHERE rn <= $kc),
       |${p}cb0 AS (SELECT j, CAST(rn AS INTEGER) AS cell,
       |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS v
       |  FROM ${p}seeds CROSS JOIN jj),
       |${p}sv AS MATERIALIZED (SELECT vec_id, j,
       |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS sv
       |  FROM $src CROSS JOIN jj),
       |$lloyd,
       |${p}codes AS MATERIALIZED (SELECT vec_id, j, cell FROM (
       |    SELECT s.vec_id, s.j, c.cell,
       |      row_number() OVER (PARTITION BY s.vec_id, s.j
       |        ORDER BY 2*${dot("s.sv", "c.v")} - ${dot("c.v", "c.v")}
       |          DESC, c.cell) AS rn
       |    FROM ${p}sv s JOIN ${p}cb$iters c ON s.j = c.j)
       |  WHERE rn = 1),
       |${p}lut AS MATERIALIZED (SELECT s.vec_id AS query_id, c.j,
       |    c.cell, ${dot("s.sv", "c.v")} AS pd
       |  FROM ${p}sv s JOIN ${p}cb$iters c ON s.j = c.j
       |  WHERE s.vec_id % 50 = 0),
       |${p}adc AS (SELECT l.query_id, co.vec_id AS neighbor_id,
       |    CAST(sum(l.pd) AS BIGINT) AS adc
       |  FROM ${p}codes co
       |  JOIN ${p}lut l ON co.j = l.j AND co.cell = l.cell
       |  WHERE co.vec_id != l.query_id
       |  GROUP BY 1, 2),
       |${p}approx AS (SELECT query_id, neighbor_id FROM ${p}adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc DESC, neighbor_id) <= 10)""".stripMargin
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
