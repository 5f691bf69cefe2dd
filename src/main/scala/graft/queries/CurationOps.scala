package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.sources.Tables

/** Round-6 curation-model catalog: the operators a training-data pipeline
  * runs BETWEEN dedup and packing — semantic clustering (deterministic
  * k-means), SemDeDup-style within-cluster pruning, composite quality
  * verdicts, and corpus-level n-gram signals.
  *
  * Scale shapes (the 100 TB contract):
  *  - q84/q85: each k-means iteration is one broadcast-assignment pass plus
  *    one (cell, dim)-keyed aggregation whose exchange carries k·dims·P
  *    rows regardless of corpus size; the SemDeDup pair join is
  *    cell-bucketed (Σ|cell|², never all-pairs), with cells fitted to the
  *    corpus density rather than supplied.
  */
object CurationOps extends Catalog {

  /** DuckDB CTE chain re-deriving [[graft.ext.Similarity.kmeansFit]] from
    * scratch: FNV-ranked seeds, `iters` rounds of (argmax-cosine assignment,
    * exact-integer mean update with empty-cell carry-over). `from` is the
    * source relation text exposing (vec_id, embedding); the returned chain
    * defines `qv` (quantized vectors) and `c$iters` (final centroids).
    */
  private def kmeansCtes(k: Int, iters: Int, dims: Int, from: String): String = {
    import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
    val fnv = toSignedSqlText(
      longSqlText("14695981039346656037::HUGEINT", "vec_id::HUGEINT"))
    def cos(a: String, b: String) = Similarity.cosineLongSqlText(a, b)
    val sb = new StringBuilder
    sb.append(
      s"""qv AS (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)
         |   FOR i IN range(1, len(embedding)+1)] AS v FROM $from),
         |c0 AS (SELECT cell, v FROM (
         |    SELECT CAST(row_number() OVER (ORDER BY $fnv, vec_id) AS INTEGER)
         |      AS cell, v
         |    FROM qv) WHERE cell <= $k)""".stripMargin)
    for (it <- 1 to iters) {
      val prev = s"c${it - 1}"
      sb.append(
        s""",
           |a$it AS (SELECT vec_id, v, cell FROM (
           |    SELECT q.vec_id, q.v, c.cell,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${cos("q.v", "c.v")} DESC, c.cell) AS rn
           |    FROM qv q CROSS JOIN $prev c) WHERE rn = 1),
           |s$it AS (SELECT cell, i,
           |      CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END
           |        * (abs(sum(x)) // count(*)) AS BIGINT) AS cx
           |    FROM (SELECT cell, i, v[i] AS x
           |          FROM a$it CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i))
           |    GROUP BY cell, i),
           |n$it AS (SELECT cell, list(cx ORDER BY i) AS v FROM s$it GROUP BY cell),
           |c$it AS (SELECT p.cell, coalesce(n$it.v, p.v) AS v
           |         FROM $prev p LEFT JOIN n$it USING (cell))""".stripMargin)
    }
    sb.toString
  }

  /** final-assignment CTE (`fin`): every qv row against the final centroids */
  private def finAssignCte(iters: Int): String = {
    val cos = Similarity.cosineLongSqlText("q.v", "c.v")
    s"""fin AS (SELECT vec_id, cell, cs FROM (
       |    SELECT q.vec_id, c.cell, $cos AS cs,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cos DESC, c.cell) AS rn
       |    FROM qv q CROSS JOIN c$iters c) WHERE rn = 1)""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deterministic k-means fit + assignment ---------------------------
    // the coarse quantizer every semantic operator downstream leans on,
    // fitted (not supplied, as q26/q35's centroids are): FNV-ranked seeds,
    // two Lloyd rounds on scaled-integer vectors, sign·(|sum| div n) means.
    // Every float the fit touches derives from exact ints, so the whole
    // fit — not just the final assignment — is hash-checked cross-engine.
    "q84_kmeans_embed" -> ((s, d) => {
      val vecs = Tables.embeddings(s, d)
      val cent = Similarity.kmeansFit(vecs, "vec_id", "embedding",
        k = 8, iters = 2)
      Similarity.kmeansAssign(vecs, "vec_id", "embedding", cent)
        .select(col("vec_id"), col("cell"),
          (floor(col("cosine") * 1e6 + 0.5) / 1e6).as("cosine"))
    }),

    // ---- SemDeDup within-cluster semantic pruning -------------------------
    // the natural corpus has no high-cosine pairs (max 0.51), so the query
    // PLANTS them — q77's device: every 50th vector re-enters at id+100000
    // with dim 0 nudged +0.05 (cos ≈ 0.9987 to its source). The verdict
    // drops a row iff a smaller-id cell-mate clears the cosine bar; each
    // plant should die to its source unless the fit splits the pair across
    // cells (the oracle mirrors whichever happens — SemDeDupSpec pins that
    // drops DO occur).
    "q85_semantic_dedup" -> ((s, d) => {
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = vecs.filter(col("vec_id") % 50 === 3)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + when(i === 0, lit(0.05)).otherwise(lit(0.0)))
            .as("embedding"))
      Similarity.semanticDedupVerdict(vecs.unionByName(planted),
          "vec_id", "embedding", k = 8, iters = 2, minCosine = 0.95)
        .select(col("vec_id"), col("cell"),
          (floor(col("centroid_cosine") * 1e6 + 0.5) / 1e6)
            .as("centroid_cosine"),
          col("keep"), col("dup_of"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q84_kmeans_embed" -> {
      val ctes = kmeansCtes(k = 8, iters = 2, dims = 64, from = "embeddings")
      s"""WITH $ctes,
         |${finAssignCte(2)}
         |SELECT vec_id, cell,
         |  floor(cs*1000000.0 + 0.5)/1000000.0 AS cosine
         |FROM fin""".stripMargin
    },

    "q85_semantic_dedup" -> {
      val aug =
        """(SELECT vec_id,
          |   [CAST(embedding[dd] AS DOUBLE) FOR dd IN range(1, 65)]
          |     AS embedding
          | FROM embeddings
          | UNION ALL
          | SELECT vec_id + 100000,
          |   [CAST(embedding[dd] AS DOUBLE)
          |      + CASE WHEN dd = 1 THEN 0.05 ELSE 0.0 END
          |    FOR dd IN range(1, 65)]
          | FROM embeddings WHERE vec_id % 50 = 3)""".stripMargin
      val ctes = kmeansCtes(k = 8, iters = 2, dims = 64, from = aug)
      val pairCos = Similarity.cosineLongSqlText("qa.v", "qb.v")
      s"""WITH $ctes,
         |${finAssignCte(2)},
         |dropped AS (
         |  SELECT x.vec_id, min(y.vec_id) AS dup_of
         |  FROM fin x JOIN fin y ON x.cell = y.cell AND y.vec_id < x.vec_id
         |  JOIN qv qa ON qa.vec_id = x.vec_id
         |  JOIN qv qb ON qb.vec_id = y.vec_id
         |  WHERE $pairCos >= 0.95
         |  GROUP BY 1)
         |SELECT f.vec_id, f.cell,
         |  floor(f.cs*1000000.0 + 0.5)/1000000.0 AS centroid_cosine,
         |  CAST(p.dup_of IS NULL AS INTEGER) AS keep, p.dup_of
         |FROM fin f LEFT JOIN dropped p USING (vec_id)""".stripMargin
    }
  )
}
