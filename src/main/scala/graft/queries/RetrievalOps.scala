package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.plans.TopKByAggregate
import graft.plans.Fnv1a64Expression
import graft.sources.Tables

/** Round-7 retrieval catalog: the "query the corpus" surface a curated
  * training set feeds — lexical top-k retrieval over an inverted index
  * (q101) and sliding-window chunking into training samples (q103).
  *
  * Scale shapes (the 100 TB contract):
  *  - q101: the scoring join is TERM-keyed — only docs containing a query
  *    term are ever touched, so per-query cost is Σ df over its terms, not
  *    |corpus|; the (doc, term) index, lens, and dfs are corpus-wide
  *    precomputable and reusable across query batches; the final ranking
  *    is the bounded-state `graft_topk_by` aggregate (k·|queries| rows
  *    cross the exchange, never a corpus-wide sort);
  *  - q103: pure per-row explode bounded by |doc|/stride chunks — zero
  *    exchanges (PlanAuditSpec contract), the map-side shape that runs
  *    embarrassingly parallel at any scale.
  */
object RetrievalOps extends Catalog {

  private val wordsSql = TextSql.words

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- BM25-style lexical top-k retrieval --------------------------------
    // Okapi BM25 with k1 = 1.2, b = 0.75 and a RATIONAL idf:
    // (N − df + 0.5)/(df + 0.5) without the usual log damping, because ln
    // is not cross-engine bit-stable (libm vs DuckDB may differ in the
    // last ulp) while +,−,×,÷ are IEEE-exact everywhere — the whole score
    // is therefore hash-checked, not rows-only. Like q34's integer tf-idf
    // ranking, the substitution is monotone in df per term; absolute
    // scores differ from log-BM25 but the rare-term-dominates behavior is
    // preserved. Each query = the 5 RAREST distinct terms of a query doc
    // (df ASC, term ASC — a total order per doc, rerun-stable), so the
    // term-keyed scoring join touches few postings per query — the
    // inverted-index retrieval shape. Per-term contributions are
    // quantized to integer micros BEFORE the sum (each contribution is a
    // deterministic double; the long sum is associative — XDet's device),
    // and ranking is (score DESC, doc_id ASC) via the bounded-state
    // top-k aggregate.
    "q101_bm25_topk" -> ((s, d) => {
      // pinned widen: the token stream feeds index/lens/dfs/qterms — four
      // subtrees over one cheap scan (round-11 A/B: 1.83 -> 1.18 s pinned)
      val docs = graft.ext.Caches.pin(Tables.documentsWide(s, d))
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      val index = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val dfs = index.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = lens.agg(count(lit(1)).as("__n"), sum("len").as("__tot"))
      val byQ = Window.partitionBy("query_id")
        .orderBy(col("df"), col("term"))
      val qterms = index.filter(col("doc_id") % 100 === 1)
        .select(col("doc_id").as("query_id"), col("term"))
        .join(dfs, Seq("term"))
        .withColumn("__r", row_number().over(byQ))
        .filter(col("__r") <= 5)
        .select("query_id", "term", "df")
      val contrib = qterms.join(index, Seq("term"))
        .join(lens, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        // constants appear as decimal literals (2.2, not k1+1 computed in
        // Scala): both engines parse the SAME decimal to the same double,
        // while 1.2+1.0 evaluated here could differ in the last ulp
        .withColumn("__w",
          (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
            * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2) * (lit(0.25)
              + lit(0.75) * (col("len")
                / (col("__tot").cast("double") / col("__n"))))))
        .withColumn("__w_micro", floor(col("__w") * 1e6 + 0.5).cast("long"))
      contrib.groupBy("query_id", "doc_id")
        .agg(sum("__w_micro").as("score_micro"))
        .groupBy("query_id")
        .agg(TopKByAggregate.topkBy(col("score_micro").cast("double"),
          col("doc_id"), 3).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.id").as("doc_id"), col("col.score").cast("long")
            .as("score_micro"))
    }),

    // ---- sliding-window chunking into training samples ---------------------
    // the step that cuts curated documents into the fixed-token windows a
    // training run consumes: 32-token windows at stride 24 (8-token
    // overlap), chunk starts at 0, 24, 48, … while start < |doc|, the
    // tail chunk keeps its natural (shorter) length. Each chunk carries
    // its FNV-1a 64 fingerprint of the space-joined tokens — the key
    // chunk-level exact dedup (q21's grain, one level below q94's
    // segments) joins on downstream. Pure per-row array math: the explode
    // is bounded by ⌈|doc|/24⌉ and the plan has ZERO exchanges.
    "q103_chunk_windows" -> ((s, d) => {
      import graft.plans.Fnv1a64Expression.fnv1a64
      val w = 32
      val st = 24
      val chunk = slice(col("__ts"),
        (col("chunk_idx") * st + 1).cast("int"), lit(w))
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__ts"))
        .withColumn("__n", size(col("__ts")).cast("long"))
        .filter(col("__n") > 0)
        .select(col("doc_id"), col("__ts"), col("__n"),
          explode(sequence(lit(0L),
            floor((col("__n") + lit(st - 1)) / lit(st.toDouble)).cast("long")
              - 1)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * st).cast("long").as("start_tok"),
          least(lit(w.toLong), col("__n") - col("chunk_idx") * st)
            .as("n_tok"),
          fnv1a64(concat_ws(" ", chunk)).as("chunk_fp"))
    })
  )

  override def oracles: Map[String, String] = Map(
    // full re-derivation: same index, same rational-idf arithmetic in the
    // same operation order (IEEE ops are deterministic given identical
    // expression trees), same micro-quantization before the sum
    "q101_bm25_topk" ->
      s"""WITH toks AS (SELECT doc_id, unnest($wordsSql) AS term
         |              FROM documents),
         |idx AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
         |dfs AS (SELECT term, count(*) AS df FROM idx GROUP BY 1),
         |stats AS (SELECT count(*) AS n, sum(len) AS tot FROM lens),
         |qterms AS (SELECT query_id, term, df FROM (
         |    SELECT i.doc_id AS query_id, i.term, d.df,
         |      row_number() OVER (PARTITION BY i.doc_id
         |        ORDER BY d.df, i.term) AS r
         |    FROM idx i JOIN dfs d USING (term) WHERE i.doc_id % 100 = 1)
         |  WHERE r <= 5),
         |contrib AS (SELECT q.query_id, i.doc_id,
         |    CAST(floor(
         |      ((s.n - q.df + 0.5) / (q.df + 0.5)
         |        * (i.tf * 2.2)
         |        / (i.tf + 1.2 * (0.25 + 0.75 * (l.len
         |            / (CAST(s.tot AS DOUBLE) / s.n)))))
         |      * 1000000.0 + 0.5) AS BIGINT) AS w
         |  FROM qterms q JOIN idx i USING (term)
         |  JOIN lens l ON l.doc_id = i.doc_id CROSS JOIN stats s),
         |scores AS (SELECT query_id, doc_id,
         |    CAST(sum(w) AS BIGINT) AS score_micro
         |  FROM contrib GROUP BY 1, 2)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score_micro
         |FROM (SELECT query_id, doc_id, score_micro,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY score_micro DESC, doc_id) AS rnk
         |      FROM scores)
         |WHERE rnk <= 3""".stripMargin,

    "q103_chunk_windows" -> {
      // chunk string materialized once in a CTE so the 3-fold inlining of
      // stringSqlText hashes a plain column reference
      val fp = Fnv1a64Expression.toSignedSqlText(
        Fnv1a64Expression.stringSqlText("chunk_txt"))
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |n AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
         |c AS (SELECT doc_id, ws, n,
         |        unnest(range((n + 23) // 24)) AS chunk_idx FROM n),
         |t AS (SELECT doc_id, chunk_idx, n,
         |        array_to_string(ws[chunk_idx*24 + 1 : chunk_idx*24 + 32],
         |          ' ') AS chunk_txt
         |      FROM c)
         |SELECT doc_id, chunk_idx, CAST(chunk_idx*24 AS BIGINT) AS start_tok,
         |  CAST(least(32, n - chunk_idx*24) AS BIGINT) AS n_tok,
         |  $fp AS chunk_fp
         |FROM t""".stripMargin
    }
  )
}
