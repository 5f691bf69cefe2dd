package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.LanguageModel
import graft.sources.Tables

/** Round-8 language-model curation catalog: the two classic model-driven
  * data-selection operators — CCNet-style LM quality filtering (q130) and
  * DSIR-style hashed-n-gram importance selection (q131) — both integer-
  * exact so the scores hash-check cross-engine (see
  * [[graft.ext.LanguageModel]] for the full design rationale).
  *
  * Scale shapes: fit = two mergeable groupBys over the exploded reference;
  * scoring = token-keyed equi-joins (Σ tokens rows, never |corpus|²) + one
  * doc-keyed reduce; DSIR's bucket table is `buckets` rows broadcast by
  * construction and the selection is the bounded map-side top-k aggregate,
  * never a global sort.
  */
object LmOps extends Catalog {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- CCNet-style LM quality filter -------------------------------------
    // train an add-one-smoothed bigram LM on the trusted reference slice
    // (source = 'src1' — the curated corpus in this fixture's story), score
    // EVERY document by its mean smoothed conditional probability (micros,
    // integer-exact — the rational-score device of X61), and keep docs at
    // or above the token-weighted corpus mean. The production form of
    // "drop the disfluent tail" — and because both the model counts and
    // the per-token quotients are integers, the score itself (not just
    // the verdict) is oracle-pinned.
    "q130_lm_quality_filter" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = LanguageModel.fitBigram(
        docs.filter(col("source") === "src1"), "doc_id", "text")
      LanguageModel.scoreBigram(model, docs, "doc_id", "text")
    }),

    // ---- DSIR-style importance selection -----------------------------------
    // hashed n-gram features (unigrams + bigrams, fnv mod 256), per-bucket
    // target/source probability ratios (nanos → millis, add-one smoothed
    // on a dense bucket spine so no ratio is undefined), mean ratio per
    // doc, and the top-100 docs by (score desc, id asc) via the bounded
    // top-k aggregate. "Which raw docs look most like my curated slice" —
    // the data-selection question DSIR answers at pretraining scale.
    "q131_dsir_selection" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      LanguageModel.dsirSelect(
        target = docs.filter(col("source") === "src1"),
        source = docs, id = "doc_id", text = "text",
        buckets = 256, select = 100)
    })
  )

  /** Bigram CTE block over `documents`: dw (doc_id, source, ws) and bg
    * (doc_id, source, prev, w). Shared by both oracles. */
  private val bigramCtes =
    s"""dw AS (SELECT doc_id, source, ${TextSql.words} AS ws FROM documents),
       |bgi AS (SELECT doc_id, source, ws,
       |    unnest(generate_series(1, len(ws) - 1)) AS i
       |  FROM dw),
       |bg AS (SELECT doc_id, source, ws[i] AS prev, ws[i + 1] AS w
       |  FROM bgi)""".stripMargin

  override def oracles: Map[String, String] = Map(

    "q130_lm_quality_filter" ->
      s"""WITH $bigramCtes,
         |bi AS (SELECT prev, w, count(*) AS c2 FROM bg
         |  WHERE source = 'src1' GROUP BY 1, 2),
         |uni AS (SELECT prev, count(*) AS c1 FROM bg
         |  WHERE source = 'src1' GROUP BY 1),
         |vv AS (SELECT count(DISTINCT u.x) AS V
         |  FROM (SELECT unnest(ws) AS x FROM dw WHERE source = 'src1') u),
         |tok AS (SELECT bg.doc_id,
         |    ((coalesce(bi.c2, 0) + 1) * 1000000)
         |      // (coalesce(uni.c1, 0) + vv.V) AS p
         |  FROM bg
         |  LEFT JOIN bi ON bg.prev = bi.prev AND bg.w = bi.w
         |  LEFT JOIN uni ON bg.prev = uni.prev
         |  CROSS JOIN vv),
         |pd AS (SELECT doc_id, count(*) AS n, sum(p) AS s
         |  FROM tok GROUP BY 1),
         |g AS (SELECT sum(s) // sum(n) AS gs FROM pd)
         |SELECT d.doc_id,
         |  CAST(coalesce(pd.n, 0) AS BIGINT) AS n_bigrams,
         |  CAST(pd.s // pd.n AS BIGINT) AS score_micro,
         |  coalesce(pd.s // pd.n >= g.gs, false) AS keep
         |FROM documents d
         |LEFT JOIN pd ON d.doc_id = pd.doc_id
         |CROSS JOIN g""".stripMargin,

    "q131_dsir_selection" -> {
      import graft.plans.Fnv1a64Expression.stringSqlText
      // fnv mod 256 == pmod(signed, 256): 256 divides 2^64, so the signed
      // reinterpretation is invisible to the low byte
      val fnvBucket = s"CAST((${stringSqlText("f")}) % 256::HUGEINT AS BIGINT)"
      s"""WITH $bigramCtes,
         |feat AS (
         |  SELECT doc_id, unnest(ws) AS f FROM dw
         |  UNION ALL
         |  SELECT doc_id, prev || ' ' || w AS f FROM bg),
         |fh AS (SELECT f, $fnvBucket AS bucket
         |  FROM (SELECT DISTINCT f FROM feat)),
         |fb AS (SELECT feat.doc_id, fh.bucket
         |  FROM feat JOIN fh ON feat.f = fh.f),
         |tgt AS (SELECT doc_id FROM documents WHERE source = 'src1'),
         |tcnt AS (SELECT bucket, count(*) AS tc FROM fb
         |  JOIN tgt ON fb.doc_id = tgt.doc_id GROUP BY 1),
         |scnt AS (SELECT bucket, count(*) AS sc FROM fb GROUP BY 1),
         |tt AS (SELECT sum(tc) AS t FROM tcnt),
         |st AS (SELECT sum(sc) AS t FROM scnt),
         |spine AS (SELECT unnest(generate_series(0, 255)) AS bucket),
         |ratio AS (SELECT spine.bucket,
         |    (((coalesce(tcnt.tc, 0) + 1) * 1000000000)
         |        // (tt.t + 256) * 1000)
         |      // (((coalesce(scnt.sc, 0) + 1) * 1000000000)
         |        // (st.t + 256)) AS r_milli
         |  FROM spine
         |  LEFT JOIN tcnt ON spine.bucket = tcnt.bucket
         |  LEFT JOIN scnt ON spine.bucket = scnt.bucket
         |  CROSS JOIN tt CROSS JOIN st),
         |pd AS (SELECT fb.doc_id, count(*) AS n,
         |    sum(ratio.r_milli) AS s
         |  FROM fb JOIN ratio ON fb.bucket = ratio.bucket
         |  GROUP BY 1)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(n AS BIGINT) AS n_features,
         |  CAST(s // n AS BIGINT) AS score_milli
         |FROM pd
         |ORDER BY s // n DESC, doc_id ASC
         |LIMIT 100""".stripMargin
    }
  )
}
