package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, LanguageModel, TextAnalysis}
import graft.sources.Tables

/** Round-8 language-model curation catalog: the classic model-driven
  * data-selection operators — CCNet-style LM quality filtering (q130),
  * DSIR-style hashed-n-gram importance selection (q131) — plus the
  * tokenizer-training pair: BPE merge learning (q132) and BPE token
  * accounting under the learned rules (q133). All integer-exact so the
  * scores hash-check cross-engine (see [[graft.ext.LanguageModel]] and
  * [[graft.ext.Bpe]] for the design rationale).
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
    // plain scan, NOT documentsWide: docs feed the model fit AND the
    // scoring side, and the widen exchange replays per subtree (round-10
    // regression, CPU 0.73 -> 19.2 s; A/B'd off/hash/hashpin in round 11 —
    // plain won at 0.96 s vs 1.66-1.76 s for every widened variant)
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
    // plain scan, NOT documentsWide — same A/B as q130 (target + source
    // subtrees replay the widen; plain 1.48 s vs 3.73-4.18 s widened)
    "q131_dsir_selection" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      LanguageModel.dsirSelect(
        target = docs.filter(col("source") === "src1"),
        source = docs, id = "doc_id", text = "text",
        buckets = 256, select = 100)
    }),

    // ---- BPE merge learning ------------------------------------------------
    // the TRAINING side of the subword story (q125 is inference over a
    // given vocab; this learns the merge rules from the corpus): 8 rounds
    // of weighted adjacent-pair counting over the pinned distinct-word
    // frequency table, argmax under (count DESC, pair ASC), merges folded
    // back as literal greedy replaces over the wrapped-token encoding —
    // driver-sized model state, the X58 k-means posture. The oracle
    // replays the ENTIRE fit as 8 unrolled CTE layers, so tie-breaks and
    // greedy run alignment are hash-pinned.
    "q132_bpe_merges" -> ((s, d) =>
      // srcPath routes the fit through the content-keyed model store
      // (round 13): first session per corpus vintage fits 128 rules once,
      // every later session (and every sibling BPE query) reads the rule
      // table — merges(8) is its prefix slice, counts included
      Bpe.bpeMerges(Tables.documents(s, d), "text", k = 8,
        srcPath = Some(s"$d/documents.parquet"))),

    // ---- BPE token accounting ----------------------------------------------
    // the corpus re-tokenized under its OWN learned merges: per-doc
    // (bpe_tokens, ws_tokens). The merge cascade runs once per DISTINCT
    // word; the corpus word stream joins the result — vocabulary-sized
    // expression cost, Σ words join rows.
    "q133_bpe_token_counts" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.storedMerges(docs, "text",
        s"$d/documents.parquet", 8).map(m => (m._1, m._2))
      Bpe.tokenCounts(docs, "doc_id", "text", merges)
    }),

    // ---- BPE -> wordpiece round-trip ---------------------------------------
    // the tier's closing loop: q132's learned merges exported as an
    // inference vocabulary (every symbol as start AND ##-continuation
    // piece) and fed to q125's greedy longest-match tokenizer, per-doc
    // counts under BOTH rules plus the word occurrences they disagree on
    // — merge-order application and longest-match inference are DIFFERENT
    // algorithms (the BPE-vs-WordPiece inference gap), so the agreement
    // is measured, not assumed. The oracle replays both sides: the 8
    // unrolled fit layers AND a 16-layer greedy longest-prefix iteration
    // over the exported piece set.
    "q142_bpe_wordpiece_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.storedMerges(docs, "text",
        s"$d/documents.parquet", 8).map(m => (m._1, m._2))
      Bpe.roundTrip(docs, "doc_id", "text", merges)
    }),

    // ---- learned-vocabulary coverage / UNK rate ----------------------------
    // the tokenizer report real pipelines run before committing to a
    // vocabulary: every RAW word (no training-bounds bypass — this is the
    // query that exercises the greedy tokenizer's [UNK] path on data)
    // goes through greedy longest-match over q132's exported vocabulary,
    // per-source UNK occurrences / distinct UNK forms / subword tokens /
    // UNK permille. The fixture text itself is all-charset, so the
    // off-charset mass is fabricated deterministically from fixture
    // columns (the q129 URL device): each doc contributes a "doc-<id>"
    // id-token and a "src#lang" tag-token — exactly the id/URL/punct
    // shapes that dominate real UNK tails.
    "q145_vocab_coverage" -> ((s, d) => {
      val docs = Tables.documentsWide(s, d)
      val merges = Bpe.storedMerges(docs, "text",
        s"$d/documents.parquet", 8).map(m => (m._1, m._2))
      val aug = concat(col("text"), lit(" doc-"),
        col("doc_id").cast("string"), lit(" "), col("source"), lit("#"),
        col("lang"))
      Bpe.vocabCoverage(docs, "source", aug, merges)
    }),

    // ---- vocabulary-size sweep: the coverage-vs-vocab curve ---------------
    // the decision report a tokenizer build actually reads — q145's
    // coverage/UNK metrics at k ∈ {8, 32, 128} learned merges. The fit
    // runs ONCE at the largest k and each smaller vocabulary is a PREFIX
    // slice: BPE learning is greedy, merge i never depends on any merge
    // after it, so merges(8) == learnMerges(freq, 8) by construction —
    // and the oracle pins exactly that, deriving every k's piece set from
    // the b1..bk layers of ONE 128-round fit replay. One corpus pass per
    // k for the coverage report itself (the greedy matcher is per-k
    // state); the 100 TB shape stays q145's map-only projection + small
    // rollup, ×|ks|.
    "q151_vocab_size_sweep" -> ((s, d) => {
      val docs = Tables.documentsWide(s, d)
      val all = Bpe.storedMerges(docs, "text",
        s"$d/documents.parquet", 128).map(m => (m._1, m._2))
      val aug = concat(col("text"), lit(" doc-"),
        col("doc_id").cast("string"), lit(" "), col("source"), lit("#"),
        col("lang"))
      Seq(8, 32, 128).map { k =>
        Bpe.vocabCoverage(docs, "source", aug, all.take(k))
          .withColumn("n_merges", lit(k.toLong))
      }.reduce(_ unionByName _)
        .select(col("n_merges"), col("source"), col("n_words"),
          col("unk_words"), col("wp_tokens"), col("unk_vocab"),
          col("unk_permille"))
    }),

    // ---- usage-based vocabulary pruning -----------------------------------
    // the maintenance pass after the sweep: learn 32 merges, MEASURE which
    // exported pieces the greedy tokenizer actually uses on the training
    // corpus (greedy longest-match strands early merges — a merge
    // swallowed by every longer merge containing it scores zero), drop
    // merged symbols below 2‰ of the word mass, report coverage before
    // and after. The pruning decision is a k-row model collect; both
    // coverage passes stay q145's map-only shape.
    "q154_vocab_prune" -> ((s, d) => {
      val docs = Tables.documentsWide(s, d)
      val aug = concat(col("text"), lit(" doc-"),
        col("doc_id").cast("string"), lit(" "), col("source"), lit("#"),
        col("lang"))
      Bpe.vocabPrune(docs, "source", aug, "text", k = 32,
        minUsagePermille = 2,
        preMerges = Some(Bpe.storedMerges(docs, "text",
          s"$d/documents.parquet", 32).map(m => (m._1, m._2))))
    }),

    // ---- tokenizer-coverage drift under a FROZEN vocabulary ----------------
    // the MONITORING half of the incremental-maintenance family
    // (q176-q179 fold model state; this watches whether a model still
    // fits the data): merges trained on the base slice and frozen, the
    // batch slice arrives, and per source the report compares UNK
    // permille (charset distribution shift — merge-independent) and
    // fertility permille (tokens per 1000 words under the frozen merges
    // — the number that degrades on a mismatched batch). refit_flag
    // fires at |drift| >= 50 permille — BPE merges cannot fold (merge i
    // depends on counts AFTER merge i-1), so unlike the fold family the
    // only maintenance move is refit, and the trigger needs a measured
    // signal. One corpus pass, no join (the flag rides the row).
    "q180_vocab_drift" -> ((s, d) => {
      val docs = Tables.documentsWide(s, d)
      // batch = every 10th doc-id STRIDE-20 block: doc_id % 10 would be
      // perfectly correlated with `source` on this fixture (each source
      // owns one residue), making every source all-base or all-batch and
      // the within-source comparison degenerate
      val isBatch = expr("(doc_id div 20) % 10") === 9
      val base = docs.filter(!isBatch)
      val merges = Bpe.storedMerges(base, "text",
        s"$d/documents.parquet", 8, variant = "base20x9").map(m => (m._1, m._2))
      val aug = concat(col("text"), lit(" doc-"),
        col("doc_id").cast("string"), lit(" "), col("source"), lit("#"),
        col("lang"))
      Bpe.vocabDrift(docs, "source", isBatch, aug, merges)
    }),

    // ---- unigram-LM (SentencePiece-style) Viterbi segmentation -------------
    // the third tokenizer family, completing the triad: BPE applies
    // learned merges in ORDER (q132/q133), WordPiece commits greedily to
    // the longest match (q125), unigram-LM Viterbi-decodes the GLOBALLY
    // max-score segmentation under per-piece integer log-prob scores
    // (millibits — the X75 log-free posture, so the whole decode
    // hash-checks). wp_tokens rides along because the per-doc wp/ug
    // disagreement IS the point: several corpus words are deliberately
    // absent from the unigram vocab as whole pieces, so the objective
    // genuinely chooses among competing splits. Map-only, zero exchanges
    // (the q125 scale shape); the oracle replays the exact DP per
    // distinct word as a recursive CTE (UnigramSql).
    "q174_unigram_tokens" -> ((s, d) => {
      // gated widen: the q80 posture — plain below 512 KiB (round 16; was
      // 4 MiB), one exchange in
      // the single-file mid-scale band (sf1: 6.7 s / 6.4 CPU-s on one
      // core plain), off again past 1 GiB where the scan is wide itself
      Tables.documentsWideMapOnly(s, d).select(col("doc_id"), col("lang"),
        coalesce(TextAnalysis.wordpieceCount(col("text")), lit(0L))
          .as("wp_tokens"),
        coalesce(TextAnalysis.unigramCount(col("text")), lit(0L))
          .as("ug_tokens"),
        coalesce(TextAnalysis.unigramScore(col("text")), lit(0L))
          .as("ug_score"))
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

  /** CTE chain f0, w0, (a/p/c/b/w)1..k replaying the whole BPE fit: wrapped
    * chars, weighted pair counts, argmax under (c DESC, l, r), one greedy
    * replace per merge (the wrapped-token representation makes DuckDB's
    * left-to-right `replace` exactly the greedy list merge — see the `Bpe`
    * scaladoc). wk holds the final symbolization; b1..bk the learned
    * merges. Each w-layer LEFT JOINs its b-layer and coalesces back to the
    * unmerged sym, so a round that learns NO merge (b_i empty — a corpus
    * that exhausts its pairs before round k) passes symbols through
    * unchanged instead of emptying every later layer, matching the Spark
    * learner's behavior of simply learning fewer than k merges.
    */
  /** `docsFrom` overrides the fit's source relation (must expose `text`) —
    * the q180 frozen-vocabulary face fits on the base slice only. */
  private def bpeCtes(k: Int, docsFrom: String = "documents"): String = {
    val base =
      s"""f0 AS MATERIALIZED (SELECT word, count(*) AS wc
         |  FROM (SELECT unnest(${TextSql.words}) AS word FROM $docsFrom)
         |  WHERE length(word) BETWEEN 2 AND ${graft.ext.Bpe.MaxWordLen}
         |    AND regexp_full_match(word, '${graft.ext.Bpe.WordCharset}')
         |  GROUP BY 1),
         |w0 AS (SELECT word, wc,
         |  regexp_replace(word, '(.)', '(\\1)', 'g') AS sym FROM f0)"""
        .stripMargin
    val rounds = (1 to k).map { i =>
      s"""a$i AS (SELECT wc,
         |  string_split(regexp_replace(sym, '^\\(|\\)$$', '', 'g'), ')(')
         |    AS a FROM w${i - 1}),
         |p$i AS (SELECT a[ii] AS l, a[ii + 1] AS r, wc FROM
         |  (SELECT wc, a, unnest(generate_series(1, len(a) - 1)) AS ii
         |   FROM a$i)),
         |c$i AS (SELECT l, r, sum(wc) AS c FROM p$i GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT l, r, c FROM c$i
         |  ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |w$i AS MATERIALIZED (SELECT w.word, w.wc,
         |  coalesce(replace(w.sym, '(' || b.l || ')(' || b.r || ')',
         |    '(' || b.l || b.r || ')'), w.sym) AS sym
         |  FROM w${i - 1} w LEFT JOIN b$i b ON true)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** Greedy longest-match layers g1..gN over an existing `g0 (word, len,
    * pos, n)` and `pieces (piece, plen)`: each layer passes finished words
    * (pos >= len) through and advances every unfinished word by its
    * LONGEST matching piece (argmax via group-by max(plen)). A word with
    * NO matching piece at its position — an off-charset character — drops
    * out of the chain entirely: absence from the final layer's finished
    * set IS the `[UNK]` verdict, mirroring the expression's
    * discard-partial-matches rule. MATERIALIZED: each layer references its
    * predecessor twice, so default CTE inlining would expand 2^N copies of
    * the base scan. */
  /** `sfx` disambiguates the CTE names so several greedy chains (one per
    * swept vocabulary size in q151) coexist in one statement. */
  private def greedyCtes(layers: Int, sfx: String = ""): String =
    (1 to layers).map { i =>
      s"""g$i$sfx AS MATERIALIZED (
         |  SELECT word, len, pos, n FROM g${i - 1}$sfx WHERE pos >= len
         |  UNION ALL
         |  SELECT g.word, g.len, g.pos + max(p.plen) AS pos,
         |    g.n + 1 AS n
         |  FROM g${i - 1}$sfx g JOIN pieces$sfx p
         |    ON substr(g.word, g.pos + 1, p.plen) = p.piece
         |  WHERE g.pos < g.len
         |  GROUP BY g.word, g.len, g.pos, g.n)""".stripMargin
    }.mkString(",\n")

  /** Piece-EMITTING greedy chain `gA1..gAN / g1..gN` over `g0$sfx` and
    * `pieces$sfx`: like [[greedyCtes]], but each layer's advancing arm is
    * its own CTE exposing the consumed piece (`substr(word, pos+1,
    * max(plen))` — an expression of grouping columns and the aggregate, so
    * it rides the same argmax GROUP BY). [[usedCte]] unions the arms into
    * the per-word piece-instance stream the usage measurement sums over.
    */
  private def greedyUsageCtes(layers: Int, sfx: String): String =
    (1 to layers).map { i =>
      s"""gA$i$sfx AS MATERIALIZED (
         |  SELECT g.word, g.len, g.pos + max(p.plen) AS pos,
         |    g.n + 1 AS n,
         |    substr(g.word, g.pos + 1, max(p.plen)) AS piece
         |  FROM g${i - 1}$sfx g JOIN pieces$sfx p
         |    ON substr(g.word, g.pos + 1, p.plen) = p.piece
         |  WHERE g.pos < g.len
         |  GROUP BY g.word, g.len, g.pos, g.n),
         |g$i$sfx AS MATERIALIZED (
         |  SELECT word, len, pos, n FROM g${i - 1}$sfx WHERE pos >= len
         |  UNION ALL
         |  SELECT word, len, pos, n FROM gA$i$sfx)""".stripMargin
    }.mkString(",\n")

  /** `used$sfx (word, piece)` — every consumed piece instance of every
    * word in the [[greedyUsageCtes]] chain. */
  private def usedCte(layers: Int, sfx: String): String = {
    val arms = (1 to layers)
      .map(i => s"SELECT word, piece FROM gA$i$sfx")
      .mkString("\n  UNION ALL ")
    s"used$sfx AS (\n  $arms)"
  }

  /** The exported inference piece set as a CTE: merged symbols from each
    * fit layer (UNION dedupes collisions) plus the 36 charset chars. */
  private def piecesCte(k: Int, sfx: String = ""): String = {
    val arms = (1 to k).map(i => s"SELECT l || r AS piece FROM b$i")
      .mkString("\n  UNION ")
    s"""pieces$sfx AS MATERIALIZED (SELECT piece, length(piece) AS plen FROM (
       |  $arms
       |  UNION SELECT unnest(regexp_extract_all(
       |    'abcdefghijklmnopqrstuvwxyz0123456789', '.')) AS piece))"""
      .stripMargin
  }

  override def oracles: Map[String, String] = Map(

    "q132_bpe_merges" -> {
      val k = 8
      val arms = (1 to k).map(i =>
        s"""SELECT CAST($i AS BIGINT) AS "rank", l AS "left", r AS "right",
           |  l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM b$i"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"WITH ${bpeCtes(k)}\n$arms"
    },

    "q142_bpe_wordpiece_roundtrip" -> {
      val k = 8
      // greedy longest-match replayed as MaxWordLen unrolled layers over
      // the TRAINED word table (every word in f0 is in-charset, and every
      // single char is a piece, so no word ever stalls here — the stall
      // path only fires in q145's raw-word oracle)
      s"""WITH ${bpeCtes(k)},
         |${piecesCte(k)},
         |g0 AS (SELECT word, length(word) AS len, 0 AS pos, 0 AS n
         |  FROM f0),
         |${greedyCtes(graft.ext.Bpe.MaxWordLen)},
         |wp AS (SELECT word, n AS wp_n FROM g${graft.ext.Bpe.MaxWordLen}),
         |bpe AS (SELECT word,
         |  length(sym) - length(replace(sym, '(', '')) AS bpe_n FROM w$k),
         |wn AS (SELECT bpe.word, bpe.bpe_n, wp.wp_n
         |  FROM bpe JOIN wp ON bpe.word = wp.word),
         |dw AS (SELECT doc_id, unnest(${TextSql.words}) AS word
         |  FROM documents)
         |SELECT CAST(dw.doc_id AS BIGINT) AS doc_id,
         |  CAST(sum(coalesce(wn.bpe_n, 1)) AS BIGINT) AS bpe_tokens,
         |  CAST(sum(coalesce(wn.wp_n, 1)) AS BIGINT) AS wp_tokens,
         |  CAST(sum(CASE WHEN coalesce(wn.bpe_n, 1) != coalesce(wn.wp_n, 1)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS disagree_words
         |FROM dw LEFT JOIN wn ON dw.word = wn.word
         |GROUP BY 1""".stripMargin
    },

    "q145_vocab_coverage" -> {
      val k = 8
      val maxLen = graft.ext.Bpe.MaxCoverageWordLen
      // raw augmented word stream (normalize, split, length cap only — no
      // training-bounds filter: off-charset words MUST reach the greedy
      // matcher so its [UNK] path is what the oracle replays); greedy runs
      // once per DISTINCT word, UNK = absent from the final layer's
      // finished set (the stall-drop rule of greedyCtes), UNK words count
      // 1 token — exactly WordpieceOps.wordTokens' contract
      val aug = "text || ' doc-' || CAST(doc_id AS VARCHAR) || ' ' || " +
        "source || '#' || lang"
      val norm =
        s"lower(trim(regexp_replace($aug, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
      s"""WITH ${bpeCtes(k)},
         |${piecesCte(k)},
         |cw AS (SELECT source, word FROM (
         |  SELECT source, unnest(list_filter(string_split($norm, ' '),
         |    x -> x != '')) AS word FROM documents)
         |  WHERE length(word) <= $maxLen),
         |dwords AS (SELECT DISTINCT word FROM cw),
         |g0 AS (SELECT word, length(word) AS len, 0 AS pos, 0 AS n
         |  FROM dwords),
         |${greedyCtes(maxLen)},
         |fin AS (SELECT word, n FROM g$maxLen WHERE pos >= len),
         |wr AS (SELECT d.word, coalesce(fin.n, 1) AS wp_n,
         |    CASE WHEN fin.word IS NULL THEN 1 ELSE 0 END AS unk
         |  FROM dwords d LEFT JOIN fin ON d.word = fin.word)
         |SELECT cw.source AS source,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(wr.unk) AS BIGINT) AS unk_words,
         |  CAST(sum(wr.wp_n) AS BIGINT) AS wp_tokens,
         |  CAST(count(DISTINCT CASE WHEN wr.unk = 1 THEN cw.word END)
         |    AS BIGINT) AS unk_vocab,
         |  CAST((sum(wr.unk) * 1000) // count(*) AS BIGINT) AS unk_permille
         |FROM cw JOIN wr ON cw.word = wr.word
         |GROUP BY 1""".stripMargin
    },

    "q151_vocab_size_sweep" -> {
      val ks = Seq(8, 32, 128)
      val maxLen = graft.ext.Bpe.MaxCoverageWordLen
      val aug = "text || ' doc-' || CAST(doc_id AS VARCHAR) || ' ' || " +
        "source || '#' || lang"
      val norm =
        s"lower(trim(regexp_replace($aug, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
      // one 128-round fit replay; per swept k, an independent piece set
      // from b1..bk and its own greedy chain (suffixed CTE names)
      val perK = ks.map { k =>
        val sfx = s"k$k"
        s"""${piecesCte(k, sfx)},
           |g0$sfx AS (SELECT word, length(word) AS len, 0 AS pos, 0 AS n
           |  FROM dwords),
           |${greedyCtes(maxLen, sfx)},
           |fin$sfx AS (SELECT word, n FROM g$maxLen$sfx WHERE pos >= len),
           |wr$sfx AS (SELECT d.word, coalesce(f.n, 1) AS wp_n,
           |    CASE WHEN f.word IS NULL THEN 1 ELSE 0 END AS unk
           |  FROM dwords d LEFT JOIN fin$sfx f ON d.word = f.word)"""
          .stripMargin
      }.mkString(",\n")
      val arms = ks.map { k =>
        s"""SELECT CAST($k AS BIGINT) AS n_merges, cw.source AS source,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(wr.unk) AS BIGINT) AS unk_words,
           |  CAST(sum(wr.wp_n) AS BIGINT) AS wp_tokens,
           |  CAST(count(DISTINCT CASE WHEN wr.unk = 1 THEN cw.word END)
           |    AS BIGINT) AS unk_vocab,
           |  CAST((sum(wr.unk) * 1000) // count(*) AS BIGINT)
           |    AS unk_permille
           |FROM cw JOIN wrk$k wr ON cw.word = wr.word
           |GROUP BY 1, 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${bpeCtes(128)},
         |cw AS MATERIALIZED (SELECT source, word FROM (
         |  SELECT source, unnest(list_filter(string_split($norm, ' '),
         |    x -> x != '')) AS word FROM documents)
         |  WHERE length(word) <= $maxLen),
         |dwords AS (SELECT DISTINCT word FROM cw),
         |$perK
         |$arms""".stripMargin
    },

    "q154_vocab_prune" -> {
      val k = 32
      val maxLen = graft.ext.Bpe.MaxCoverageWordLen
      val trainLen = graft.ext.Bpe.MaxWordLen
      val aug = "text || ' doc-' || CAST(doc_id AS VARCHAR) || ' ' || " +
        "source || '#' || lang"
      val norm =
        s"lower(trim(regexp_replace($aug, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
      val msymArms = (1 to k).map(i => s"SELECT l || r AS piece FROM b$i")
        .mkString("\n  UNION ")
      // pruned piece set: charset chars unconditionally + merged symbols
      // clearing the 2-permille usage threshold (integer arithmetic on
      // both sides — the Spark operator compares usage*1000 >= total*2)
      val piecesP =
        s"""piecesp AS MATERIALIZED (SELECT piece, length(piece) AS plen FROM (
           |  SELECT piece FROM keepm
           |  UNION SELECT unnest(regexp_extract_all(
           |    'abcdefghijklmnopqrstuvwxyz0123456789', '.')) AS piece))"""
          .stripMargin
      def arm(variant: String, sfx: String, pieces: String) =
        s"""SELECT '$variant' AS variant, cw.source AS source,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(wr.unk) AS BIGINT) AS unk_words,
           |  CAST(sum(wr.wp_n) AS BIGINT) AS wp_tokens,
           |  CAST(count(DISTINCT CASE WHEN wr.unk = 1 THEN cw.word END)
           |    AS BIGINT) AS unk_vocab,
           |  CAST((sum(wr.unk) * 1000) // count(*) AS BIGINT)
           |    AS unk_permille,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $pieces) AS n_pieces,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $pieces
           |   WHERE plen > 1) AS n_merges_kept
           |FROM cw JOIN wr$sfx wr ON cw.word = wr.word
           |GROUP BY 1, 2""".stripMargin
      def coverage(sfx: String) =
        s"""g0$sfx AS (SELECT word, length(word) AS len, 0 AS pos, 0 AS n
           |  FROM dwords),
           |${greedyCtes(maxLen, sfx)},
           |fin$sfx AS (SELECT word, n FROM g$maxLen$sfx WHERE pos >= len),
           |wr$sfx AS (SELECT d.word, coalesce(f.n, 1) AS wp_n,
           |    CASE WHEN f.word IS NULL THEN 1 ELSE 0 END AS unk
           |  FROM dwords d LEFT JOIN fin$sfx f ON d.word = f.word)"""
          .stripMargin
      s"""WITH ${bpeCtes(k)},
         |${piecesCte(k, "u")},
         |g0u AS (SELECT word, length(word) AS len, 0 AS pos, 0 AS n
         |  FROM f0),
         |${greedyUsageCtes(trainLen, "u")},
         |${usedCte(trainLen, "u")},
         |tot AS MATERIALIZED (SELECT sum(wc) AS t FROM f0),
         |msym AS MATERIALIZED (SELECT DISTINCT piece FROM (
         |  $msymArms)),
         |usg AS MATERIALIZED (SELECT u.piece, sum(f.wc) AS uc FROM usedu u
         |  JOIN f0 f ON u.word = f.word GROUP BY 1),
         |keepm AS MATERIALIZED (SELECT m.piece FROM msym m
         |  JOIN usg ON m.piece = usg.piece CROSS JOIN tot
         |  WHERE usg.uc * 1000 >= tot.t * 2),
         |${piecesCte(k, "f")},
         |$piecesP,
         |cw AS MATERIALIZED (SELECT source, word FROM (
         |  SELECT source, unnest(list_filter(string_split($norm, ' '),
         |    x -> x != '')) AS word FROM documents)
         |  WHERE length(word) <= $maxLen),
         |dwords AS (SELECT DISTINCT word FROM cw),
         |${coverage("f")},
         |${coverage("p")}
         |${arm("full", "f", "piecesf")}
         |UNION ALL
         |${arm("pruned", "p", "piecesp")}""".stripMargin
    },

    // base-slice fit (bpeCtes over doc_id % 10 != 9), one greedy chain
    // over the UNION's distinct words, conditional per-slice rollups —
    // the whole drift arithmetic (permilles, deltas, flag) under the hash
    "q180_vocab_drift" -> {
      val k = 8
      val maxLen = graft.ext.Bpe.MaxCoverageWordLen
      val aug = "text || ' doc-' || CAST(doc_id AS VARCHAR) || ' ' || " +
        "source || '#' || lang"
      val norm =
        s"lower(trim(regexp_replace($aug, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
      s"""WITH ${bpeCtes(k,
           "(SELECT * FROM documents WHERE (doc_id // 20) % 10 != 9)")},
         |${piecesCte(k)},
         |cw AS MATERIALIZED (SELECT (doc_id // 20) % 10 = 9 AS is_batch, source,
         |    word FROM (
         |  SELECT doc_id, source, unnest(list_filter(string_split($norm, ' '),
         |    x -> x != '')) AS word FROM documents)
         |  WHERE length(word) <= $maxLen),
         |dwords AS MATERIALIZED (SELECT DISTINCT word FROM cw),
         |g0 AS (SELECT word, length(word) AS len, 0 AS pos, 0 AS n
         |  FROM dwords),
         |${greedyCtes(maxLen)},
         |fin AS (SELECT word, n FROM g$maxLen WHERE pos >= len),
         |wr AS MATERIALIZED (SELECT d.word, coalesce(fin.n, 1) AS wp_n,
         |    CASE WHEN fin.word IS NULL THEN 1 ELSE 0 END AS unk
         |  FROM dwords d LEFT JOIN fin ON d.word = fin.word),
         |agg AS (SELECT cw.source AS source,
         |    CAST(sum(CASE WHEN NOT is_batch THEN 1 ELSE 0 END) AS BIGINT)
         |      AS base_n_words,
         |    CAST(sum(CASE WHEN NOT is_batch THEN wr.unk ELSE 0 END)
         |      AS BIGINT) AS bu,
         |    CAST(sum(CASE WHEN NOT is_batch THEN wr.wp_n ELSE 0 END)
         |      AS BIGINT) AS bw,
         |    CAST(sum(CASE WHEN is_batch THEN 1 ELSE 0 END) AS BIGINT)
         |      AS batch_n_words,
         |    CAST(sum(CASE WHEN is_batch THEN wr.unk ELSE 0 END) AS BIGINT)
         |      AS nu,
         |    CAST(sum(CASE WHEN is_batch THEN wr.wp_n ELSE 0 END) AS BIGINT)
         |      AS nw
         |  FROM cw JOIN wr ON cw.word = wr.word GROUP BY 1),
         |pm AS (SELECT source, base_n_words, batch_n_words,
         |    CASE WHEN base_n_words > 0 THEN (bu * 1000) // base_n_words
         |      END AS base_unk_permille,
         |    CASE WHEN batch_n_words > 0 THEN (nu * 1000) // batch_n_words
         |      END AS batch_unk_permille,
         |    CASE WHEN base_n_words > 0 THEN (bw * 1000) // base_n_words
         |      END AS base_fertility_permille,
         |    CASE WHEN batch_n_words > 0 THEN (nw * 1000) // batch_n_words
         |      END AS batch_fertility_permille
         |  FROM agg)
         |SELECT source, base_n_words, batch_n_words,
         |  base_unk_permille, batch_unk_permille,
         |  base_fertility_permille, batch_fertility_permille,
         |  batch_unk_permille - base_unk_permille AS unk_drift_permille,
         |  batch_fertility_permille - base_fertility_permille
         |    AS fertility_drift_permille,
         |  CAST(coalesce(
         |    abs(batch_unk_permille - base_unk_permille) >= 50 OR
         |    abs(batch_fertility_permille - base_fertility_permille) >= 50,
         |    false) AS BIGINT) AS refit_flag
         |FROM pm""".stripMargin
    },

    "q133_bpe_token_counts" ->
      s"""WITH ${bpeCtes(8)},
         |dw AS (SELECT doc_id, unnest(${TextSql.words}) AS word
         |  FROM documents)
         |SELECT CAST(dw.doc_id AS BIGINT) AS doc_id,
         |  CAST(sum(CASE WHEN w8.word IS NULL THEN 1
         |    ELSE length(w8.sym) - length(replace(w8.sym, '(', '')) END)
         |    AS BIGINT) AS bpe_tokens,
         |  CAST(count(*) AS BIGINT) AS ws_tokens
         |FROM dw LEFT JOIN w8 ON dw.word = w8.word
         |GROUP BY 1""".stripMargin,

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
    },

    // both recursive tokenizer replays under one WITH RECURSIVE: the
    // greedy WordPiece CTEs (dw/tk/wp) and the Viterbi DP CTEs
    // (u_dw/u_dp/ug), joined to the per-occurrence word stream
    "q174_unigram_tokens" ->
      s"""WITH RECURSIVE
         |${WordpieceSql.tokenCtes(graft.ext.TextAnalysis.WordpieceVocab)},
         |${UnigramSql.segCtes(graft.ext.TextAnalysis.UnigramVocab,
              graft.ext.TextAnalysis.UnigramUnkScore)},
         |dwords AS (SELECT doc_id, unnest(${TextSql.words}) AS w
         |  FROM documents),
         |cnt AS (SELECT dwords.doc_id,
         |    CAST(sum(wp.ntok) AS BIGINT) AS wp_tokens,
         |    CAST(sum(ug.ntok) AS BIGINT) AS ug_tokens,
         |    CAST(sum(ug.score) AS BIGINT) AS ug_score
         |  FROM dwords JOIN wp USING (w) JOIN ug USING (w) GROUP BY 1)
         |SELECT d.doc_id, d.lang,
         |  coalesce(cnt.wp_tokens, 0) AS wp_tokens,
         |  coalesce(cnt.ug_tokens, 0) AS ug_tokens,
         |  coalesce(cnt.ug_score, 0) AS ug_score
         |FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id""".stripMargin
  )
}
