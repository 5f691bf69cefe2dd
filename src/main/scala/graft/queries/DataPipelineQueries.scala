package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, Skew, TextAnalysis}
import graft.sources.Tables

/** LLM-training-data pipeline coverage over `documents` and `embeddings`:
  * dedup (exact / n-gram Jaccard / MinHash LSH / SimHash), similarity search
  * (exact and IVF-bucketed cosine top-k), text quality analysis, and
  * multimodal binary-payload plumbing.
  *
  * Every query here carries a cell-exact DuckDB oracle — including the
  * hash-family-dependent ones: MinHash/SimHash run `portable = true`
  * (code-point FNV-1a 64, [[graft.plans.Fnv1a64Expression]]), whose HUGEINT
  * mod-2⁶⁴ re-spelling in the oracle SQL is bit-identical, and the IVF path
  * uses the scaled-integer cosine of [[graft.ext.Similarity]].
  */
object DataPipelineQueries extends Catalog {

  // explicit whitespace class: Java \s includes \x0B, RE2 \s does not
  private val normSql = TextSql.norm
  private val wordsSql = TextSql.words

  /** Shared CTE chain of the guarded word-3-gram Jaccard pipeline
    * (Dedup.jaccardPairs with maxShingleDf = 5): shingles -> doc sizes ->
    * df-guarded candidate generation -> true intersection counts. Used by
    * the q22 oracle (pair similarity) and the q54 oracle (connected
    * components over the qualifying pairs).
    */
  private lazy val jaccardCtes: String =
    s"""w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |idx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
       |        FROM w WHERE len(ws) >= 3),
       |sh AS (SELECT DISTINCT doc_id,
       |         array_to_string(ws[i+1:i+3], ' ') AS shingle FROM idx),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |gen AS (SELECT doc_id, shingle FROM (
       |          SELECT doc_id, shingle,
       |            count(*) OVER (PARTITION BY shingle) AS df FROM sh)
       |        WHERE df <= 5),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM gen a JOIN gen b USING (shingle)
       |         WHERE a.doc_id < b.doc_id),
       |inter AS (SELECT id_a, id_b, count(*) AS inter
       |          FROM cand
       |          JOIN sh sa ON sa.doc_id = id_a
       |          JOIN sh sb ON sb.doc_id = id_b AND sb.shingle = sa.shingle
       |          GROUP BY 1, 2)""".stripMargin
  private val stopListSql =
    TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup: one shuffle on the normalized-text fingerprint -------
    "q21_exact_dup_groups" -> ((s, d) => {
      // plain scan (round 12): one consumer, and the fp windows bring
      // their own exchange — the widen was pure cost here (sidecar r9 vs
      // r11: wall 0.18->0.39 s AND CPU 0.1->5.0 s, no axis won)
      Dedup.exactDupGroups(Tables.documents(s, d), "doc_id", "text")
    }),

    // ---- n-gram Jaccard near-dup via shingle inverted index ----------------
    // maxShingleDf = 5: the stop-shingle guard is the 100 TB contract (per-
    // shingle df² is the blow-up); 5 actually bites on this corpus (max df is
    // 7 at sf0.01, 25 at sf0.1), so the guarded branch — candidate generation
    // without hot shingles, true-Jaccard recount adding the hot contribution
    // back — is exercised and oracle-pinned at every scale the driver runs.
    // PLAIN scan (round 12): the multi-subtree jaccardPairs chain replays
    // the widen exchange per subtree — sidecar r9 (plain) vs r11 (hash
    // widen): q22 wall 2.0→5.1 s, CPU 5.1→77.5 s in full-catalog context;
    // the round-12 four-config A/B (hash/off/global-pin/shingle-pin,
    // BENCH_SF1.json widen_ab_r12) found no widen-keeping config that
    // recovers the CPU, so this family reverts like q130/q131 did
    "q22_jaccard_near_dups" -> ((s, d) => {
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"), col("inter").as("shared"),
          (floor(col("jaccard") * 1e6 + 0.5) / 1e6).as("jaccard"))
    }),

    // ---- tf-weighted cosine near-dup pairs ---------------------------------
    // the bag-of-words cosine tier between q22's set-Jaccard (multiplicity-
    // blind) and the embedding cosines (q35): catches "same text, one
    // paragraph doubled". Integer certificate — den·dot² >= num·n2_a·n2_b
    // with τ² = 1/2 (cos >= 0.707) — so the score hash-checks with no sqrt
    // anywhere. Two mirrored guards: the corpus-RELATIVE vocabulary cap
    // (df <= 10% of N — an absolute cap stops discriminating as the
    // corpus grows, the X61 lesson) defines the metric, and candidates
    // come from the tf-WEIGHTED prefix filter (the Bayardo/Chaudhuri
    // All-Pairs bound in integers): each doc indexes its rarest kept
    // terms under the global (df, term) order until the remaining
    // suffix's squared norm drops below τ²·n2 — PROVABLY complete at
    // cos ≥ τ (lemma in the Dedup.cosinePairs scaladoc), so the result
    // is the CANONICAL pair set and the oracle runs the plain
    // all-shared-term formulation: the filter is checked, not mirrored
    // (the q100 posture; the round-7/8 fixed k-rarest prefix was
    // complete only heuristically). The verified dot spans the full
    // kept vocabulary via per-doc term maps. On corpora where rarity
    // does not discriminate, the scale tier is q141's signature LSH
    // over the tf vector + this same exact verify.
    "q134_cosine_near_dups" -> ((s, d) => {
      Dedup.cosinePairs(Tables.documents(s, d), "doc_id", "text",
        minCos2Num = 1L, minCos2Den = 2L, maxDfPermille = 100L)
    }),

    // ---- prefix-filtered similarity join (All-Pairs / PPJoin family) -------
    // the candidate-generation tier ABOVE q22's full inverted index for
    // high thresholds: each doc indexes only its |d| − ceil(τ·|d|) + 1
    // RAREST shingles under a global (df, shingle) order, so candidates
    // meet in a prefix-index equi-join (prefix-df² per key, not df²) and
    // hot shingles fall out of every prefix organically — no cutoff
    // parameter, no recount split, provably zero recall loss (lemma in
    // the Dedup scaladoc). The oracle runs the PLAIN all-shared-shingle
    // formulation: the filter must be invisible. At sf0.01, τ = 0.4 keeps
    // 15,985 of 26,136 postings in the prefix index and generates 1,842
    // candidate pairs where the full index generates 11,533 (6.3×); the
    // gap widens with τ (prefix fraction ≈ 1−τ) and with corpus-level
    // shingle skew (hot shingles leave every prefix). Round 10 added
    // ppjoin's POSITIONAL filter on top (recall-exact — the
    // first-common-element bound, proof at the filter): 1,842 → 114
    // candidates at sf0.01, and at sf10 — where the replication fixture
    // grows per-term posting density and the verify mass had gone 12×
    // superlinear — wall drops 247.9 → 152.8 s with every stage still
    // balanced (the remaining cost is true candidate intersect CPU).
    // shingles ride FNV-hashed to longs (wordShingleHashes — the X21 trick
    // at the word grain): the prefix ORDER becomes (df, hash) instead of
    // (df, shingle), which changes only WHICH prefix set generates each
    // candidate, never the verified result — and the verify join's
    // exchanges and hash probes move 8-byte keys (measured at sf1: the
    // string-keyed verify join was ~40 s / ~1300 s CPU, memory-bandwidth
    // bound on string comparison)
    "q100_prefix_jaccard" -> ((s, d) => {
      // plain scan: the q22 widen-replay revert (widen_ab_r12)
      Dedup.prefixJaccardPairsFromShingles(
          Dedup.wordShingleHashes(Tables.documents(s, d), "doc_id", "text",
            n = 3),
          "doc_id", minJaccard = 0.4)
        .select(col("id_a"), col("id_b"), col("inter").as("shared"),
          (floor(col("jaccard") * 1e6 + 0.5) / 1e6).as("jaccard"))
    }),

    // ---- tf-cosine near-dups via signature LSH (q134's scale tier) ---------
    // the answer to q134's measured limit, implemented: candidates are
    // pairs whose tf-weighted simhashes differ in <= 3 bits (angle LSH —
    // candidate count tracks ANGLE, not term sharing, so vocabulary
    // degeneracy cannot blow it up), verified with the exact integer
    // cosine over the FULL vocabulary at τ² = 9/10 — the near-dup
    // threshold where signatures genuinely discriminate (expected
    // hamming ≈ 64·θ/π ≈ 6.5 bits at 18°). Recall contract = the
    // signature's (the q23/q27 LSH posture); precision exact. The oracle
    // re-derives signatures from the portable FNV hash and takes ALL
    // pairs at hamming <= 3 — bucketing must be invisible.
    "q141_cosine_simhash_near_dups" -> ((s, d) => {
      Dedup.cosineNearDupsSimhash(Tables.documentsWide(s, d), "doc_id", "text",
        minCos2Num = 9L, minCos2Den = 10L, maxHamming = 3, portable = true)
    }),

    // ---- multi-pass sorted-neighborhood blocking (ER candidates) -----------
    // the fuzzy-key entity-resolution generator (Hernández–Stolfo) over
    // 32-char document "titles" (normalized-text prefixes): block by the
    // key's first 4 chars, slide a 5-window inside each block, SECOND pass
    // on the reversed key (the textbook fix for first-char divergence),
    // union, dedupe, verify with exact levenshtein <= 8 — both engines
    // share the DP metric, so candidates-only machinery, exact precision.
    // One window exchange per pass, lead()-materialized neighbors, no
    // rank self-join, no global sort.
    "q138_sorted_neighborhood" -> ((s, d) => {
      // plain scan (round 12): the block-key windows re-sort anyway and
      // the widen lost BOTH axes (sidecar wall 0.62->0.88 s, CPU
      // 0.6->6.5 s r9 vs r11)
      Dedup.sortedNeighborhoodPairs(
        Tables.documents(s, d).select(col("doc_id"),
          substring(Dedup.normalizeText(col("text")), 1, 32).as("title")),
        "doc_id", "title", blockLen = 4, windowSize = 5, maxDist = 8)
    }),

    // ---- MinHash + LSH banded near-dup (scale path) ------------------------
    // portable = true: signatures use FNV-1a 64, re-spelled in the oracle's
    // HUGEINT arithmetic, so the banded-LSH candidate set and the verified
    // Jaccard are hash-checked cross-engine, not rows-only.
    "q23_minhash_near_dups" -> ((s, d) => {
      Dedup.minHashNearDups(Tables.documentsWide(s, d), "doc_id", "text",
          n = 3, numHashes = 64, bands = 16, minJaccard = 0.5, portable = true)
        .select(col("id_a"), col("id_b"),
          (floor(col("jaccard") * 1e6 + 0.5) / 1e6).as("jaccard"))
    }),

    // ---- cross-frame LSH incremental dedup (batch × corpus) ----------------
    // q69's near tier goes through the shingle inverted index, whose
    // candidate count grows with per-shingle df_A·df_B — fine for small
    // daily batches, not when the batch itself is huge. This is the LSH
    // tier: corpus band buckets are computed once (persistable), the batch
    // only pays its own banding, and candidates meet inside (band, bucket)
    // groups. Same portable FNV family as q23 so the banded candidate set
    // is hash-checked cross-engine.
    "q74_cross_lsh_dedup" -> ((s, d) => {
      // pinned widen: incoming + corpus arms each shingle the same scan
      // (round-11 A/B: 1.39 -> 1.00 s pinned vs 1.85 plain)
      val docs = graft.ext.Caches.pin(Tables.documentsWide(s, d))
      val incoming = docs.filter(col("doc_id") % 10 === 7)
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      Dedup.crossMinHashNearDups(
          // hashed shingle grain (round-16): long keys through the band
          // join, both verify joins, and the size aggregates; signatures
          // reuse the hash as their FNV base — bit-identical (see
          // minHashSignaturesFromShingles)
          Dedup.wordShingleHashes(incoming, "doc_id", "text", n = 3),
          Dedup.wordShingleHashes(corpus, "doc_id", "text", n = 3),
          "doc_id", numHashes = 64, bands = 16, minJaccard = 0.5,
          portable = true)
        .select(col("id_a"), col("id_b"),
          (floor(col("jaccard") * 1e6 + 0.5) / 1e6).as("jaccard"))
    }),

    // ---- intra-document repetition signals (Gopher-style quality rules) ---
    // repetitious docs (boilerplate, keyword stuffing) are a top removal
    // class in web-scale curation: duplicate-token fraction, duplicate-
    // trigram fraction, and top-token mass, all per-row array expressions —
    // no shuffle — with exact-int quotients quantized at 1e-6 on both sides
    "q80_repetition_signals" -> ((s, d) => {
      val q6 = (c: org.apache.spark.sql.Column) => floor(c * 1e6 + 0.5) / 1e6
      // gated widen (round 14; bound 4 MiB -> 512 KiB in round 16, re-
      // measured: 2.19 -> ~0.5 s at sf0.1): plain scan below the gate — the
      // zero-exchange
      // contract (PlanAuditSpec, pinned at sf0.001) and the round-11 A/B
      // win both live there — widened in the single-file mid-scale band,
      // where one parquet file under maxPartitionBytes serialized the
      // whole map-only stage on one core (sf1: 31.1 s wall / 27 CPU-s
      // plain -> ~3 s widened). wide()'s 1 GiB upper bound turns the
      // exchange back off at real scale, where the scan is wide on its
      // own — map-only work still never shuffles at 100 TB.
      Tables.documentsWideMapOnly(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__ts"))
        .select(col("doc_id"),
          size(col("__ts")).cast("long").as("n_tokens"),
          q6(TextAnalysis.dupTokenRatio(col("__ts"))).as("dup_token_ratio"),
          q6(TextAnalysis.dupNgramRatio(col("__ts"), 3))
            .as("dup_trigram_ratio"),
          q6(TextAnalysis.topTokenRatio(col("__ts"))).as("top_token_ratio"))
    }),

    // ---- benchmark decontamination (eval n-gram overlap) -------------------
    // the "training doc contains eval n-grams" check (the 13-gram rule of
    // GPT-3-style reports, scaled to this corpus's 5-grams): every 25th doc
    // plays the benchmark; a corpus doc is contaminated when it shares >= 3
    // distinct 5-grams with any benchmark doc. The overlap join is the
    // cross-frame shingle inverted index — never corpus x benchmark.
    "q81_decontamination" -> ((s, d) => {
      val docs = Tables.documentsWide(s, d)
      // hashed 5-gram grain (round-16): the inverted-index join between
      // corpus and benchmark sides moves 8-byte keys; output is counts
      val sh = Dedup.wordShingleHashes(docs, "doc_id", "text", n = 5)
      val hits = Dedup.contaminationOverlap(
          sh.filter(col("doc_id") % 25 =!= 11),
          sh.filter(col("doc_id") % 25 === 11), "doc_id")
        .filter(col("overlap") >= 3)
        .groupBy(col("id_a").as("doc_id"))
        .agg(count(lit(1)).as("n_bench_hits"),
          max(col("overlap")).as("max_overlap"))
      docs.filter(col("doc_id") % 25 =!= 11).select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bench_hits"), lit(0L)).as("n_bench_hits"),
          coalesce(col("max_overlap"), lit(0L)).as("max_overlap"),
          (col("n_bench_hits").isNotNull).cast("int").as("contaminated"))
    }),

    // ---- incremental duplicate-cluster maintenance (batch into labels) -----
    // the third leg of the incremental-dedup story: q69/q74 generate the
    // batch's candidate PAIRS without self-joining the corpus; this folds
    // those pairs into the EXISTING cluster labeling without re-reading the
    // historical pair graph. Prior state is the (id, component) output of a
    // previous ConnectedComponents run — star edges, |vertices|-sized — so
    // the daily update pays |labels| + |batch edges|, never the original
    // quadratic-ish pair count. Bridging events (a new doc near-dup to TWO
    // existing clusters merges them) are handled by construction. The oracle
    // closes over all three pair sets at once — an independent whole-graph
    // recursive-CTE path that must agree with the two-step merge exactly.
    "q76_incremental_clusters" -> ((s, d) => {
      // deliberately NOT documentsWide: the shingle frames feed ~10
      // unpinned subtrees (see below), so a widen exchange replays ~10×
      // — measured at sf0.1 isolated (median-of-5, one JVM per variant):
      // widened 11.7 s / plain 9.4 s, and +6 CPU-s for the extra
      // round-robin string shuffles. The starved first scan stage is
      // amortized across subtrees the same way the recompute is.
      val docs = Tables.documents(s, d)
      val incoming = docs.filter(col("doc_id") % 10 === 7)
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      // the shingle frames feed ~10 subtrees (sizes/df/gen/inter across
      // three pair pipelines). Round-12 measured Caches.pin here at
      // 35.0 s vs 15.7 s recomputed — the ROW-CACHE materialization +
      // reads cost more than re-running the codegen'd explode per
      // subtree. The round-16 lazy localCheckpoint is the cheaper pin the
      // hashed grain enabled (16-byte rows, no cache layer, jobs flat):
      // each frame's serialized explode evaluates once instead of per
      // subtree — measured 9.3 → 7.9 s wall / 9.8 → 7.1 CPU-s at sf0.1.
      // hashed shingle grain (round-16, the q22-family switch): all ~10
      // subtrees' exchanges and probes move longs instead of 3-word strings
      val shA = Dedup.wordShingleHashes(incoming, "doc_id", "text", n = 3)
        .localCheckpoint(false)
      val shB = Dedup.wordShingleHashes(corpus, "doc_id", "text", n = 3)
        .localCheckpoint(false)
      val prior = graft.operators.ConnectedComponents.run(
        Dedup.jaccardPairsFromShingles(shB, "doc_id",
            minJaccard = 0.1, maxShingleDf = 5L)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      val cross = Dedup.crossJaccardPairs(shA, shB, "doc_id",
          minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"))
      val within = Dedup.jaccardPairsFromShingles(shA, "doc_id",
          minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"))
      graft.operators.ConnectedComponents.merge(prior, "id", "component",
          cross.unionByName(within), "id_a", "id_b")
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("component")))
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- frontier-only cluster fold against STORED labels ------------------
    // q76 merges batch pairs into prior labels by re-converging the WHOLE
    // |vertices|-sized star set; this is the fold-family posture applied
    // to the graph tier (round-16): the base labeling persists in the
    // content-keyed store (built once per corpus vintage, like every
    // fitted model), and a batch folds in FRONTIER-ONLY — components with
    // no batch endpoint ride a pass-through scan, the star rounds run
    // over the affected neighborhood ∪ batch edges only. At daily-batch
    // scale that is |touched clusters|, not |corpus| (measured
    // fold-vs-merge-vs-refit at sf1, BENCH_SF1 round16_updates). Output
    // adds the `touched` flag — the frontier itself is under the oracle
    // hash, which re-derives base components, batch endpoints, touched
    // roots, AND the final whole-graph closure from scratch.
    "q187_cc_fold" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val incoming = docs.filter(col("doc_id") % 10 === 7)
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      // hashed shingle grain (round-16): the batch-edge generators move
      // 8-byte keys end to end (the q22-family switch)
      val shA = Dedup.wordShingleHashes(incoming, "doc_id", "text", n = 3)
        .localCheckpoint(false)
      val shB = Dedup.wordShingleHashes(corpus, "doc_id", "text", n = 3)
        .localCheckpoint(false)
      val stored = Tables.ensureMaterialized(s, "cc_labels",
        Tables.contentKey(s"$d/documents.parquet", "j01df5base7"))(
        graft.operators.ConnectedComponents.run(
          Dedup.jaccardPairsFromShingles(shB, "doc_id",
              minJaccard = 0.1, maxShingleDf = 5L)
            .select(col("id_a"), col("id_b")),
          "id_a", "id_b"))
      val batchEdges = Dedup.crossJaccardPairs(shA, shB, "doc_id",
          minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"))
        .unionByName(Dedup.jaccardPairsFromShingles(shA, "doc_id",
            minJaccard = 0.1, maxShingleDf = 5L)
          .select(col("id_a"), col("id_b")))
      graft.operators.ConnectedComponents.fold(stored, "id", "component",
          batchEdges, "id_a", "id_b")
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("component")))
        .select(col("id").as("doc_id"), col("component"),
          col("cluster_size"), col("touched").cast("long").as("touched"))
    }),

    // ---- vertex retraction against the STORED labels + edges ---------------
    // q187's inverse (round-16): a takedown batch leaves the corpus, and
    // the stored clustering unfolds FRONTIER-ONLY — components containing
    // no retracted doc pass through untouched (their membership, hence
    // their min-id root, is unchanged), while touched components re-derive
    // from their surviving stored edges, including genuine SPLITS when the
    // retracted doc was a bridge. Labels alone are not invertible under
    // deletion (the stars discarded the internal structure a split depends
    // on), so the unfold keys on the stored base EDGES — persisted beside
    // the labels under the same content key, the posture every fitted
    // model in the maintenance family already has. The oracle re-derives
    // the base closure, the touched roots, AND the survivor closure from
    // scratch; the `touched` frontier itself is under the hash.
    "q188_cc_unfold" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val shB = Dedup.wordShingleHashes(corpus, "doc_id", "text", n = 3)
      val key = Tables.contentKey(s"$d/documents.parquet", "j01df5base7")
      val storedEdges = Tables.ensureMaterialized(s, "cc_edges", key)(
        Dedup.jaccardPairsFromShingles(shB, "doc_id",
            minJaccard = 0.1, maxShingleDf = 5L)
          .select(col("id_a"), col("id_b")))
      val stored = Tables.ensureMaterialized(s, "cc_labels", key)(
        graft.operators.ConnectedComponents.run(storedEdges, "id_a", "id_b"))
      val takedown = corpus.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id"))
      graft.operators.ConnectedComponents.unfold(stored, "id", "component",
          storedEdges, "id_a", "id_b", takedown, "doc_id")
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("component")))
        .select(col("id").as("doc_id"), col("component"),
          col("cluster_size"), col("touched").cast("long").as("touched"))
    }),

    // ---- takedown cascade: retraction through SURVIVORSHIP -----------------
    // The compliance pipeline end-to-end (q188 relabels; this repairs the
    // downstream artifact): a takedown can remove a cluster's kept
    // REPRESENTATIVE, so the survivor table must promote a replacement —
    // per surviving doc: its post-retraction cluster, the cluster's
    // representative under q162's (score DESC, doc_id ASC) policy, the
    // keep verdict, and `repaired` = 1 where the doc's representative
    // CHANGED vs the stored base survivorship (promotion after the old
    // survivor's takedown, or a re-rooted split). Frontier posture
    // throughout: untouched clusters join their STORED survivor row
    // (never re-scored), only touched clusters re-run the argmax — at
    // 100 TB the repair is O(touched neighborhood), not a corpus re-score.
    "q189_takedown_cascade" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val shB = Dedup.wordShingleHashes(corpus, "doc_id", "text", n = 3)
      val key = Tables.contentKey(s"$d/documents.parquet", "j01df5base7")
      val storedEdges = Tables.ensureMaterialized(s, "cc_edges", key)(
        Dedup.jaccardPairsFromShingles(shB, "doc_id",
            minJaccard = 0.1, maxShingleDf = 5L)
          .select(col("id_a"), col("id_b")))
      val stored = Tables.ensureMaterialized(s, "cc_labels", key)(
        graft.operators.ConnectedComponents.run(storedEdges, "id_a", "id_b"))
      val scoredAll = corpus.select(col("doc_id"),
        greatest(TextAnalysis.tokenCount(col("text")), lit(0L)).as("score"))
      // base survivorship, persisted beside the labels: one row per base
      // CLUSTER (argmax as a mergeable max(struct) aggregate, the q162
      // shape — model-sized, like every stored artifact in the family)
      val storedSurv = Tables.ensureMaterialized(s, "cc_surv", key)(
        scoredAll.join(stored.withColumnRenamed("id", "doc_id"),
            Seq("doc_id"))
          .groupBy("component")
          .agg(max(struct(col("score"), (-col("doc_id")).as("__nid")))
            .as("__b"))
          .select(col("component").as("old_canonical"),
            (-col("__b.__nid")).as("old_survivor")))
      val takedown = corpus.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id"))
      val relabeled = graft.operators.ConnectedComponents.unfold(
        stored, "id", "component", storedEdges, "id_a", "id_b",
        takedown, "doc_id")
      // surviving corpus under its post-retraction clusters; singletons
      // (never in the pair graph) are their own cluster, touched = 0
      val scored = graft.ext.Caches.pin(scoredAll
        .join(takedown, Seq("doc_id"), "left_anti")
        .join(relabeled.withColumnRenamed("id", "doc_id"),
          Seq("doc_id"), "left")
        .withColumn("canonical_id", coalesce(col("component"), col("doc_id")))
        .withColumn("touched", coalesce(col("touched"), lit(0)).cast("long"))
        .drop("component"))
      // repairs: ONLY touched clusters re-derive their representative
      val repaired = scored.filter(col("touched") === 1L)
        .groupBy("canonical_id")
        .agg(max(struct(col("score"), (-col("doc_id")).as("__nid")))
          .as("__b"))
        .select(col("canonical_id"), (-col("__b.__nid")).as("new_survivor"))
      // component roots partition the id space, so a touched cluster's
      // root never collides with an untouched one's: coalesce resolves
      // touched -> re-derived argmax, untouched clustered -> stored
      // survivor, singleton -> self
      scored
        .join(repaired, Seq("canonical_id"), "left")
        .join(stored.withColumnRenamed("id", "doc_id")
          .withColumnRenamed("component", "old_canonical"),
          Seq("doc_id"), "left")
        .join(storedSurv, Seq("old_canonical"), "left")
        .withColumn("survivor_id",
          coalesce(col("new_survivor"), col("old_survivor"), col("doc_id")))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("canonical_id")))
        .select(col("doc_id"), col("canonical_id"), col("cluster_size"),
          col("score"), col("survivor_id"),
          (col("doc_id") === col("survivor_id")).cast("long").as("kept"),
          (col("survivor_id") =!=
            coalesce(col("old_survivor"), col("doc_id")))
            .cast("long").as("repaired"),
          col("touched"))
    }),

    // ---- exact cosine top-k over embeddings (brute-force baseline) ---------
    "q25_knn_exact" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      Similarity.knnExact(vecs, vecs.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
          (floor(col("cosine") * 1e6 + 0.5) / 1e6).as("cosine"))
    }),

    // ---- hard-negative mining (contrastive-training pairs) -----------------
    // per anchor, the k most-similar vectors whose cosine is still BELOW
    // the positive cut (quantized boundary: floor(cos·10⁶+0.5) < 400000)
    // — the near-misses a contrastive loss learns from, with near-dup
    // "false negatives" excluded BEFORE the bounded top-k heap so they
    // never occupy slots. 0.4 bites on this corpus: several anchor pairs
    // sit at 0.40-0.45 at sf0.01 and fall to the exclusion.
    "q165_hard_negatives" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      Similarity.hardNegatives(vecs, vecs.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", "vec_id", "embedding",
          k = 3, maxCosMicro = 400000L)
        .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
          (floor(col("cosine") * 1e6 + 0.5) / 1e6).as("cosine"))
    }),

    // ---- IVF-bucketed approximate top-k (the 100 TB path) ------------------
    "q26_knn_ivf" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      Similarity.knnIvf(vecs, vecs.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", "vec_id", "embedding",
          centroids = vecs.filter(col("vec_id") % 50 === 7),
          "vec_id", "embedding", k = 5, nprobe = 3)
        .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
          (floor(col("cosine") * 1e6 + 0.5) / 1e6).as("cosine"))
    }),

    // ---- ANN recall@k: the IVF tier measured against the exact baseline ----
    // the number every ANN deployment tunes on (nprobe moves recall; this
    // MEASURES it instead of guessing): per sampled query, how many of the
    // exact top-10 neighbors the 3-probe IVF search also returned —
    // hits + recall in integer permille, hash-exact. The exact side is
    // the evaluation harness (|sample|·N work on the 2%-of-corpus query
    // sample), the IVF side the production path; recall ranks are set
    // membership only, so the join is (query, neighbor)-keyed with the
    // sample-sized approx frame broadcast.
    // embeddingsWide: the round-11 min-bytes gate makes this the plain
    // scan at bench scale (the A/B winner) AND the widened scan at sf1+
    // (the split-starvation regime) — the per-scale behavior the earlier
    // always-widen/always-plain A/B had to choose between
    "q146_ann_recall" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      val qs = vecs.filter(col("vec_id") % 50 === 0)
      val exact = Similarity.knnExact(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      val approx = Similarity.knnIvf(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding",
        centroids = vecs.filter(col("vec_id") % 50 === 7),
        "vec_id", "embedding", k = 10, nprobe = 3)
      Similarity.recallAtK(exact, approx, "query_id", "neighbor_id", k = 10)
    }),

    // ---- IVF-probed hard negatives, recall-graded (q165's scale tier) ------
    // q165's exact mining crosses the full corpus with the broadcast
    // anchors — right for bounded anchors, but the corpus scan is FULL;
    // this face probes nprobe=3 IVF cells per anchor (the q26 machinery)
    // with the same quantized positive cut applied before the top-k heap,
    // and GRADES the probe's recall against the exact tier with the q146
    // harness — the 100 TB posture (probed scan) with its price measured,
    // not assumed. Both sides mine k=10 negatives below cos_micro 400000.
    "q168_hard_negatives_ivf" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      val qs = vecs.filter(col("vec_id") % 50 === 0)
      val exact = Similarity.hardNegatives(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 10, maxCosMicro = 400000L)
      val approx = Similarity.hardNegativesIvf(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding",
        centroids = vecs.filter(col("vec_id") % 50 === 7),
        "vec_id", "embedding", k = 10, nprobe = 3, maxCosMicro = 400000L)
      Similarity.recallAtK(exact, approx, "query_id", "neighbor_id", k = 10)
    }),

    // ---- IVF nprobe sweep (X145): the probe-budget curve, measured ---------
    // q146 grades ONE nprobe; every IVF deployment actually tunes the
    // recall/scan-cost trade across a LADDER. One index pass (corpus cell
    // assignment shared, per-query cell ranking computed once at
    // max(nprobe) and prefix-sliced per arm — bit-identical to independent
    // runs because topkBy's (score desc, id asc) order is total), four
    // probe budgets, per-arm recall AND scanned-candidate cost (counted
    // inside the same aggregation as the top-k heap — zero extra stages)
    // vs the pinned exact top-10. MEASURED at sf0.01: mean recall
    // 260/420/590/940‰ at 54/101/197/405 candidates (of 500) for nprobe
    // 1/2/4/8 of 10 cells — i.i.d. random unit vectors are IVF's hard
    // case (q146 note), and the two-axis curve quantifies exactly what
    // each probed cell buys AND costs. All integers; the oracle replays
    // each arm independently (row_number ≤ np probes + a direct candidate
    // count), so the prefix-slice device must be invisible.
    "q171_ivf_nprobe_sweep" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      val qs = vecs.filter(col("vec_id") % 50 === 0)
      val exact = graft.ext.Caches.pin(Similarity.knnExact(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding", k = 10))
      val arms = Seq(1, 2, 4, 8)
      // pinned: the sweep result (≤ |arms|·k·|queries| rows — tiny) feeds
      // both the recall join and the cost rollup; unpinned, the second
      // consumer would replay every arm's probe join
      val sweep = graft.ext.Caches.pin(Similarity.knnIvfSweep(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding",
        centroids = vecs.filter(col("vec_id") % 50 === 7),
        "vec_id", "embedding", k = 10, nprobes = arms))
      val recall = exact.select(col("query_id"), col("neighbor_id"))
        .withColumn("nprobe",
          explode(array(arms.map(np => lit(np.toLong)): _*)))
        .join(sweep.select(col("nprobe"), col("query_id"),
            col("neighbor_id"), lit(1L).as("__hit")),
          Seq("nprobe", "query_id", "neighbor_id"), "left")
        .groupBy("nprobe", "query_id")
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("h"))
        .withColumn("rp", expr("(h * 1000) div 10"))
        .groupBy("nprobe")
        .agg(count(lit(1)).as("queries"), sum("h").as("hits"),
          expr("sum(rp) div count(1)").as("mean_recall_permille"),
          min("rp").as("min_recall_permille"),
          max("rp").as("max_recall_permille"))
      val cost = sweep.select("nprobe", "query_id", "candidates").distinct()
        .groupBy("nprobe").agg(sum("candidates").as("__ct"))
      // left join: an arm whose probed cells contain zero non-self
      // candidates corpus-wide has no cost row, but the oracle's
      // `per CROSS JOIN cost` still emits it (NULL mean_candidates via
      // sum-over-empty). NULL __ct div queries reproduces that NULL exactly
      // — no coalesce, or the degenerate arm would read 0 where the oracle
      // says NULL. Unreachable at the catalog's scales; shape parity only.
      recall.join(cost, Seq("nprobe"), "left")
        .withColumn("mean_candidates", expr("__ct div queries"))
        .drop("__ct")
    }),

    // ---- product quantization: codebooks + ADC top-k + recall --------------
    // the vector-COMPRESSION member of the ANN family (q25 exact, q26 IVF
    // buckets, q77 SRP-LSH, q88 scalar-quantized rerank): 64 dims split
    // into 4 subspaces, each learning an 8-codeword codebook by
    // deterministic integer L2 Lloyd (2 rounds — ONE corpus scan per round
    // serves all 4 subspace fits), vectors compressed to 4 codes, query
    // dots approximated from 4 table lookups (ADC), top-10 per sampled
    // query, and the whole pipeline GRADED by q146's recall harness
    // against the exact cosine top-10 — compression quality measured, not
    // assumed. Every number long-exact: codewords are sign·(|Σ| div n)
    // integer means, ADC dots are sums of long subvector dots.
    // MEASURED: mean recall ~180‰ at sf0.01 vs IVF's ~490‰ (q146) — the
    // fixture's i.i.d. random unit vectors are PQ's WORST case (no
    // subspace structure to exploit, 12 bits/vector), and the harness
    // reporting that honestly is the point of composing it with q146's
    // recall metric instead of assuming compression quality.
    "q147_pq_recall" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      val qs = vecs.filter(col("vec_id") % 50 === 0)
      val cb = Similarity.collectCodebooks(
        Tables.ensureMaterialized(s, "pq_embed",
          Tables.contentKey(s"$d/embeddings.parquet", "m4kc8it2"))(
          Similarity.pqFit(
            vecs, "vec_id", "embedding", m = 4, kc = 8, iters = 2)))
      val approx = Similarity.pqTopK(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding", cb, k = 10)
      val exact = Similarity.knnExact(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      Similarity.recallAtK(exact, approx, "query_id", "neighbor_id", k = 10)
    }),

    // ---- IVF-PQ: coarse cells × residual codebooks, recall-graded ----------
    // the composition of the engine's inverted-list and codebook tiers
    // (Jégou et al. 2011): a FITTED k-means coarse layer (q84's machinery,
    // density-adaptive k), PQ codebooks learned on the RESIDUAL x − c(x)
    // (exact long differences of quantized vectors), candidates scoring as
    // dot(q, c_cell) + Σ_j lut[code_j] over the nprobe probed cells only.
    // SAME byte budget as q147 (m=4, kc=8 → 12 bits/vector + the cell id
    // every IVF index already keeps), graded by the q146 harness against
    // the same exact baseline. MEASURED at sf0.1 (100 queries): mean
    // recall 73‰ at nprobe=3/40 cells vs plain PQ's 58‰ scanning the
    // WHOLE corpus (85‰ at nprobe=5) — the residual win is real but only
    // with a FITTED coarse layer: the same composition over q26's
    // data-vector "centroids" measured 58-60‰ at every nprobe, because
    // random unit vectors are near-orthogonal to everything and the
    // residual x − c is then LARGER than x (‖r‖² = 2 − 2cos > 1).
    "q152_ivfpq_recall" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      val qs = vecs.filter(col("vec_id") % 50 === 0)
      val kCells = Similarity.autoSemanticK(vecs.count(),
        targetPerCell = 50)
      val km = Tables.ensureMaterialized(s, "kmeans_embed",
        Tables.contentKey(s"$d/embeddings.parquet", s"k${kCells}it2"))(
        Similarity.kmeansFit(vecs, "vec_id", "embedding",
          k = kCells, iters = 2))
      val cb = Similarity.collectCodebooks(
        Tables.ensureMaterialized(s, "pqres_embed",
          Tables.contentKey(s"$d/embeddings.parquet", s"km${kCells}m4kc8it2"))(
          Similarity.pqFitResidualsKm(
            vecs, "vec_id", "embedding", km, m = 4, kc = 8, iters = 2)))
      val approx = Similarity.ivfPqTopKKm(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding",
        km, cb, k = 10, nprobe = 3)
      val exact = Similarity.knnExact(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      Similarity.recallAtK(exact, approx, "query_id", "neighbor_id", k = 10)
    }),

    // ---- Matryoshka prefix-dimension recall (MRL, Kusupati et al. 2022) ----
    // the DIMENSION-budget member of the ANN family's budget sweeps (q151
    // sweeps vocabulary size, the RecallSweep tf mode sweeps PQ bits;
    // this sweeps the dimension prefix): exact top-10 by cosine over the
    // FIRST p dims (p ∈ {8, 16, 32}) recall-graded against the full
    // 64-dim baseline — the measurement behind every "truncate the
    // embedding to save index cost" decision. Truncation is `slice`, a
    // per-row projection (zero shuffle, no refit, no model); each tier's
    // search is the same knnExact shape, so the whole sweep is 3× the
    // baseline's cost, and recall is hash-exact integer permille. On
    // MRL-TRAINED embeddings the prefix carries most of the signal;
    // this fixture's i.i.d. random vectors are the WORST case (every dim
    // carries equal signal, E[recall] ≈ chance at small p) — reporting
    // that honestly is the point of grading against the exact baseline.
    "q161_matryoshka_recall" -> ((s, d) => {
      // embeddingsWide: plain at bench scale (the min-bytes gate), widened
      // at sf1+ where the probe showed the exact search serializing on the
      // 2-task one-row-group scan (5.4 s single stage)
      val vecs = Tables.embeddingsWide(s, d)
      val qs = vecs.filter(col("vec_id") % 50 === 0)
      // pinned: the exact baseline feeds all three recall joins
      val exact = graft.ext.Caches.pin(Similarity.knnExact(vecs, qs,
        "vec_id", "embedding", "vec_id", "embedding", k = 10))
      Seq(8, 16, 32).map { p =>
        val tv = vecs.withColumn("embedding",
          slice(col("embedding"), 1, p))
        val tq = qs.withColumn("embedding",
          slice(col("embedding"), 1, p))
        val approx = Similarity.knnExact(tv, tq,
          "vec_id", "embedding", "vec_id", "embedding", k = 10)
        Similarity.recallAtK(exact, approx, "query_id", "neighbor_id",
            k = 10)
          .withColumn("p_dims", lit(p.toLong))
      }.reduce(_ unionByName _)
    }),

    // ---- OPQ-permuted PQ: energy-balanced subspaces, recall-graded ---------
    // the permutation special case of OPQ (Ge et al. 2014): rank dims by
    // corpus energy Σx² (exact long math on the quantized vectors), deal
    // them round-robin over the m subspaces so each gets an equal energy
    // share, then run the IDENTICAL q147 PQ chain (same m=4, kc=8, 12
    // bits/vector) in the permuted space. The exact baseline stays in the
    // ORIGINAL space — dots are permutation-invariant, so recall@10
    // against it is directly comparable with q147's. MEASURED: on this
    // fixture's i.i.d. unit vectors per-dim energies are near-equal, so
    // the deal has no systematic structure to exploit — and the numbers
    // show FIT LOTTERY, not signal: 80‰ vs q147's 57.5‰ at sf0.1 but
    // 120‰ vs 180‰ at sf0.01 (the sign flips between SFs; at kc=8/2
    // Lloyd rounds the codebook landscape is seed-dominated and any dim
    // reshuffle lands in a different local optimum). The isotropic
    // no-op OPQ theory predicts, observed honestly. The anisotropic
    // corpus where the permutation has real structure to balance is
    // q157's hashed-tf frame — there OPQ ≥ PQ at every measured SF.
    "q156_opq_recall" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      val perm = Similarity.energyPermutation(vecs, "vec_id", "embedding",
        m = 4)
      val pvecs = Similarity.permuteVec(vecs, "embedding", perm)
      val qs = pvecs.filter(col("vec_id") % 50 === 0)
      val cb = Similarity.collectCodebooks(
        Tables.ensureMaterialized(s, "pq_opq_embed",
          Tables.contentKey(s"$d/embeddings.parquet", "perm_m4kc8it2"))(
          Similarity.pqFit(
            pvecs, "vec_id", "embedding", m = 4, kc = 8, iters = 2)))
      val approx = Similarity.pqTopK(pvecs, qs,
        "vec_id", "embedding", "vec_id", "embedding", cb, k = 10)
      val exact = Similarity.knnExact(vecs,
        vecs.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      Similarity.recallAtK(exact, approx, "query_id", "neighbor_id", k = 10)
    }),

    // ---- OPQ vs PQ on ANISOTROPIC vectors: hashed-tf, one report -----------
    // the corpus where q156's permutation has something to balance:
    // feature-hashed term-frequency vectors (64 power-of-two buckets,
    // exact long counts, scale=1 — every dot integer-exact) put orders of
    // magnitude more energy in stopword-heavy buckets than tail buckets,
    // so contiguous PQ slices get lopsided energy shares while the
    // round-robin deal equalizes them. Both 12-bit chains (plain PQ and
    // energy-permuted PQ) run against the SAME exact cosine baseline —
    // dots are permutation-invariant — and the per-query recalls come
    // back side by side under a `method` column: the OPQ question
    // answered by measurement on one corpus in one result.
    // MEASURED: OPQ ≥ PQ at BOTH SFs here — 130‰ vs 70‰ at sf0.01
    // (10 queries), 11‰ vs 8‰ at sf0.1 (100 queries). The absolute
    // collapse at sf0.1 is the bits-vs-corpus-size effect, not a defect:
    // 12-bit codes give 4096 distinct codewords, so over 5000 docs the
    // ADC ranking saturates (~1.2 docs per exact code) and recall@10 at
    // FIXED bits falls as the corpus grows — the reason production PQ
    // scales m with corpus size. The permutation's relative win (+86%,
    // +37%) is the anisotropy story q156's isotropic fixture can't show.
    "q157_opq_tf_recall" -> ((s, d) => {
      // pinned: six consumers (exact baseline, two fits, two encodes, the
      // energy ranking) would each replay the tokenize+count chain
      val tf = graft.ext.Caches.pin(Similarity.hashedTfVectors(
        Tables.documentsWide(s, d), "doc_id", "text", buckets = 64))
      val qs = tf.filter(col("doc_id") % 50 === 0)
      // pinned (the q161 device): the exact baseline feeds BOTH method
      // arms' recall joins — unpinned, each arm replayed the full
      // |corpus|×|queries| product (the query's dominant stage twice over)
      val exact = graft.ext.Caches.pin(Similarity.knnExact(tf, qs,
        "doc_id", "tf", "doc_id", "tf", k = 10, scale = 1.0))
      val cbP = Similarity.collectCodebooks(
        Tables.ensureMaterialized(s, "pq_tf",
          Tables.contentKey(s"$d/documents.parquet", "hash64_m4kc8it2"))(
          Similarity.pqFit(
            tf, "doc_id", "tf", m = 4, kc = 8, iters = 2, scale = 1.0)))
      val apP = Similarity.pqTopK(tf, qs,
        "doc_id", "tf", "doc_id", "tf", cbP, k = 10, scale = 1.0)
      val perm = Similarity.energyPermutation(tf, "doc_id", "tf",
        m = 4, scale = 1.0)
      val ptf = Similarity.permuteVec(tf, "tf", perm)
      val pqs = ptf.filter(col("doc_id") % 50 === 0)
      val cbO = Similarity.collectCodebooks(
        Tables.ensureMaterialized(s, "pq_opqtf",
          Tables.contentKey(s"$d/documents.parquet", "hash64perm_m4kc8it2"))(
          Similarity.pqFit(
            ptf, "doc_id", "tf", m = 4, kc = 8, iters = 2, scale = 1.0)))
      val apO = Similarity.pqTopK(ptf, pqs,
        "doc_id", "tf", "doc_id", "tf", cbO, k = 10, scale = 1.0)
      Similarity.recallAtK(exact, apP, "query_id", "neighbor_id", k = 10)
        .withColumn("method", lit("pq"))
        .unionByName(
          Similarity.recallAtK(exact, apO, "query_id", "neighbor_id", k = 10)
            .withColumn("method", lit("opq")))
    }),

    // ---- SimHash near-dup (chunk-bucketed hamming) -------------------------
    // maxHamming = 3: the 4x16-bit chunk pigeonhole guarantees full recall
    // only up to hamming 3 — a larger bound would silently drop pairs that
    // collide on no chunk. portable = true → FNV token hash, oracle-checked.
    "q27_simhash_near_dups" -> ((s, d) => {
      Dedup.simHashNearDups(Tables.documentsWide(s, d), "doc_id", "text",
        maxHamming = 3, portable = true)
    }),

    // ---- text quality analysis --------------------------------------------
    "q28_text_stats" -> ((s, d) => {
      val t = col("text")
      Tables.documentsWide(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        TextAnalysis.subtokenCount(t).as("n_subtokens"),
        (floor(TextAnalysis.punctRatio(t) * 1e6 + 0.5) / 1e6).as("punct_ratio"),
        (floor(TextAnalysis.stopwordRatio(t) * 1e6 + 0.5) / 1e6).as("stop_ratio"),
        (floor(TextAnalysis.avgTokenLen(t) * 1e6 + 0.5) / 1e6).as("avg_token_len"),
        TextAnalysis.langGuess(t).as("lang_guess"),
        TextAnalysis.fingerprint(t).as("fp"))
    }),

    // ---- quality-signal fusion via scalable percentile ranks ---------------
    // three heterogeneous quality signals (length, stopword density,
    // punctuation cleanliness) fused on a COMMON scale: each signal maps
    // to its strictly-below empirical CDF rank (ppm), the blend is the
    // integer mean, keep = upper half. Rank-blending is how production
    // curation combines incommensurable signals (a raw z-score mix breaks
    // on heavy tails); the point of the operator is the SHAPE —
    // Quality.empiricalCdfMicro ranks on the value-aggregate frame (one
    // groupBy + a distinct-values running sum + a value-keyed join), so
    // NO corpus-sized single-partition window exists anywhere (the q49
    // pathology a bare percent_rank() would reintroduce). Signals are
    // integers (count / micro-quantized ratios, null-coalesced) so every
    // rank, the blend, and the verdict are hash-exact. Zero-denominator
    // docs (empty / whitespace-only / punct-only) are a real edge: the
    // ratio functions nullif their denominators (NULL, never 0.0/0 = NaN,
    // which coalesce can't catch), so the coalesce here is a genuine
    // guard — and the oracle carries the matching CASE WHEN len = 0.
    "q167_quality_rank_blend" -> ((s, d) => {
      val t = col("text")
      // plain scan KEPT (round-16 A/B): the q80/q86 widen was tried here
      // both bare and with the sig projection pinned — wall 3.5 -> 2.2 s
      // but CPU 3.5 -> 18.7 s (bare) / 21.4 s (pinned, jobs 15 -> 28):
      // sig feeds three CDF folds plus the final assembly, and every
      // variant re-paid the heavy rule chain per consumer or the cache
      // machinery per run. A 6x CPU price inverts the win on any
      // low-core epoch (the driver benches a reduced-core run), so the
      // serialized scan stays until the folds can share one evaluation.
      val sig = (
        Tables.documents(s, d).filter(t.isNotNull)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(t).as("n_tokens"),
          coalesce(floor(TextAnalysis.stopwordRatio(t) * 1e6 + 0.5)
            .cast("long"), lit(0L)).as("stop_micro"),
          (lit(1000000L) - coalesce(
            floor(TextAnalysis.punctRatio(t) * 1e6 + 0.5).cast("long"),
            lit(0L))).as("negpunct_micro")))
      val ranked = Seq(("n_tokens", "r_tokens"), ("stop_micro", "r_stop"),
          ("negpunct_micro", "r_punct"))
        .foldLeft(sig) { case (df, (v, r)) =>
          graft.operators.Quality.empiricalCdfMicro(df, v, r)
        }
      ranked
        .withColumn("blended_micro",
          expr("(r_tokens + r_stop + r_punct) div 3"))
        .withColumn("kept",
          (col("blended_micro") >= 500000L).cast("long"))
        .select("doc_id", "n_tokens", "stop_micro", "negpunct_micro",
          "r_tokens", "r_stop", "r_punct", "blended_micro", "kept")
    }),

    // ---- multimodal payload plumbing --------------------------------------
    "q29_multimodal_bytes" -> ((s, d) => {
      val packed = Multimodal.packPayload(Tables.documentsWide(s, d), "text")
      val bytes = col("payload.bytes")
      val hist = Multimodal.nibbleHistogram(bytes)
      packed.select(
        col("doc_id"),
        col("payload.meta.mime").as("mime"),
        col("payload.meta.n_bytes").as("n_bytes"),
        col("payload.meta.checksum").as("checksum"),
        lower(hex(Multimodal.head(bytes, 8))).as("head_hex"),
        size(Multimodal.frameSample(bytes, 4, 16)).cast("long").as("n_frames"),
        element_at(hist, 1).as("hist_0"),
        element_at(hist, 8).as("hist_7"),
        element_at(hist, 16).as("hist_f"))
    }),

    // ---- real media decode: WAV + BMP, fabricate-then-decode (X74) ---------
    // the q68/q77/q92 planting device applied to codecs: each doc_id
    // deterministically serializes a canonical PCM WAV and a padded 24-bit
    // BMP (pure expressions, distributed), and the DECODERS — which see
    // only the binary columns — must recover format fields, duration, and
    // sample/pixel statistics. The DuckDB oracle replays the generative
    // formulas, so any header-offset, endianness, sign, or row-padding
    // mistake in the decoder breaks the hash. Decode stays in whole-stage
    // codegen: substr+hex+conv byte reads, transform/aggregate folds.
    "q99_media_decode" -> ((s, d) => {
      val id = col("doc_id")
      val n = lit(32L) + pmod(id, lit(33L))
      val rate = lit(8000L) + pmod(id, lit(8L)) * 1000L
      val samples = transform(sequence(lit(0L), n - 1L),
        i => pmod(id * 131L + i * 7919L, lit(65536L)) - 32768L)
      val w = lit(2L) + pmod(id, lit(6L))
      val h = lit(2L) + pmod(id, lit(4L))
      val media = Tables.documentsWide(s, d).select(id)
        .withColumn("wav", Multimodal.fabricateWav(rate, samples))
        .withColumn("bmp", Multimodal.fabricateBmp(w, h,
          (r, k) => pmod(id + r * 31L + k * 5L, lit(256L))))
      // decoders read ONLY the payload bytes
      media
        .select(id, Multimodal.decodeWav(col("wav")).as("wv"),
          Multimodal.decodeBmp(col("bmp")).as("bm"))
        .select(id,
          col("wv.valid").as("wav_valid"),
          col("wv.channels").as("wav_channels"),
          col("wv.sample_rate").as("wav_rate"),
          col("wv.bits_per_sample").as("wav_bits"),
          col("wv.n_samples").as("wav_n_samples"),
          col("wv.duration_us").as("wav_duration_us"),
          col("wv.sum_abs").as("wav_sum_abs"),
          col("wv.max_abs").as("wav_max_abs"),
          col("bm.valid").as("bmp_valid"),
          col("bm.width").as("bmp_width"),
          col("bm.height").as("bmp_height"),
          col("bm.bpp").as("bmp_bpp"),
          col("bm.sum_pixels").as("bmp_sum_pixels"))
    }),

    // ---- perceptual media near-dup (q99's decoders → q27's pairing) --------
    // the round-7 verdict's media gap: text had five near-dup tiers while
    // media stopped at exact byte dedup. Here each dup GROUP (doc_id div 5)
    // shares base image/audio content and each member perturbs one corner
    // region — recompression-style noise — so members are near but not
    // exact duplicates. The 8×8 pixel average-hash and the 64-segment
    // audio energy envelope (native expressions over the SERIALIZED bytes,
    // exact-integer mean comparisons) land within hamming ≤ 3 of their
    // group and ~32 of strangers; pairing is the chunk-bucketed hamming
    // join (guaranteed recall ≤ 3 by pigeonhole, never all-pairs). The
    // oracle re-derives both hashes from the generative formulas without
    // parsing a byte — agreement proves header math, stride, sign, AND
    // the hash arithmetic at once.
    "q128_media_near_dups" -> ((s, d) => {
      val id = col("doc_id")
      val grp = expr("doc_id div 5")
      val m = pmod(id, lit(5L))
      // 16×16 24-bit BMP (48-byte rows, stride = rowBytes: no padding);
      // k is the BYTE index within the row. The group MULTIPLIES the
      // pixel gradient — a purely additive grp term would shift every
      // byte equally, leaving the mean comparisons (hence the hash)
      // nearly invariant across groups, and "near-dup" would match
      // strangers.
      val bmp = Multimodal.fabricateBmp(lit(16L), lit(16L), (r, k) =>
        pmod((grp + 1L) * (r * 131L + k * 17L + 7L)
          + when(r < 2L && k < 6L, m * 40L).otherwise(lit(0L)), lit(256L)))
      // 128-sample mono PCM WAV; first 4 samples carry the member noise
      val samples = transform(sequence(lit(0L), lit(127L)), i =>
        pmod((grp + 1L) * (i * 7919L + 13L)
          + when(i < 4L, m * 1000L).otherwise(lit(0L)), lit(65536L))
          - 32768L)
      // pin the fingerprints: serialization + both hashes run ONCE; the
      // two modality pair-joins (each reading the frame twice for its
      // self-join) scan the cached (id, 2×long) rows — narrow at any
      // corpus size — instead of re-fabricating the media 4×
      val fps = graft.ext.Caches.pin(Tables.documentsWide(s, d).select(id)
        .withColumn("bmp", bmp)
        .withColumn("wav", Multimodal.fabricateWav(lit(8000L), samples))
        .select(id, Multimodal.bmpAHash64(col("bmp")).as("ahash"),
          Multimodal.wavEnvelope64(col("wav")).as("env")))
      val img = Dedup.hammingNearDups64(fps.select(id, col("ahash")),
          "doc_id", "ahash", maxHamming = 3)
        .withColumn("modality", lit("image"))
      val aud = Dedup.hammingNearDups64(fps.select(id, col("env")),
          "doc_id", "env", maxHamming = 3)
        .withColumn("modality", lit("audio"))
      img.unionByName(aud).select(col("modality"), col("id_a"),
        col("id_b"), col("hamming").cast("long").as("hamming"))
    }),

    // ---- nearest-neighbor BMP resize (X143): fabricate → resize → decode ---
    // the RESIZE member of the multimodal quartet, proven by round-trip:
    // each doc fabricates a source BMP from the q99 generative formula
    // (6..14 × 4..8 px — sizes that EXERCISE both stride regimes), resizes
    // it to a 5×3 thumbnail (rowBytes 15 → stride 16: the output pads; many
    // sources don't — the resizer must translate between pad layouts), and
    // the DECODER reads the thumbnail back. The oracle computes the
    // expected thumbnail statistics straight from the composed index map
    // (id + (r'·h div 3)·31 + ((c'·w div 5)·3 + ch)·5) % 256 — header math,
    // both strides, and the nearest-neighbor map all have to be right for
    // the sums to agree. Per-row scalar work, zero exchanges.
    "q169_media_resize" -> ((s, d) => {
      val id = col("doc_id")
      val w = lit(6L) + pmod(id, lit(9L))
      val h = lit(4L) + pmod(id, lit(5L))
      // bmp and thumb are MATERIALIZED columns (the q99 layering): the
      // decoder reads `thumb` dozens of times and the resizer reads `bmp`
      // dozens of times — each multi-reference blocks CollapseProject, so
      // every tier computes once per row in its own Project. Inlining the
      // resize tree into the decoder instead replicates the whole
      // fabricate∘resize expression inside every byte-read of the decode
      // aggregate (measured: 0.33 s/row — 69 s wall / 1665 s CPU at
      // sf0.1; this layering: per-row scalar work again).
      Tables.documentsWide(s, d).select(id)
        .withColumn("bmp", Multimodal.fabricateBmp(w, h,
          (r, k) => pmod(id + r * 31L + k * 5L, lit(256L))))
        .withColumn("thumb", Multimodal.resizeBmp(col("bmp"), 5, 3))
        .select(id, Multimodal.decodeBmp(col("thumb")).as("tb"),
          octet_length(col("thumb")).cast("long").as("thumb_bytes"))
        .select(id,
          col("tb.valid").as("thumb_valid"),
          col("tb.width").as("thumb_w"),
          col("tb.height").as("thumb_h"),
          col("thumb_bytes"),
          col("tb.sum_pixels").as("thumb_sum_pixels"))
    }),

    // ---- LSH recall sweep (X144): the dedup family's X120 ------------------
    // every LSH dedup deployment picks a band count from theory
    // (P = 1 − (1 − J^r)^bands) and hopes; this MEASURES the curve on
    // planted similarity tiers. The corpus's own near-dups all sit at
    // J ≥ 0.89 (every config finds them — no knee), so each doc is paired
    // with its own word-prefix versions at 2/5 and 4/5 of its tokens:
    // prefix shingles ⊂ doc shingles, so (doc, p40) ≈ J 0.4, (doc, p80)
    // ≈ 0.8, (p40, p80) ≈ 0.5 — three controlled tiers where 8/16/32
    // bands (r = 8/4/2) theoretically recall ~0.5%/34%/99.6%, ~3%/64%/100%,
    // and ~67%/99.8%/100%. Ground truth = the exhaustive inverted-index
    // Jaccard pairs at τ=0.35 (exact — any pair with J > 0 shares a
    // shingle); candidates = ONE 64-hash signature pass over the tripled
    // corpus, banded three ways (signatures pinned: narrow post-aggregation
    // frame, unlike the shingle frame whose pin lost its round-12 A/B);
    // output = every true pair × config with a found flag. The oracle
    // re-derives signatures from the portable FNV family and takes
    // exact-signature band equality, so the bucket-hash device must be
    // invisible — and the recall CURVE itself is hash-pinned, not sampled.
    "q170_lsh_recall_sweep" -> ((s, d) => {
      val docs = Tables.documentsWide(s, d).select(
        col("doc_id"),
        filter(split(Dedup.normalizeText(col("text")), " "), w => w =!= "")
          .as("ws"))
      // prefix texts re-tokenize to exactly their token slice: tokens are
      // whitespace-free and normalizeText is idempotent over a
      // single-space join
      def prefix(num: Int, den: Int, idOff: Long) = docs.select(
        (col("doc_id") + idOff).as("doc_id"),
        concat_ws(" ", slice(col("ws"), lit(1),
          floor(size(col("ws")) * num / den.toDouble).cast("int")))
          .as("text"))
      val corpus = docs.select(col("doc_id"),
          concat_ws(" ", col("ws")).as("text"))
        .unionByName(prefix(2, 5, 10000000L))
        .unionByName(prefix(4, 5, 20000000L))
      // hashed shingle grain (round-16): the exhaustive-truth chain's two
      // corpus-scale exchanges (df filter join + inverted-index self-join)
      // and the signature pass's base all ride 8-byte FNV keys; signatures
      // are bit-identical (the hash IS the portable family's base)
      val sh = Dedup.wordShingleHashes(corpus, "doc_id", "text", n = 3)
      val truth = Dedup.jaccardPairsFromShingles(sh, "doc_id",
        minJaccard = 0.35)
      val cand = Dedup.minHashBandSweep(sh, "doc_id", numHashes = 64,
        bandsList = Seq(8, 16, 32), portable = true)
      truth.select(col("id_a"), col("id_b"),
          (floor(col("jaccard") * 1e6 + 0.5) / 1e6).as("jaccard"))
        .withColumn("bands", explode(array(lit(8L), lit(16L), lit(32L))))
        .join(cand.withColumn("found", lit(1L)),
          Seq("bands", "id_a", "id_b"), "left")
        .select(col("bands"), col("id_a"), col("id_b"), col("jaccard"),
          coalesce(col("found"), lit(0L)).as("found"))
    }),

    // ---- cross-resolution media dedup via resize canonicalization (X146) ---
    // the pipeline role of X143's resize: a media lake holds the SAME asset
    // at several resolutions (renders, thumbnails, re-encodes), and exact
    // byte dedup sees them as distinct. Canonicalize: resize everything to
    // one small raster, dedup on the canonical bytes. The corpus here is
    // every asset twice — native res, and at id + 10⁷ an INDEPENDENTLY
    // fabricated 2× upsample (pixel (r,k) = base formula at
    // (r div 2, ((k div 3) div 2)·3 + k mod 3) — never produced through
    // resizeBmp). The two variants' canonical 5×3 thumbs are
    // BYTE-IDENTICAL by the resize's index-map algebra:
    // floor(floor(2x)/2) = floor(x) makes nearest-neighbor maps commute
    // with integer upsampling — so md5-grouping the mixed corpus collapses
    // each (orig, 2×) pair into one group with canonical_id = the original
    // (min id). One resize byte off anywhere splits a group and fails the
    // hash: the identity is corpus-proven, not spec-asserted. The oracle
    // groups by the replayed 45-byte pixel tuple — no md5, no byte
    // parsing. Map-only per-row scalars + one fp-keyed groupBy: the q21
    // exact-dedup shape on canonicalized media.
    "q172_media_cross_resolution" -> ((s, d) => {
      val id = col("doc_id")
      val w = lit(6L) + pmod(id, lit(9L))
      val h = lit(4L) + pmod(id, lit(5L))
      def base(r: org.apache.spark.sql.Column,
               k: org.apache.spark.sql.Column) =
        pmod(id + r * 31L + k * 5L, lit(256L))
      val docs = Tables.documentsWide(s, d).select(id)
      // the mixed-resolution corpus: every asset once at native res and
      // once (id + 10⁷) at an INDEPENDENTLY fabricated 2× upsample
      val corpus = docs
        .withColumn("bin", Multimodal.fabricateBmp(w, h, base))
        .select(id, col("bin"))
        .unionByName(docs
          .withColumn("bin", Multimodal.fabricateBmp(w * 2L, h * 2L,
            (r, k) => base(floor(r / 2.0).cast("long"),
              floor(floor(k / 3.0) / 2.0).cast("long") * 3L
                + pmod(k, lit(3L)))))
          .select((id + 10000000L).as("doc_id"), col("bin")))
      // localCheckpoint (the multi-consumer device): the group aggregate
      // and the join both consume canon — unmaterialized, the optimized
      // two-branch plan re-derived the thumbs with the fabricate chain
      // degraded to interpreted per-byte eval in BOTH exchange stages
      // (measured: >390 s at sf0.1 vs 0.4 s for the identical single-
      // consumer projection); checkpointing the 2·|docs|-row (id, fp)
      // frame restores the map-once shape (1.4 s end-to-end)
      val canon = corpus
        .withColumn("thumb", Multimodal.resizeBmp(col("bin"), 5, 3))
        .select(id, md5(col("thumb")).as("fp"))
        .localCheckpoint(false)
      val groups = canon.groupBy("fp")
        .agg(count(lit(1)).as("group_size"), min(id).as("canonical_id"))
      canon.join(groups, Seq("fp"))
        .select(id, col("group_size"), col("canonical_id"))
    }),

    // ---- WAV decimation: fabricate → resample → decode (X147) --------------
    // the audio twin of q169 and the last member of the transform pair
    // (image resize / audio resample): each doc fabricates the q99 PCM WAV
    // (32..64 samples at 8000..15000 Hz), decimates by 4 (sample j of the
    // output = sample 4j of the input, rate′ = rate div 4), and the
    // DECODER reads the result back — format fields, the shrunk sample
    // count ceil(n/4), the integer duration at the new byte rate, and the
    // strided per-sample statistics all have to survive the round trip.
    // The oracle replays the generative sample formula at indices 4j.
    // Column layering per the q169 lesson: wav and ds are materialized
    // attributes, never inline trees. Map-only, zero exchanges.
    "q173_media_resample" -> ((s, d) => {
      val id = col("doc_id")
      val n = lit(32L) + pmod(id, lit(33L))
      val rate = lit(8000L) + pmod(id, lit(8L)) * 1000L
      val samples = transform(sequence(lit(0L), n - 1L),
        i => pmod(id * 131L + i * 7919L, lit(65536L)) - 32768L)
      Tables.documentsWide(s, d).select(id)
        .withColumn("wav", Multimodal.fabricateWav(rate, samples))
        .withColumn("ds", Multimodal.decimateWav(col("wav"), 4))
        .select(id, Multimodal.decodeWav(col("ds")).as("dw"))
        .select(id,
          col("dw.valid").as("ds_valid"),
          col("dw.sample_rate").as("ds_rate"),
          col("dw.n_samples").as("ds_n_samples"),
          col("dw.duration_us").as("ds_duration_us"),
          col("dw.sum_abs").as("ds_sum_abs"),
          col("dw.max_abs").as("ds_max_abs"))
    }),

    // ---- incremental PQ maintenance (fold a batch into stored codebooks) ---
    // q176's device applied to the OTHER fitted-model family: the PQ
    // state persists exact per-(subspace, codeword) subvector sums +
    // counts beside the codebooks, and a new batch folds in with one
    // batch scan — the update half of one per-subspace Lloyd round over
    // base ∪ batch, exact. Output per (subspace, codeword): counts, an
    // order-sensitive codeword checksum, and the full-corpus encode
    // census under the folded codebooks.
    "q177_pq_incremental" -> ((s, d) => {
      val all = Tables.embeddings(s, d)
      val base = all.filter(col("vec_id") % 10 =!= 9)
      val batch = all.filter(col("vec_id") % 10 === 9)
      val state = Tables.ensureMaterialized(s, "pq_state",
        Tables.contentKey(s"$d/embeddings.parquet", "m4kc8it2base9"))(
        Similarity.pqState(base, "vec_id", "embedding",
          m = 4, kc = 8, iters = 2))
      val folded = Similarity.pqFold(state, batch, "vec_id", "embedding")
      val cbs = folded.select("subspace", "cell", "centroid").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
        .toSeq
      val census = Similarity.pqEncode(all, "vec_id", "embedding", cbs)
        .select(posexplode(col("codes")).as(Seq("subspace", "cell")))
        .groupBy("subspace", "cell")
        .agg(count(lit(1)).as("encoded_full"))
      folded.select(col("subspace"), col("cell"), col("n").as("n_total"),
          expr("aggregate(zip_with(centroid, sequence(1, size(centroid)), " +
            "(c, i) -> c * i), 0L, (a, x) -> a + x)").as("cw_weighted"))
        .join(state.select(col("subspace"), col("cell"),
          col("n").as("n_base")), Seq("subspace", "cell"))
        .join(census, Seq("subspace", "cell"), "left")
        .select(col("subspace").cast("long").as("subspace"),
          col("cell").cast("long").as("cell"), col("n_base"),
          (col("n_total") - col("n_base")).as("n_batch"), col("n_total"),
          col("cw_weighted"),
          coalesce(col("encoded_full"), lit(0L)).as("encoded_full"))
    }),

    // ---- incremental IVF-PQ maintenance (fold into residual codebooks) -----
    // closes the q176/q177 maintenance loop for the COMPOSITE index
    // (round-14 verdict item 5): the coarse k-means layer is FROZEN (the
    // production IVF posture — re-fitting it would move every stored
    // residual) and the residual codebooks fold exactly: batch rows are
    // routed to their coarse cells, residualized as exact long
    // differences, and their per-(subspace, codeword) sums add into the
    // stored state — the update half of one per-subspace Lloyd round
    // over base ∪ batch residuals under the frozen quantizer. Output per
    // (subspace, codeword): counts, an order-sensitive codeword
    // checksum, and the full-corpus residual-encode census under the
    // folded codebooks. The oracle re-derives coarse fit, residuals,
    // codebook fit, fold arithmetic, and census from scratch.
    "q178_ivfpq_incremental" -> ((s, d) => {
      val all = Tables.embeddings(s, d)
      val base = all.filter(col("vec_id") % 10 =!= 9)
      val batch = all.filter(col("vec_id") % 10 === 9)
      val km = Tables.ensureMaterialized(s, "ivfpq_coarse",
        Tables.contentKey(s"$d/embeddings.parquet", "k8it2base9"))(
        Similarity.kmeansFit(base, "vec_id", "embedding", k = 8, iters = 2))
      val state = Tables.ensureMaterialized(s, "ivfpq_state",
        Tables.contentKey(s"$d/embeddings.parquet", "km8m4kc8it2base9"))(
        Similarity.ivfPqState(base, "vec_id", "embedding", km,
          m = 4, kc = 8, iters = 2))
      val folded = Similarity.ivfPqFold(state, batch, "vec_id", "embedding",
        km)
      val cbs = folded.select("subspace", "cell", "centroid").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
        .toSeq
      val census = Similarity.ivfPqEncode(all, "vec_id", "embedding", km, cbs)
        .select(posexplode(col("codes")).as(Seq("subspace", "cell")))
        .groupBy("subspace", "cell")
        .agg(count(lit(1)).as("encoded_full"))
      folded.select(col("subspace"), col("cell"), col("n").as("n_total"),
          expr("aggregate(zip_with(centroid, sequence(1, size(centroid)), " +
            "(c, i) -> c * i), 0L, (a, x) -> a + x)").as("cw_weighted"))
        .join(state.select(col("subspace"), col("cell"),
          col("n").as("n_base")), Seq("subspace", "cell"))
        .join(census, Seq("subspace", "cell"), "left")
        .select(col("subspace").cast("long").as("subspace"),
          col("cell").cast("long").as("cell"), col("n_base"),
          (col("n_total") - col("n_base")).as("n_batch"), col("n_total"),
          col("cw_weighted"),
          coalesce(col("encoded_full"), lit(0L)).as("encoded_full"))
    }),

    // ---- incremental OPQ maintenance (fold into the energy ranking) --------
    // the permutation's whole model is d per-dim second moments Σx² —
    // ASSOCIATIVE sums with no assignment feedback, so unlike q176–q178
    // this fold is EXACTLY a refit: fold(state(base), batch) ==
    // state(base ∪ batch) row-for-row and the folded deal IS the
    // from-scratch permutation on the union (spec-pinned; no mini-batch
    // caveat, no drift, no refit trigger). Output per permuted position:
    // the dealt dim, its base/batch/total energies (the fold arithmetic
    // under the hash), and the receiving subspace.
    "q179_opq_incremental" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val all = Tables.embeddings(s, d)
      val base = all.filter(col("vec_id") % 10 =!= 9)
      val batch = all.filter(col("vec_id") % 10 === 9)
      val state = Tables.ensureMaterialized(s, "opq_energy",
        Tables.contentKey(s"$d/embeddings.parquet", "energybase9"))(
        Similarity.energyState(base, "vec_id", "embedding"))
      val folded = Similarity.energyFold(state, batch, "vec_id", "embedding")
      val m = 4
      val perm = Similarity.permutationFromState(folded, m)
      val sub = perm.length / m
      val posRows = perm.zipWithIndex
        .map { case (dim, p) => (p + 1L, (p / sub).toLong, dim) }
        .toDF("pos", "subspace", "dim")
      posRows
        .join(state.select(col("dim"), col("energy").as("e_base")),
          Seq("dim"))
        .join(folded.select(col("dim"), col("energy").as("e_total")),
          Seq("dim"))
        .select(col("pos"), col("subspace"),
          (col("dim") + 1).cast("long").as("dim"),
          col("e_base"), (col("e_total") - col("e_base")).as("e_batch"),
          col("e_total"))
    }),

    // ---- PQ retraction (unfold a takedown from stored codebook state) ------
    // q183's deletion semantics for the PQ index (round-16): the
    // retracted rows re-encode under the state's own codebooks (the
    // model they were counted under at state build), their per-
    // (subspace, codeword) subvector sums subtract out bit-for-bit —
    // the survivors' state exactly, spec-pinned — and each codeword
    // re-derives as one per-subspace Lloyd update over the survivors.
    // Output per (subspace, codeword): the count ladder, the retracted
    // codeword checksum, and the survivor re-encode census under it.
    "q184_pq_retract" -> ((s, d) => {
      val all = Tables.embeddings(s, d)
      val takedown = all.filter(col("vec_id") % 10 === 9)
      val survivors = all.filter(col("vec_id") % 10 =!= 9)
      val state = Tables.ensureMaterialized(s, "pq_state_all",
        Tables.contentKey(s"$d/embeddings.parquet", "m4kc8it2all"))(
        Similarity.pqState(all, "vec_id", "embedding",
          m = 4, kc = 8, iters = 2))
      val unfolded = Similarity.pqUnfold(state, takedown, "vec_id",
        "embedding")
      val cbs = unfolded.select("subspace", "cell", "centroid").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
        .toSeq
      val census = Similarity.pqEncode(survivors, "vec_id", "embedding", cbs)
        .select(posexplode(col("codes")).as(Seq("subspace", "cell")))
        .groupBy("subspace", "cell")
        .agg(count(lit(1)).as("encoded_survivors"))
      unfolded.select(col("subspace"), col("cell"), col("n").as("n_after"),
          expr("aggregate(zip_with(centroid, sequence(1, size(centroid)), " +
            "(c, i) -> c * i), 0L, (a, x) -> a + x)").as("cw_weighted"))
        .join(state.select(col("subspace"), col("cell"),
          col("n").as("n_full")), Seq("subspace", "cell"))
        .join(census, Seq("subspace", "cell"), "left")
        .select(col("subspace").cast("long").as("subspace"),
          col("cell").cast("long").as("cell"), col("n_full"),
          (col("n_full") - col("n_after")).as("n_takedown"), col("n_after"),
          col("cw_weighted"),
          coalesce(col("encoded_survivors"), lit(0L))
            .as("encoded_survivors"))
    }),

    // ---- IVF-PQ retraction (unfold in the frozen residual space) -----------
    // the composite index's deletion half: the coarse layer is FROZEN
    // (as in q178 — it never moved, so the retracted rows route and
    // residualize exactly as they did at insert), and their residual
    // sums subtract from the stored per-(subspace, codeword) state.
    // Output contract as q184, over residual codebooks; the survivor
    // census residual-encodes under the frozen coarse layer + the
    // retracted codebooks.
    "q185_ivfpq_retract" -> ((s, d) => {
      val all = Tables.embeddings(s, d)
      val takedown = all.filter(col("vec_id") % 10 === 9)
      val survivors = all.filter(col("vec_id") % 10 =!= 9)
      val km = Tables.ensureMaterialized(s, "ivfpq_coarse_all",
        Tables.contentKey(s"$d/embeddings.parquet", "k8it2all"))(
        Similarity.kmeansFit(all, "vec_id", "embedding", k = 8, iters = 2))
      val state = Tables.ensureMaterialized(s, "ivfpq_state_all",
        Tables.contentKey(s"$d/embeddings.parquet", "km8m4kc8it2all"))(
        Similarity.ivfPqState(all, "vec_id", "embedding", km,
          m = 4, kc = 8, iters = 2))
      val unfolded = Similarity.ivfPqUnfold(state, takedown, "vec_id",
        "embedding", km)
      val cbs = unfolded.select("subspace", "cell", "centroid").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
        .toSeq
      val census = Similarity.ivfPqEncode(survivors, "vec_id", "embedding",
          km, cbs)
        .select(posexplode(col("codes")).as(Seq("subspace", "cell")))
        .groupBy("subspace", "cell")
        .agg(count(lit(1)).as("encoded_survivors"))
      unfolded.select(col("subspace"), col("cell"), col("n").as("n_after"),
          expr("aggregate(zip_with(centroid, sequence(1, size(centroid)), " +
            "(c, i) -> c * i), 0L, (a, x) -> a + x)").as("cw_weighted"))
        .join(state.select(col("subspace"), col("cell"),
          col("n").as("n_full")), Seq("subspace", "cell"))
        .join(census, Seq("subspace", "cell"), "left")
        .select(col("subspace").cast("long").as("subspace"),
          col("cell").cast("long").as("cell"), col("n_full"),
          (col("n_full") - col("n_after")).as("n_takedown"), col("n_after"),
          col("cw_weighted"),
          coalesce(col("encoded_survivors"), lit(0L))
            .as("encoded_survivors"))
    }),

    // ---- OPQ retraction (unfold the energy ranking) -------------------------
    // q179's fold-equals-refit claim, inverted: per-dim second moments
    // are associative sums, so the unfold is EXACTLY a refit on the
    // survivors — the retracted permutation IS the from-scratch
    // permutation on what remains (spec-pinned; the one retraction in
    // the family with no drift story at all). Output per permuted
    // position under the RETRACTED deal: the dealt dim, its full/
    // takedown/after energies (the subtraction under the hash), and the
    // receiving subspace.
    "q186_opq_retract" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val all = Tables.embeddings(s, d)
      val takedown = all.filter(col("vec_id") % 10 === 9)
      val state = Tables.ensureMaterialized(s, "opq_energy_all",
        Tables.contentKey(s"$d/embeddings.parquet", "energyall"))(
        Similarity.energyState(all, "vec_id", "embedding"))
      val unfolded = Similarity.energyUnfold(state, takedown, "vec_id",
        "embedding")
      val m = 4
      val perm = Similarity.permutationFromState(unfolded, m)
      val sub = perm.length / m
      val posRows = perm.zipWithIndex
        .map { case (dim, p) => (p + 1L, (p / sub).toLong, dim) }
        .toDF("pos", "subspace", "dim")
      posRows
        .join(state.select(col("dim"), col("energy").as("e_full")),
          Seq("dim"))
        .join(unfolded.select(col("dim"), col("energy").as("e_after")),
          Seq("dim"))
        .select(col("pos"), col("subspace"),
          (col("dim") + 1).cast("long").as("dim"),
          col("e_full"), (col("e_full") - col("e_after")).as("e_takedown"),
          col("e_after"))
    }),

    // ---- anti-aliased WAV resample through the external-codec seam ---------
    // the promised mapInArrow contract (q169/q173 scaladocs), EXERCISED:
    // a real windowed-sinc polyphase decimator in plain Scala behind
    // Dataset.mapPartitions — binary column in, binary column out, the
    // exact stage shape an Arrow-batched DSP library plugs into. Taps are
    // pinned Q15 integer literals and the convolution is pure integer
    // arithmetic (Resample scaladoc), so the oracle replays every output
    // SAMPLE from the generative input formula + the tap list — the
    // filter itself is under the hash, not just the envelope. Same
    // fixture as q173 (whose naive keep-every-4th decimator aliases; this
    // low-pass-filters first — the difference a DSP library exists for).
    "q175_wav_sinc_resample" -> ((s, d) => {
      val id = col("doc_id")
      val n = lit(32L) + pmod(id, lit(33L))
      val rate = lit(8000L) + pmod(id, lit(8L)) * 1000L
      val samples = transform(sequence(lit(0L), n - 1L),
        i => pmod(id * 131L + i * 7919L, lit(65536L)) - 32768L)
      val src = Tables.documentsWide(s, d).select(id)
        .withColumn("wav", Multimodal.fabricateWav(rate, samples))
      graft.ext.Resample.resampleWav(src, "wav", "rs", factor = 2)
        .select(id, Multimodal.decodeWav(col("rs")).as("dw"))
        .select(id,
          col("dw.valid").as("rs_valid"),
          col("dw.sample_rate").as("rs_rate"),
          col("dw.n_samples").as("rs_n_samples"),
          col("dw.duration_us").as("rs_duration_us"),
          col("dw.sum_abs").as("rs_sum_abs"),
          col("dw.max_abs").as("rs_max_abs"))
    }),

    // ---- salted two-phase aggregation (skew-safe rollup) -------------------
    "q34_salted_rollup" -> ((s, d) => {
      Skew.saltedAggregate(Tables.lineitem(s, d), Seq("l_suppkey"),
          saltBuckets = 16,
          partial = Seq(
            sum(round(col("l_quantity") * 100).cast("long")).as("q100"),
            count(lit(1)).as("n")),
          merge = Seq(sum("q100").as("q100"), sum("n").as("n")))
        .select(col("l_suppkey"), (col("q100") / 100.0).as("qty_sum"),
          col("n").as("line_count"))
    }),

    // ---- salted equi-join (skew-safe join twin of q34) ---------------------
    // left rows scatter over 8 salt replicas of the dim side, so a hot
    // custkey lands on 8 reducers instead of one; semantics identical to the
    // plain join the oracle runs.
    "q43_salted_join" -> ((s, d) => {
      val orders = Tables.orders(s, d).select(
        col("o_custkey"), col("o_totalprice"))
      val dim = Tables.customer(s, d).select(
        col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Skew.saltedJoin(orders, dim, Seq("o_custkey"), saltBuckets = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("orders"),
          XDet.moneySum(col("o_totalprice"), 2).as("revenue"))
    }),

    // ---- char-shingle Jaccard near-dup (whitespace-free grain) -------------
    // q22's twin over character 24-grams — the dedup grain for scripts
    // without word boundaries; same inverted-index + stop-shingle-guard
    // machinery via jaccardPairsFromShingles. Parameters measured at sf0.1:
    // n = 24 keeps sum(df^2) at 1.6M candidates vs 258M at n = 10 (short
    // substrings repeat across unrelated docs; 24-char runs only survive in
    // real near-dups), and with max df = 18 there are no stop-shingles to
    // guard, so the UNGUARDED single-join branch is the right plan — the
    // guarded split re-evaluates the 1.45M-row shingle explode 8x and
    // measured 3x slower here (the guard's oracle coverage lives in q22).
    "q44_char_jaccard" -> ((s, d) => {
      // lazy-pinned: the shingle frame feeds THREE consumers (per-doc sizes
      // + both sides of the inverted-index self-join), and each re-ran the
      // scan + normalize + 24-char explode + distinct without it — at sf1
      // that re-evaluation was most of the query (91 s → measured with the
      // pin below; stored rows are (doc_id, hash) pairs, 16 bytes each)
      Dedup.jaccardPairsFromShingles(
          Dedup.charShingleHashes(Tables.documentsWide(s, d), "doc_id", "text",
            n = 24).localCheckpoint(false),
          "doc_id", minJaccard = 0.3)
        .select(col("id_a"), col("id_b"), col("inter").as("shared"),
          (floor(col("jaccard") * 1e6 + 0.5) / 1e6).as("jaccard"))
    }),

    // ---- embedding-cosine near-dup, bucketed by IVF cell -------------------
    "q35_cosine_near_dups" -> ((s, d) => {
      val vecs = Tables.embeddingsWide(s, d)
      Similarity.cosineNearDups(vecs, "vec_id", "embedding",
          centroids = vecs.filter(col("vec_id") % 50 === 7),
          "vec_id", "embedding", minCosine = 0.4)
        .select(col("id_a"), col("id_b"),
          (floor(col("cosine") * 1e6 + 0.5) / 1e6).as("cosine"))
    }),

    // ---- random-hyperplane LSH near-dup (the data-independent ANN tier) ---
    // q35's IVF cells adapt to the corpus but need centroids fit and
    // maintained; SRP signatures are pure projections — a new row bands
    // with one matrix multiply, no second pass — the right tier for
    // streaming ingestion and the high-cosine regime. Integer hyperplanes
    // (FNV-derived, [-500, 500]) on scaled-long vectors keep every sign bit
    // exact, so the banded candidate set is hash-checked cross-engine, not
    // rows-only. 8-bit bands pass ~1/256 of unrelated pairs per band;
    // verification with the exact cosine makes banding recall-only.
    // The synthetic corpus has no high-cosine pairs (max 0.51), so the
    // query PLANTS them — every 50th vector re-enters at id+100000 with
    // dim 0 nudged by +0.05 (cos ≈ 0.9987 against its source; the corpus
    // is unit-norm) — the q68 fabricate-then-detect device. The plant
    // arithmetic is double-exact in both engines.
    "q77_srp_near_dups" -> ((s, d) => {
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = vecs.filter(col("vec_id") % 50 === 3)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + when(i === 0, lit(0.05)).otherwise(lit(0.0)))
            .as("embedding"))
      // 16-bit bands (128 hyperplane bits / 8 bands): band width is the
      // knob that keeps bucket occupancy ~O(1) as the corpus grows —
      // the sf1 scale run measured the old 8-bit bands (256 buckets/band)
      // going quadratic in candidates at 10x density (18.6x wall), while
      // 16-bit bands hold the same planted-pair recall (agree-prob
      // 0.984^16 per band, 8 bands -> 99.99%) with 65536 buckets/band.
      // At 100 TB, bits/band scales as ~log2(n) for constant occupancy.
      Similarity.srpNearDups(vecs.unionByName(planted), "vec_id", "embedding",
          dims = 64, bits = 128, bands = 8, minCosine = 0.95)
        .select(col("id_a"), col("id_b"),
          (floor(col("cosine") * 1e6 + 0.5) / 1e6).as("cosine"))
    }),

    // ---- streaming/batch unification: the X16 pipeline in batch mode -------
    // EventStream.windowedTypeCounts is written once and planned either
    // incrementally (readStream + watermark, EventStreamSpec) or as a plain
    // batch aggregate — this entry runs the SAME function on the batch table
    // so the driver's oracle pins its semantics (watermark is a no-op in
    // batch; approx_count_distinct dropped — HLL has no cross-engine twin).
    "q47_stream_batch_twin" -> ((s, d) => {
      graft.streaming.EventStream
        .windowedTypeCounts(Tables.events(s, d))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
          col("event_type"), col("events"))
    }),

    // ---- rolling-hash document sketch (X11b) -------------------------------
    // min-FNV over word trigram windows (winnowing with w = infinity);
    // tokens projected once per row, then the window min — the sketch a
    // curation pipeline stores per document for cheap near-dup prefilters.
    "q51_rolling_sketch" -> ((s, d) => {
      // NULL texts excluded explicitly on BOTH sides: Spark would otherwise
      // sketch hash("") for them while SQL's len(NULL) comparisons drop them
      Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          TextAnalysis.rollingMinHashTokens(col("__toks"), n = 3,
            portable = true).as("sketch"))
    }),

    // ---- session windows in batch mode (X16b) ------------------------------
    // EventStream.sessionWindowCounts on the batch table: Spark's
    // session_window (merge events < 30 min apart per user, end = last
    // event + gap) against the classic gaps-and-islands SQL re-expression.
    // Same batch/stream-unification point as q47 for the variable-length
    // window operator a tumbling window cannot express.
    "q50_session_windows" -> ((s, d) => {
      graft.streaming.EventStream
        .sessionWindowCounts(Tables.events(s, d))
        .select(
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("user_id"), col("events"))
    }),

    // ---- closed-session emission, batch twin (X68b) ------------------------
    // the output SHAPE of EventStream.closedSessions pinned by a DuckDB
    // oracle: gaps-and-islands with the identical boundary rule (merge iff
    // gap <= 30 min — note q50's session_window merges on STRICTLY-less,
    // a deliberate semantic difference pinned by both oracles), emitting
    // only sessions a later event of the same user proved closed. Emission
    // TIMING stays spec-land (EventStreamSpec) — timing has no batch twin.
    "q98_closed_sessions" -> ((s, d) => {
      graft.streaming.EventStream.closedSessionsBatchTwin(
        Tables.events(s, d), gapMicros = 30L * 60 * 1000 * 1000)
    }),

    // ---- stream-stream attribution join, batch twin (X77b) -----------------
    // EventStream.attributionJoin on the batch table: every purchase pairs
    // with each same-user click in the preceding 30 minutes (inclusive
    // bounds). The streaming side — watermarks on both inputs, time-range
    // state eviction — is spec-land (EventStreamSpec); this twin pins the
    // OUTPUT of the identical code path under a DuckDB oracle. Timestamps
    // leave as epoch micros (both engines compare at the µs truncation
    // Tables.events reads at).
    "q102_attribution_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.streaming.EventStream.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
    }),

    // ---- exact interpolated percentiles of doc length per language ---------
    // (the quality-score distribution cut a curation pipeline filters on;
    // exact `percentile`, not approx — deterministic and oracle-matched)
    "q37_length_quantiles" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          percentile(col("n_chars"), lit(0.25)).as("p25"),
          percentile(col("n_chars"), lit(0.5)).as("p50"),
          percentile(col("n_chars"), lit(0.75)).as("p75"))
    }),

    // ---- rollup subtotals (grouping-set aggregate surface) -----------------
    "q38_rollup_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("orders"),
          XDet.moneySum(col("o_totalprice"), 2).as("total"))
    }),

    // ---- intersect / except set operations ---------------------------------
    "q39_set_ops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val openOrders = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      val inDebt = c.filter(col("c_acctbal") < 0).select("c_custkey")
      building.intersect(openOrders).except(inDebt)
    }),

    // ---- duplicate clustering: near-dup PAIRS -> duplicate GROUPS ----------
    // the step between pair detection (q22/q23/q27) and "keep one doc per
    // class": connected components of the Jaccard pair graph via iterative
    // min-label propagation (graft.operators.ConnectedComponents). The
    // sf0.01 graph has a 3-doc chain, so at least one label must propagate
    // TRANSITIVELY (a doc adopts the min id of a doc it shares no edge
    // with) — the oracle's recursive CTE pins exactly that closure.
    "q54_dup_clusters" -> ((s, d) => {
      // plain scan: the q22 widen-replay revert (widen_ab_r12)
      val pairs = Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"))
      graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("component")))
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- end-to-end corpus dedup: the keep/drop verdict per document ------
    // q54's cluster step closed over the WHOLE corpus: every doc gets its
    // canonical survivor (cluster min-id; itself when it has no near-dup)
    // and a kept flag — the row-level decision an actual curation pipeline
    // writes back. Singletons never enter the pair graph, so the component
    // frame stays |dup-docs|-sized and the corpus only pays one left join.
    "q59_corpus_dedup" -> ((s, d) => {
      // plain scan: the q22 widen-replay revert (widen_ab_r12)
      val docs = Tables.documents(s, d)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"))
      val comp = graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"), col("lang"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("canonical_id", coalesce(col("component"), col("doc_id")))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("canonical_id")))
        .withColumn("kept",
          (col("doc_id") === col("canonical_id")).cast("int"))
        .drop("component")
    }),

    // ---- dedup SURVIVORSHIP: quality-aware representative per cluster ------
    // q59 keeps the min-id doc per near-dup cluster — the arbitrary policy.
    // Production dedup keeps the BEST copy (the longest / highest-quality
    // variant of a templated family), so this emits, per doc: its cluster,
    // the cluster's survivor under (score DESC, doc_id ASC) with score =
    // whitespace token count, and the keep verdict. The argmax is a
    // map-side-mergeable max(struct(score, -id)) AGGREGATE, not a window —
    // a giant template family is one group, and the aggregate's partial
    // merge splits it across partitions where a window would put the whole
    // family under one key (the q49 pathology). The scored frame is pinned:
    // it feeds the argmax AND the verdict join, and unpinned each consumer
    // would replay the shingle/CC chain.
    "q162_dedup_survivorship" -> ((s, d) => {
      // plain scan: the q22 widen-replay revert (widen_ab_r12)
      val docs = Tables.documents(s, d)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"))
      val comp = graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      val scored = graft.ext.Caches.pin(docs
        .select(col("doc_id"),
          greatest(TextAnalysis.tokenCount(col("text")), lit(0L)).as("score"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("canonical_id", coalesce(col("component"), col("doc_id")))
        .drop("component"))
      val best = scored.groupBy("canonical_id").agg(
          count(lit(1)).as("cluster_size"),
          max(struct(col("score"), (-col("doc_id")).as("__nid"))).as("__b"))
        .select(col("canonical_id"), col("cluster_size"),
          (-col("__b.__nid")).as("survivor_id"))
      scored.join(best, Seq("canonical_id"))
        .select(col("doc_id"), col("canonical_id"), col("cluster_size"),
          col("score"), col("survivor_id"),
          (col("doc_id") === col("survivor_id")).cast("long").as("kept"))
    }),

    // ---- capstone: the composed curation pipeline --------------------------
    // dedup keep-verdict (X33) -> deterministic hash split (X29) -> per-split
    // corpus stats: the end product a training-data pipeline actually emits.
    // Every stage is the already-oracle-checked operator; this entry pins
    // their COMPOSITION end-to-end (q46/q48/q49 do the same for the three
    // reference jobs).
    "q73_curation_pipeline" -> ((s, d) => {
      import graft.plans.Fnv1a64Expression.fnv1a64
      // plain scan: the q22 widen-replay revert (widen_ab_r12)
      val docs = Tables.documents(s, d)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.1, maxShingleDf = 5L)
        .select(col("id_a"), col("id_b"))
      val comp = graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      val kept = docs.join(comp, Seq("doc_id"), "left")
        .filter(col("component").isNull || col("component") === col("doc_id"))
      val bucket = pmod(fnv1a64(col("doc_id")), lit(100L))
      kept
        .withColumn("split", when(bucket < 80, "train")
          .when(bucket < 90, "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q21_exact_dup_groups" ->
      s"""SELECT doc_id, md5($normSql) AS fp,
         |  count(*) OVER (PARTITION BY md5($normSql)) AS group_size,
         |  min(doc_id) OVER (PARTITION BY md5($normSql)) AS canonical_id
         |FROM documents""".stripMargin,

    // mirrors the guarded branch of Dedup.jaccardPairs: candidates from
    // shingles with df <= 5 only, true intersection counted over ALL
    // shingles (cold count + hot recount == recount over everything)
    "q22_jaccard_near_dups" ->
      s"""WITH $jaccardCtes
         |SELECT id_a, id_b, inter AS shared,
         |  floor(CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)*1000000.0
         |    + 0.5)/1000000.0 AS jaccard
         |FROM inter
         |JOIN sizes na ON id_a = na.doc_id
         |JOIN sizes nb ON id_b = nb.doc_id
         |WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter) >= 0.1""".stripMargin,

    // same kept-vocabulary definition (df·1000 <= N·100), same integer
    // certificate — but candidates here come from the UNFILTERED
    // all-shared-term inverted index: the Spark side's weighted prefix
    // filter claims provable completeness, so the oracle must not
    // mirror it — any recall loss hash-fails
    "q134_cosine_near_dups" ->
      s"""WITH w AS (SELECT doc_id, unnest(${TextSql.words}) AS t
         |  FROM documents),
         |nn AS (SELECT count(*) AS n FROM documents),
         |tf AS (SELECT doc_id, t, count(*) AS tf FROM w GROUP BY 1, 2),
         |keptT AS (SELECT t, df FROM (SELECT t, count(*) AS df FROM tf
         |  GROUP BY 1) CROSS JOIN nn WHERE df * 1000 <= n * 100),
         |kept AS (SELECT tf.doc_id, tf.t, tf.tf, keptT.df
         |  FROM tf JOIN keptT ON tf.t = keptT.t),
         |n2 AS (SELECT doc_id, sum(tf * tf) AS n2 FROM kept GROUP BY 1),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM kept a JOIN kept b ON a.t = b.t AND a.doc_id < b.doc_id),
         |dots AS (SELECT c.id_a, c.id_b, sum(a.tf * b.tf) AS dot
         |  FROM cand c
         |  JOIN kept a ON a.doc_id = c.id_a
         |  JOIN kept b ON b.doc_id = c.id_b AND b.t = a.t
         |  GROUP BY 1, 2)
         |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
         |  CAST(dot AS BIGINT) AS dot,
         |  CAST(na.n2 AS BIGINT) AS n2_a, CAST(nb.n2 AS BIGINT) AS n2_b,
         |  CAST((dot * dot * 1000000) // (na.n2 * nb.n2) AS BIGINT)
         |    AS cos2_micro
         |FROM dots
         |JOIN n2 na ON dots.id_a = na.doc_id
         |JOIN n2 nb ON dots.id_b = nb.doc_id
         |WHERE 2 * dot * dot >= na.n2 * nb.n2""".stripMargin,

    // both passes re-derived: per-block row_number, rank-distance pairs,
    // union + distinct, exact levenshtein — same metric, same blocks
    "q138_sorted_neighborhood" -> {
      val title = s"substr($normSql, 1, 32)"
      def passSql(blk: String, alias: String) =
        s"""$alias AS (SELECT id, k,
           |    row_number() OVER (PARTITION BY $blk ORDER BY k, id) AS rn,
           |    $blk AS blk
           |  FROM v),
           |${alias}p AS (SELECT
           |    CASE WHEN a.id < b.id THEN a.id ELSE b.id END AS id_a,
           |    CASE WHEN a.id < b.id THEN b.id ELSE a.id END AS id_b,
           |    CASE WHEN a.id < b.id THEN a.k ELSE b.k END AS key_a,
           |    CASE WHEN a.id < b.id THEN b.k ELSE a.k END AS key_b
           |  FROM $alias a JOIN $alias b
           |    ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4)"""
          .stripMargin
      s"""WITH v AS (SELECT doc_id AS id, $title AS k FROM documents),
         |${passSql("substr(k, 1, 4)", "n1")},
         |${passSql("substr(reverse(k), 1, 4)", "n2")},
         |u AS (SELECT DISTINCT id_a, id_b, key_a, key_b FROM
         |  (SELECT * FROM n1p UNION ALL SELECT * FROM n2p))
         |SELECT id_a, id_b, key_a, key_b,
         |  CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
         |FROM u WHERE levenshtein(key_a, key_b) <= 8""".stripMargin
    },

    // deliberately the PLAIN formulation — every shared-shingle pair with
    // its exact Jaccard, no prefix logic: the prefix filter is a pruning
    // device and must be invisible in the result (q78's Bloom device)
    "q100_prefix_jaccard" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
         |        FROM w WHERE len(ws) >= 3),
         |sh AS (SELECT DISTINCT doc_id,
         |         array_to_string(ws[i+1:i+3], ' ') AS shingle FROM idx),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b
         |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, inter AS shared,
         |  floor(CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)*1000000.0
         |    + 0.5)/1000000.0 AS jaccard
         |FROM inter
         |JOIN sizes na ON id_a = na.doc_id
         |JOIN sizes nb ON id_b = nb.doc_id
         |WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter) >= 0.4""".stripMargin,

    // the same pair pipeline, closed transitively: DuckDB's recursive CTE
    // computes min-reachable-id per vertex — a different algorithm than the
    // Spark side's iterative label propagation, deliberately
    "q54_dup_clusters" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes na ON id_a = na.doc_id
         |          JOIN sizes nb ON id_b = nb.doc_id
         |          WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)
         |            >= 0.1),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
         |SELECT id AS doc_id, component,
         |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
         |    AS cluster_size
         |FROM comp""".stripMargin,

    // q54's transitive closure, joined back onto the whole corpus: the same
    // recursive CTE, then every document resolves its survivor
    "q59_corpus_dedup" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes na ON id_a = na.doc_id
         |          JOIN sizes nb ON id_b = nb.doc_id
         |          WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)
         |            >= 0.1),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
         |SELECT d.doc_id, d.lang,
         |  coalesce(comp.component, d.doc_id) AS canonical_id,
         |  CAST(count(*) OVER (
         |    PARTITION BY coalesce(comp.component, d.doc_id)) AS BIGINT)
         |    AS cluster_size,
         |  CASE WHEN d.doc_id = coalesce(comp.component, d.doc_id)
         |       THEN 1 ELSE 0 END AS kept
         |FROM documents d LEFT JOIN comp ON comp.id = d.doc_id""".stripMargin,

    // q59's transitive closure + a deterministic (score DESC, doc_id)
    // argmax per component — the survivor join replayed independently
    "q162_dedup_survivorship" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes na ON id_a = na.doc_id
         |          JOIN sizes nb ON id_b = nb.doc_id
         |          WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)
         |            >= 0.1),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
         |scored AS (SELECT d.doc_id,
         |    greatest(CAST(len(${TextSql.words}) AS BIGINT), 0) AS score,
         |    coalesce(comp.component, d.doc_id) AS canonical_id
         |  FROM documents d LEFT JOIN comp ON comp.id = d.doc_id),
         |ranked AS (SELECT *,
         |    row_number() OVER (PARTITION BY canonical_id
         |      ORDER BY score DESC, doc_id) AS rn,
         |    CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
         |      AS cluster_size
         |  FROM scored),
         |best AS (SELECT canonical_id, doc_id AS survivor_id
         |         FROM ranked WHERE rn = 1)
         |SELECT r.doc_id, r.canonical_id, r.cluster_size, r.score,
         |  b.survivor_id,
         |  CAST(CASE WHEN r.doc_id = b.survivor_id THEN 1 ELSE 0 END
         |    AS BIGINT) AS kept
         |FROM ranked r JOIN best b USING (canonical_id)""".stripMargin,

    // the composition oracle: q59's transitive-closure keep set, q55's FNV
    // bucket arithmetic, one final rollup
    "q73_curation_pipeline" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
      val fnv = toSignedSqlText(
        longSqlText("14695981039346656037::HUGEINT", "doc_id::HUGEINT"))
      s"""WITH RECURSIVE $jaccardCtes,
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes na ON id_a = na.doc_id
         |          JOIN sizes nb ON id_b = nb.doc_id
         |          WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)
         |            >= 0.1),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
         |kept AS (SELECT d.* FROM documents d
         |         LEFT JOIN comp ON comp.id = d.doc_id
         |         WHERE comp.component IS NULL
         |            OR comp.component = d.doc_id)
         |SELECT CASE WHEN ((($fnv) % 100) + 100) % 100 < 80 THEN 'train'
         |            WHEN ((($fnv) % 100) + 100) % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM kept GROUP BY 1, 2""".stripMargin
    },

    // full portable-hash oracle: FNV-1a 64 signatures (HUGEINT mod-2^64
    // arithmetic, bit-identical to graft.plans.Fnv1a64Expression), banded on
    // the raw 4-row signature slices (bucket-hash equality on the Spark side
    // <=> slice equality), then the same true-Jaccard verification as q22
    "q23_minhash_near_dups" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, stringSqlText, toSignedSqlText}
      val fam = toSignedSqlText(
        longSqlText(longSqlText("14695981039346656037::HUGEINT", "k::HUGEINT"), "bh"))
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
         |        FROM w WHERE len(ws) >= 3),
         |sh AS (SELECT DISTINCT doc_id,
         |         array_to_string(ws[i+1:i+3], ' ') AS shingle FROM idx),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |base AS (SELECT doc_id, ${stringSqlText("shingle")} AS bh FROM sh),
         |fam AS (SELECT doc_id, k, min($fam) AS m
         |        FROM base CROSS JOIN (SELECT unnest(range(64)) AS k)
         |        GROUP BY doc_id, k),
         |bandsig AS (SELECT doc_id, k // 4 AS band, list(m ORDER BY k) AS bs
         |            FROM fam GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bandsig a JOIN bandsig b
         |           ON a.band = b.band AND a.bs = b.bs AND a.doc_id < b.doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS inter
         |          FROM cand
         |          JOIN sh sa ON sa.doc_id = id_a
         |          JOIN sh sb ON sb.doc_id = id_b AND sb.shingle = sa.shingle
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  floor(CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)*1000000.0
         |    + 0.5)/1000000.0 AS jaccard
         |FROM inter
         |JOIN sizes na ON id_a = na.doc_id
         |JOIN sizes nb ON id_b = nb.doc_id
         |WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter) >= 0.5""".stripMargin
    },

    // the q23 banding oracle generalized over three band configurations
    // (band id = k div (64 div bands)) joined against the exhaustive
    // inverted-index truth pairs at τ=0.35 over the tripled corpus (each
    // doc + its 2/5 and 4/5 token prefixes — the oracle SLICES the token
    // list where the engine re-tokenizes the joined prefix text, so
    // normalize-idempotence is itself under test); found=1 iff the true
    // pair is an LSH candidate under that configuration. Exact-signature
    // band equality here vs hashed buckets in the engine: the device must
    // be invisible.
    "q170_lsh_recall_sweep" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, stringSqlText, toSignedSqlText}
      val fam = toSignedSqlText(
        longSqlText(longSqlText("14695981039346656037::HUGEINT", "k::HUGEINT"), "bh"))
      s"""WITH w0 AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |w AS (SELECT doc_id, ws FROM w0
         |      UNION ALL
         |      SELECT doc_id + 10000000, ws[1:len(ws)*2//5] FROM w0
         |      UNION ALL
         |      SELECT doc_id + 20000000, ws[1:len(ws)*4//5] FROM w0),
         |idx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
         |        FROM w WHERE len(ws) >= 3),
         |sh AS (SELECT DISTINCT doc_id,
         |         array_to_string(ws[i+1:i+3], ' ') AS shingle FROM idx),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |          FROM sh a JOIN sh b
         |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |truth AS (SELECT id_a, id_b,
         |    floor(CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)*1000000.0
         |      + 0.5)/1000000.0 AS jaccard
         |  FROM inter
         |  JOIN sizes na ON id_a = na.doc_id
         |  JOIN sizes nb ON id_b = nb.doc_id
         |  WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter) >= 0.35),
         |base AS (SELECT doc_id, ${stringSqlText("shingle")} AS bh FROM sh),
         |fam AS (SELECT doc_id, k, min($fam) AS m
         |        FROM base CROSS JOIN (SELECT unnest(range(64)) AS k)
         |        GROUP BY doc_id, k),
         |cfg AS (SELECT unnest([8, 16, 32]) AS bands),
         |bandsig AS (SELECT doc_id, bands, k // (64 // bands) AS band,
         |              list(m ORDER BY k) AS bs
         |            FROM fam CROSS JOIN cfg GROUP BY 1, 2, 3),
         |cand AS (SELECT DISTINCT a.bands, a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bandsig a JOIN bandsig b
         |           ON a.bands = b.bands AND a.band = b.band AND a.bs = b.bs
         |             AND a.doc_id < b.doc_id)
         |SELECT CAST(cfg.bands AS BIGINT) AS bands, t.id_a, t.id_b, t.jaccard,
         |  CAST(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS found
         |FROM truth t CROSS JOIN cfg
         |LEFT JOIN cand c ON c.bands = cfg.bands
         |  AND c.id_a = t.id_a AND c.id_b = t.id_b""".stripMargin
    },

    // the q23 banding oracle split into batch/corpus frames: signatures and
    // band lists computed once over the union, candidates restricted to
    // batch×corpus, intersection recounted cross-frame only
    "q74_cross_lsh_dedup" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, stringSqlText, toSignedSqlText}
      val fam = toSignedSqlText(
        longSqlText(longSqlText("14695981039346656037::HUGEINT", "k::HUGEINT"), "bh"))
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
         |        FROM w WHERE len(ws) >= 3),
         |sh AS (SELECT DISTINCT doc_id,
         |         array_to_string(ws[i+1:i+3], ' ') AS shingle FROM idx),
         |sha AS (SELECT * FROM sh WHERE doc_id % 10 = 7),
         |shb AS (SELECT * FROM sh WHERE doc_id % 10 != 7),
         |sizesa AS (SELECT doc_id, count(*) AS n_a FROM sha GROUP BY 1),
         |sizesb AS (SELECT doc_id, count(*) AS n_b FROM shb GROUP BY 1),
         |base AS (SELECT doc_id, ${stringSqlText("shingle")} AS bh FROM sh),
         |fam AS (SELECT doc_id, k, min($fam) AS m
         |        FROM base CROSS JOIN (SELECT unnest(range(64)) AS k)
         |        GROUP BY doc_id, k),
         |bandsig AS (SELECT doc_id, k // 4 AS band, list(m ORDER BY k) AS bs
         |            FROM fam GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bandsig a JOIN bandsig b
         |           ON a.band = b.band AND a.bs = b.bs
         |         WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 != 7),
         |inter AS (SELECT id_a, id_b, count(*) AS inter
         |          FROM cand
         |          JOIN sha sa ON sa.doc_id = id_a
         |          JOIN shb sb ON sb.doc_id = id_b AND sb.shingle = sa.shingle
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  floor(CAST(inter AS DOUBLE)/(na.n_a + nb.n_b - inter)*1000000.0
         |    + 0.5)/1000000.0 AS jaccard
         |FROM inter
         |JOIN sizesa na ON id_a = na.doc_id
         |JOIN sizesb nb ON id_b = nb.doc_id
         |WHERE CAST(inter AS DOUBLE)/(na.n_a + nb.n_b - inter) >= 0.5""".stripMargin
    },

    // same token/ngram arrays via list comprehensions; every ratio is the
    // identical exact-int quotient quantized at 1e-6
    "q80_repetition_signals" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |g AS (SELECT doc_id, ws,
         |  CASE WHEN len(ws) >= 3
         |    THEN [array_to_string(ws[i+1:i+3], ' ')
         |          FOR i IN range(0, len(ws)-2)]
         |    ELSE [] END AS gs
         |  FROM w)
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(ws) > 0 THEN
         |    floor(CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)
         |      /len(ws)*1000000.0 + 0.5)/1000000.0 END AS dup_token_ratio,
         |  CASE WHEN len(gs) > 0 THEN
         |    floor(CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE)
         |      /len(gs)*1000000.0 + 0.5)/1000000.0 END AS dup_trigram_ratio,
         |  CASE WHEN len(ws) > 0 THEN
         |    floor(CAST(list_max([len(list_filter(ws, x -> x = t))
         |        FOR t IN list_distinct(ws)]) AS DOUBLE)
         |      /len(ws)*1000000.0 + 0.5)/1000000.0 END AS top_token_ratio
         |FROM g""".stripMargin,

    // the same cross-frame 5-gram inverted index, thresholded at 3
    "q81_decontamination" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, unnest(range(len(ws)-4)) AS i
         |        FROM w WHERE len(ws) >= 5),
         |sh AS (SELECT DISTINCT doc_id,
         |         array_to_string(ws[i+1:i+5], ' ') AS s FROM idx),
         |ov AS (SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS overlap
         |       FROM (SELECT * FROM sh WHERE doc_id % 25 <> 11) c
         |       JOIN (SELECT * FROM sh WHERE doc_id % 25 = 11) b USING (s)
         |       GROUP BY 1, 2),
         |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
         |           CAST(max(overlap) AS BIGINT) AS max_overlap
         |         FROM ov WHERE overlap >= 3 GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(h.n_bench_hits, 0) AS n_bench_hits,
         |  coalesce(h.max_overlap, 0) AS max_overlap,
         |  CASE WHEN h.n_bench_hits IS NOT NULL THEN 1 ELSE 0 END
         |    AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id % 25 <> 11""".stripMargin,

    // the incremental-merge oracle closes the WHOLE graph in one recursive
    // CTE — corpus-internal pairs (df guard over the corpus), cross pairs
    // (corpus-side guard, as q69), and batch-internal pairs (batch-side
    // guard) — so the Spark side's two-step labels-then-merge must land on
    // exactly the same components as a from-scratch closure
    "q76_incremental_clusters" -> {
      def frame(sfx: String, pred: String): String =
        s"""w$sfx AS (SELECT doc_id, $wordsSql AS ws FROM documents
           |          WHERE $pred),
           |idx$sfx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
           |            FROM w$sfx WHERE len(ws) >= 3),
           |sh$sfx AS MATERIALIZED (SELECT DISTINCT doc_id,
           |             array_to_string(ws[i+1:i+3], ' ') AS shingle
           |           FROM idx$sfx),
           |sizes$sfx AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh$sfx
           |              GROUP BY 1),
           |df$sfx AS MATERIALIZED (SELECT shingle, count(*) AS df FROM sh$sfx GROUP BY 1),
           |gen$sfx AS MATERIALIZED (SELECT s.doc_id, s.shingle FROM sh$sfx s
           |            JOIN df$sfx USING (shingle) WHERE df <= 5)""".stripMargin
      def withinPairs(sfx: String): String =
        s"""cand$sfx AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |             FROM gen$sfx a JOIN gen$sfx b USING (shingle)
           |             WHERE a.doc_id < b.doc_id),
           |inter$sfx AS (SELECT id_a, id_b, count(*) AS inter FROM cand$sfx
           |              JOIN sh$sfx sa ON sa.doc_id = id_a
           |              JOIN sh$sfx sb ON sb.doc_id = id_b
           |                AND sb.shingle = sa.shingle
           |              GROUP BY 1, 2),
           |pairs$sfx AS (SELECT id_a, id_b FROM inter$sfx
           |              JOIN sizes$sfx na ON id_a = na.doc_id
           |              JOIN sizes$sfx nb ON id_b = nb.doc_id
           |              WHERE CAST(inter AS DOUBLE)
           |                /(na.n_sh + nb.n_sh - inter) >= 0.1)""".stripMargin
      s"""WITH RECURSIVE ${frame("a", "doc_id % 10 = 7")},
         |${frame("b", "doc_id % 10 <> 7")},
         |${withinPairs("a")},
         |${withinPairs("b")},
         |genab AS (SELECT s.doc_id, s.shingle FROM sha s
         |          JOIN dfb USING (shingle) WHERE df <= 5),
         |candc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM genab a JOIN genb b USING (shingle)),
         |interc AS (SELECT id_a, id_b, count(*) AS inter FROM candc
         |           JOIN sha sa ON sa.doc_id = id_a
         |           JOIN shb sb ON sb.doc_id = id_b
         |             AND sb.shingle = sa.shingle
         |           GROUP BY 1, 2),
         |pairsc AS (SELECT id_a, id_b FROM interc
         |           JOIN sizesa na ON id_a = na.doc_id
         |           JOIN sizesb nb ON id_b = nb.doc_id
         |           WHERE CAST(inter AS DOUBLE)
         |             /(na.n_sh + nb.n_sh - inter) >= 0.1),
         |alledges AS (SELECT id_a AS u, id_b AS v FROM pairsa
         |             UNION SELECT id_a, id_b FROM pairsb
         |             UNION SELECT id_a, id_b FROM pairsc),
         |edges AS MATERIALIZED (SELECT u, v FROM alledges UNION SELECT v, u FROM alledges),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
         |SELECT id AS doc_id, component,
         |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
         |    AS cluster_size
         |FROM comp""".stripMargin
    },

    // q76's whole-graph closure PLUS an independent base-graph closure:
    // the final labels come from the union closure (so the fold's two-path
    // union must agree with a from-scratch run), and the touched flag is
    // re-derived from first principles — a vertex is touched iff it is a
    // batch-pair endpoint or its BASE component contains one
    "q187_cc_fold" -> {
      def frame(sfx: String, pred: String): String =
        s"""w$sfx AS (SELECT doc_id, $wordsSql AS ws FROM documents
           |          WHERE $pred),
           |idx$sfx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
           |            FROM w$sfx WHERE len(ws) >= 3),
           |sh$sfx AS MATERIALIZED (SELECT DISTINCT doc_id,
           |             array_to_string(ws[i+1:i+3], ' ') AS shingle
           |           FROM idx$sfx),
           |sizes$sfx AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh$sfx
           |              GROUP BY 1),
           |df$sfx AS MATERIALIZED (SELECT shingle, count(*) AS df FROM sh$sfx GROUP BY 1),
           |gen$sfx AS MATERIALIZED (SELECT s.doc_id, s.shingle FROM sh$sfx s
           |            JOIN df$sfx USING (shingle) WHERE df <= 5)""".stripMargin
      def withinPairs(sfx: String): String =
        s"""cand$sfx AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |             FROM gen$sfx a JOIN gen$sfx b USING (shingle)
           |             WHERE a.doc_id < b.doc_id),
           |inter$sfx AS (SELECT id_a, id_b, count(*) AS inter FROM cand$sfx
           |              JOIN sh$sfx sa ON sa.doc_id = id_a
           |              JOIN sh$sfx sb ON sb.doc_id = id_b
           |                AND sb.shingle = sa.shingle
           |              GROUP BY 1, 2),
           |pairs$sfx AS MATERIALIZED (SELECT id_a, id_b FROM inter$sfx
           |              JOIN sizes$sfx na ON id_a = na.doc_id
           |              JOIN sizes$sfx nb ON id_b = nb.doc_id
           |              WHERE CAST(inter AS DOUBLE)
           |                /(na.n_sh + nb.n_sh - inter) >= 0.1)""".stripMargin
      s"""WITH RECURSIVE ${frame("a", "doc_id % 10 = 7")},
         |${frame("b", "doc_id % 10 <> 7")},
         |${withinPairs("a")},
         |${withinPairs("b")},
         |genab AS (SELECT s.doc_id, s.shingle FROM sha s
         |          JOIN dfb USING (shingle) WHERE df <= 5),
         |candc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM genab a JOIN genb b USING (shingle)),
         |interc AS (SELECT id_a, id_b, count(*) AS inter FROM candc
         |           JOIN sha sa ON sa.doc_id = id_a
         |           JOIN shb sb ON sb.doc_id = id_b
         |             AND sb.shingle = sa.shingle
         |           GROUP BY 1, 2),
         |pairsc AS MATERIALIZED (SELECT id_a, id_b FROM interc
         |           JOIN sizesa na ON id_a = na.doc_id
         |           JOIN sizesb nb ON id_b = nb.doc_id
         |           WHERE CAST(inter AS DOUBLE)
         |             /(na.n_sh + nb.n_sh - inter) >= 0.1),
         |alledges AS (SELECT id_a AS u, id_b AS v FROM pairsa
         |             UNION SELECT id_a, id_b FROM pairsb
         |             UNION SELECT id_a, id_b FROM pairsc),
         |edges AS MATERIALIZED (SELECT u, v FROM alledges UNION SELECT v, u FROM alledges),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
         |comp AS MATERIALIZED (SELECT id, min(r) AS component
         |  FROM reach GROUP BY 1),
         |bedges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairsb
         |          UNION SELECT id_b, id_a FROM pairsb),
         |bverts AS (SELECT DISTINCT u AS id FROM bedges),
         |breach(id, r) AS (
         |  SELECT id, id FROM bverts
         |  UNION
         |  SELECT e.u, breach.r FROM bedges e JOIN breach ON e.v = breach.id),
         |bcomp AS MATERIALIZED (SELECT id, min(r) AS component
         |  FROM breach GROUP BY 1),
         |bends AS MATERIALIZED (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairsa UNION SELECT id_b FROM pairsa
         |  UNION SELECT id_a FROM pairsc UNION SELECT id_b FROM pairsc)),
         |troots AS MATERIALIZED (SELECT DISTINCT bc.component
         |  FROM bcomp bc JOIN bends ON bc.id = bends.id)
         |SELECT c.id AS doc_id, c.component,
         |  CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT)
         |    AS cluster_size,
         |  CAST(CASE WHEN be.id IS NOT NULL THEN 1
         |    WHEN tr.component IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS touched
         |FROM comp c
         |LEFT JOIN bends be ON be.id = c.id
         |LEFT JOIN bcomp bc ON bc.id = c.id
         |LEFT JOIN troots tr ON tr.component = bc.component""".stripMargin
    },

    // base closure, touched roots, and the SURVIVOR closure (base pairs
    // minus retracted endpoints) all re-derived from scratch — the
    // operator's frontier restriction and pass-through are under the hash
    "q188_cc_unfold" -> {
      def frame(sfx: String, pred: String): String =
        s"""w$sfx AS (SELECT doc_id, $wordsSql AS ws FROM documents
           |          WHERE $pred),
           |idx$sfx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
           |            FROM w$sfx WHERE len(ws) >= 3),
           |sh$sfx AS MATERIALIZED (SELECT DISTINCT doc_id,
           |             array_to_string(ws[i+1:i+3], ' ') AS shingle
           |           FROM idx$sfx),
           |sizes$sfx AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh$sfx
           |              GROUP BY 1),
           |df$sfx AS MATERIALIZED (SELECT shingle, count(*) AS df FROM sh$sfx GROUP BY 1),
           |gen$sfx AS MATERIALIZED (SELECT s.doc_id, s.shingle FROM sh$sfx s
           |            JOIN df$sfx USING (shingle) WHERE df <= 5)""".stripMargin
      def withinPairs(sfx: String): String =
        s"""cand$sfx AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |             FROM gen$sfx a JOIN gen$sfx b USING (shingle)
           |             WHERE a.doc_id < b.doc_id),
           |inter$sfx AS (SELECT id_a, id_b, count(*) AS inter FROM cand$sfx
           |              JOIN sh$sfx sa ON sa.doc_id = id_a
           |              JOIN sh$sfx sb ON sb.doc_id = id_b
           |                AND sb.shingle = sa.shingle
           |              GROUP BY 1, 2),
           |pairs$sfx AS MATERIALIZED (SELECT id_a, id_b FROM inter$sfx
           |              JOIN sizes$sfx na ON id_a = na.doc_id
           |              JOIN sizes$sfx nb ON id_b = nb.doc_id
           |              WHERE CAST(inter AS DOUBLE)
           |                /(na.n_sh + nb.n_sh - inter) >= 0.1)""".stripMargin
      s"""WITH RECURSIVE ${frame("b", "doc_id % 10 <> 7")},
         |${withinPairs("b")},
         |retr AS MATERIALIZED (SELECT doc_id AS r FROM documents
         |        WHERE doc_id % 10 <> 7 AND doc_id % 10 = 3),
         |bedges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairsb
         |          UNION SELECT id_b, id_a FROM pairsb),
         |bverts AS (SELECT DISTINCT u AS id FROM bedges),
         |breach(id, r) AS (
         |  SELECT id, id FROM bverts
         |  UNION
         |  SELECT e.u, breach.r FROM bedges e JOIN breach ON e.v = breach.id),
         |bcomp AS MATERIALIZED (SELECT id, min(r) AS component
         |  FROM breach GROUP BY 1),
         |troots AS MATERIALIZED (SELECT DISTINCT bc.component
         |  FROM bcomp bc JOIN retr ON bc.id = retr.r),
         |spairs AS MATERIALIZED (SELECT id_a, id_b FROM pairsb
         |  WHERE id_a NOT IN (SELECT r FROM retr)
         |    AND id_b NOT IN (SELECT r FROM retr)),
         |sedges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM spairs
         |          UNION SELECT id_b, id_a FROM spairs),
         |sverts AS (SELECT DISTINCT u AS id FROM sedges),
         |sreach(id, r) AS (
         |  SELECT id, id FROM sverts
         |  UNION
         |  SELECT e.u, sreach.r FROM sedges e JOIN sreach ON e.v = sreach.id),
         |scomp AS MATERIALIZED (SELECT id, min(r) AS component
         |  FROM sreach GROUP BY 1),
         |surv AS (SELECT bc.id, bc.component AS basecomp FROM bcomp bc
         |         WHERE bc.id NOT IN (SELECT r FROM retr)),
         |final AS (SELECT s.id AS doc_id,
         |    coalesce(sc.component, s.id) AS component,
         |    CASE WHEN tr.component IS NOT NULL THEN 1 ELSE 0 END AS touched
         |  FROM surv s
         |  LEFT JOIN scomp sc ON sc.id = s.id
         |  LEFT JOIN troots tr ON tr.component = s.basecomp)
         |SELECT doc_id, component,
         |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
         |    AS cluster_size,
         |  CAST(touched AS BIGINT) AS touched
         |FROM final""".stripMargin
    },

    // q188's two closures + BOTH survivorship argmaxes (base and final)
    // re-derived from scratch: the final survivor per cluster equals the
    // frontier repair because an untouched cluster's membership — hence
    // its argmax — is unchanged, which is exactly the claim under test
    "q189_takedown_cascade" -> {
      def frame(sfx: String, pred: String): String =
        s"""w$sfx AS (SELECT doc_id, $wordsSql AS ws FROM documents
           |          WHERE $pred),
           |idx$sfx AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
           |            FROM w$sfx WHERE len(ws) >= 3),
           |sh$sfx AS MATERIALIZED (SELECT DISTINCT doc_id,
           |             array_to_string(ws[i+1:i+3], ' ') AS shingle
           |           FROM idx$sfx),
           |sizes$sfx AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh$sfx
           |              GROUP BY 1),
           |df$sfx AS MATERIALIZED (SELECT shingle, count(*) AS df FROM sh$sfx GROUP BY 1),
           |gen$sfx AS MATERIALIZED (SELECT s.doc_id, s.shingle FROM sh$sfx s
           |            JOIN df$sfx USING (shingle) WHERE df <= 5)""".stripMargin
      def withinPairs(sfx: String): String =
        s"""cand$sfx AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |             FROM gen$sfx a JOIN gen$sfx b USING (shingle)
           |             WHERE a.doc_id < b.doc_id),
           |inter$sfx AS (SELECT id_a, id_b, count(*) AS inter FROM cand$sfx
           |              JOIN sh$sfx sa ON sa.doc_id = id_a
           |              JOIN sh$sfx sb ON sb.doc_id = id_b
           |                AND sb.shingle = sa.shingle
           |              GROUP BY 1, 2),
           |pairs$sfx AS MATERIALIZED (SELECT id_a, id_b FROM inter$sfx
           |              JOIN sizes$sfx na ON id_a = na.doc_id
           |              JOIN sizes$sfx nb ON id_b = nb.doc_id
           |              WHERE CAST(inter AS DOUBLE)
           |                /(na.n_sh + nb.n_sh - inter) >= 0.1)""".stripMargin
      s"""WITH RECURSIVE ${frame("b", "doc_id % 10 <> 7")},
         |${withinPairs("b")},
         |retr AS MATERIALIZED (SELECT doc_id AS r FROM documents
         |        WHERE doc_id % 10 <> 7 AND doc_id % 10 = 3),
         |bedges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairsb
         |          UNION SELECT id_b, id_a FROM pairsb),
         |bverts AS (SELECT DISTINCT u AS id FROM bedges),
         |breach(id, r) AS (
         |  SELECT id, id FROM bverts
         |  UNION
         |  SELECT e.u, breach.r FROM bedges e JOIN breach ON e.v = breach.id),
         |bcomp AS MATERIALIZED (SELECT id, min(r) AS component
         |  FROM breach GROUP BY 1),
         |troots AS MATERIALIZED (SELECT DISTINCT bc.component
         |  FROM bcomp bc JOIN retr ON bc.id = retr.r),
         |spairs AS MATERIALIZED (SELECT id_a, id_b FROM pairsb
         |  WHERE id_a NOT IN (SELECT r FROM retr)
         |    AND id_b NOT IN (SELECT r FROM retr)),
         |sedges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM spairs
         |          UNION SELECT id_b, id_a FROM spairs),
         |sverts AS (SELECT DISTINCT u AS id FROM sedges),
         |sreach(id, r) AS (
         |  SELECT id, id FROM sverts
         |  UNION
         |  SELECT e.u, sreach.r FROM sedges e JOIN sreach ON e.v = sreach.id),
         |scomp AS MATERIALIZED (SELECT id, min(r) AS component
         |  FROM sreach GROUP BY 1),
         |bscored AS MATERIALIZED (SELECT d.doc_id,
         |    greatest(CAST(len(${TextSql.words}) AS BIGINT), 0) AS score,
         |    coalesce(bc.component, d.doc_id) AS canonical
         |  FROM documents d LEFT JOIN bcomp bc ON bc.id = d.doc_id
         |  WHERE d.doc_id % 10 <> 7),
         |branked AS (SELECT *, row_number() OVER (PARTITION BY canonical
         |    ORDER BY score DESC, doc_id) AS rn FROM bscored),
         |bbest AS MATERIALIZED (SELECT canonical, doc_id AS old_survivor
         |        FROM branked WHERE rn = 1),
         |fin AS MATERIALIZED (SELECT b.doc_id, b.score,
         |    coalesce(sc.component, b.doc_id) AS canonical_id,
         |    CASE WHEN tr.component IS NOT NULL THEN 1 ELSE 0 END AS touched,
         |    bb.old_survivor
         |  FROM bscored b
         |  LEFT JOIN scomp sc ON sc.id = b.doc_id
         |  LEFT JOIN troots tr ON tr.component = b.canonical
         |  LEFT JOIN bbest bb ON bb.canonical = b.canonical
         |  WHERE b.doc_id NOT IN (SELECT r FROM retr)),
         |ranked AS (SELECT *,
         |    row_number() OVER (PARTITION BY canonical_id
         |      ORDER BY score DESC, doc_id) AS rn,
         |    CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
         |      AS cluster_size
         |  FROM fin),
         |best AS (SELECT canonical_id, doc_id AS survivor_id
         |         FROM ranked WHERE rn = 1)
         |SELECT r.doc_id, r.canonical_id, r.cluster_size, r.score,
         |  b.survivor_id,
         |  CAST(CASE WHEN r.doc_id = b.survivor_id THEN 1 ELSE 0 END
         |    AS BIGINT) AS kept,
         |  CAST(CASE WHEN b.survivor_id <> r.old_survivor THEN 1 ELSE 0 END
         |    AS BIGINT) AS repaired,
         |  CAST(r.touched AS BIGINT) AS touched
         |FROM ranked r JOIN best b USING (canonical_id)""".stripMargin
    },

    // portable SimHash oracle: FNV-1a token hashes -> 64 sign-sums -> unsigned
    // fingerprint -> 4x16-bit chunk pigeonhole join -> hamming <= 3
    "q27_simhash_near_dups" -> {
      import graft.plans.Fnv1a64Expression.stringSqlText
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
         |wh AS (SELECT doc_id, ${stringSqlText("t")} AS h FROM tok),
         |bits AS (SELECT doc_id, b,
         |           sum(CASE WHEN (h >> b) & 1::HUGEINT = 1::HUGEINT
         |               THEN 1 ELSE -1 END) AS s
         |         FROM wh CROSS JOIN (SELECT unnest(range(64)) AS b)
         |         GROUP BY 1, 2),
         |fp AS (SELECT doc_id,
         |         sum(CASE WHEN s > 0 THEN (1::HUGEINT << b)
         |             ELSE 0::HUGEINT END) AS fpu
         |       FROM bits GROUP BY 1),
         |chunks AS (SELECT doc_id, fpu, c, (fpu >> (16*c)) & 65535::HUGEINT AS v
         |           FROM fp CROSS JOIN (SELECT unnest(range(4)) AS c)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |           a.fpu AS fa, b.fpu AS fb
         |         FROM chunks a JOIN chunks b
         |           ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(fa, fb)) <= 3""".stripMargin
    },

    // signatures re-derived from the portable FNV hash (the q27 chain),
    // candidates as ALL pairs at hamming <= 3 (bucketing must be
    // invisible), exact full-vocabulary tf-cosine with the integer
    // certificate
    "q141_cosine_simhash_near_dups" -> {
      import graft.plans.Fnv1a64Expression.stringSqlText
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
         |wh AS (SELECT doc_id, ${stringSqlText("t")} AS h FROM tok),
         |bits AS (SELECT doc_id, b,
         |           sum(CASE WHEN (h >> b) & 1::HUGEINT = 1::HUGEINT
         |               THEN 1 ELSE -1 END) AS s
         |         FROM wh CROSS JOIN (SELECT unnest(range(64)) AS b)
         |         GROUP BY 1, 2),
         |fp AS (SELECT doc_id,
         |         sum(CASE WHEN s > 0 THEN (1::HUGEINT << b)
         |             ELSE 0::HUGEINT END) AS fpu
         |       FROM bits GROUP BY 1),
         |tfv AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
         |n2 AS (SELECT doc_id, sum(tf * tf) AS n2 FROM tfv GROUP BY 1),
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |           CAST(bit_count(xor(a.fpu, b.fpu)) AS BIGINT) AS hamming
         |         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |         WHERE bit_count(xor(a.fpu, b.fpu)) <= 3),
         |dots AS (SELECT c.id_a, c.id_b, c.hamming, sum(a.tf * b.tf) AS dot
         |  FROM cand c
         |  JOIN tfv a ON a.doc_id = c.id_a
         |  JOIN tfv b ON b.doc_id = c.id_b AND b.t = a.t
         |  GROUP BY 1, 2, 3)
         |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
         |  hamming, CAST(dot AS BIGINT) AS dot,
         |  CAST(na.n2 AS BIGINT) AS n2_a, CAST(nb.n2 AS BIGINT) AS n2_b,
         |  CAST((dot * dot * 1000000) // (na.n2 * nb.n2) AS BIGINT)
         |    AS cos2_micro
         |FROM dots
         |JOIN n2 na ON dots.id_a = na.doc_id
         |JOIN n2 nb ON dots.id_b = nb.doc_id
         |WHERE 10 * dot * dot >= 9 * na.n2 * nb.n2""".stripMargin
    },

    "q25_knn_exact" -> {
      val cos = Similarity.cosineSqlText("qe", "embedding")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |           FROM embeddings WHERE vec_id % 50 = 0)
         |SELECT query_id, CAST(row_number() OVER w AS BIGINT) AS rnk,
         |  vec_id AS neighbor_id, floor(($cos)*1000000.0 + 0.5)/1000000.0 AS cosine
         |FROM embeddings CROSS JOIN q
         |WHERE vec_id != query_id
         |WINDOW w AS (PARTITION BY query_id ORDER BY $cos DESC, vec_id)
         |QUALIFY row_number() OVER w <= 10""".stripMargin
    },

    // q25's oracle with the quantized-boundary exclusion; ranking by the
    // raw cosine like q25 (bit-identical doubles from the integer dot)
    "q165_hard_negatives" -> {
      val cos = Similarity.cosineSqlText("qe", "embedding")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |           FROM embeddings WHERE vec_id % 50 = 0)
         |SELECT query_id, CAST(row_number() OVER w AS BIGINT) AS rnk,
         |  vec_id AS neighbor_id,
         |  floor(($cos)*1000000.0 + 0.5)/1000000.0 AS cosine
         |FROM embeddings CROSS JOIN q
         |WHERE vec_id != query_id
         |  AND floor(($cos)*1000000.0 + 0.5) < 400000
         |WINDOW w AS (PARTITION BY query_id ORDER BY $cos DESC, vec_id)
         |QUALIFY row_number() OVER w <= 3""".stripMargin
    },

    "q26_knn_ivf" -> {
      val cosCent = Similarity.cosineSqlText("embedding", "ce")
      val cosQCent = Similarity.cosineSqlText("qe", "ce")
      val cosQN = Similarity.cosineSqlText("qe", "ne")
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce
         |              FROM embeddings WHERE vec_id % 50 = 7),
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, embedding AS ne, cell
         |  FROM embeddings CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY $cosCent DESC, cell) = 1),
         |probes AS (
         |  SELECT query_id, qe, cell
         |  FROM q CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosQCent DESC, cell) <= 3)
         |SELECT query_id, CAST(row_number() OVER w AS BIGINT) AS rnk,
         |  neighbor_id, floor(($cosQN)*1000000.0 + 0.5)/1000000.0 AS cosine
         |FROM probes JOIN assigned USING (cell)
         |WHERE neighbor_id != query_id
         |WINDOW w AS (PARTITION BY query_id ORDER BY $cosQN DESC, neighbor_id)
         |QUALIFY row_number() OVER w <= 5""".stripMargin
    },

    "q146_ann_recall" -> {
      // the q25 exact ranking (k=10) and the q26 IVF ranking (k=10 here,
      // same centroids/probes) composed: recall@10 = |exact ∩ approx| per
      // query, LEFT JOIN so misses count as 0
      val cosEx = Similarity.cosineSqlText("qe", "embedding")
      val cosCent = Similarity.cosineSqlText("embedding", "ce")
      val cosQCent = Similarity.cosineSqlText("qe", "ce")
      val cosQN = Similarity.cosineSqlText("qe", "ne")
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce
         |              FROM embeddings WHERE vec_id % 50 = 7),
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM embeddings CROSS JOIN q
         |  WHERE vec_id != query_id
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosEx DESC, vec_id) <= 10),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, embedding AS ne, cell
         |  FROM embeddings CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY $cosCent DESC, cell) = 1),
         |probes AS (
         |  SELECT query_id, qe, cell
         |  FROM q CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosQCent DESC, cell) <= 3),
         |approx AS (
         |  SELECT query_id, neighbor_id
         |  FROM probes JOIN assigned USING (cell)
         |  WHERE neighbor_id != query_id
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosQN DESC, neighbor_id) <= 10)
         |SELECT e.query_id,
         |  CAST(count(*) AS BIGINT) AS evaluated,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000) // 10 AS BIGINT) AS recall_permille
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY 1""".stripMargin
    },

    // the q146 oracle's probe CTE replayed INDEPENDENTLY per nprobe arm
    // (row_number ≤ np — no prefix-slice device here, so the engine's
    // shared-index sweep must be invisible), each arm aggregated to the
    // ladder row
    "q171_ivf_nprobe_sweep" -> {
      val cosEx = Similarity.cosineSqlText("qe", "embedding")
      val cosCent = Similarity.cosineSqlText("embedding", "ce")
      val cosQCent = Similarity.cosineSqlText("qe", "ce")
      val cosQN = Similarity.cosineSqlText("qe", "ne")
      val armCtes = Seq(1, 2, 4, 8).map { np =>
        s"""probes$np AS (
           |  SELECT query_id, qe, cell
           |  FROM q CROSS JOIN cent
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY $cosQCent DESC, cell) <= $np),
           |approx$np AS (
           |  SELECT query_id, neighbor_id
           |  FROM probes$np JOIN assigned USING (cell)
           |  WHERE neighbor_id != query_id
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY $cosQN DESC, neighbor_id) <= 10),
           |per$np AS (
           |  SELECT e.query_id,
           |    sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS h
           |  FROM exact e LEFT JOIN approx$np a
           |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
           |  GROUP BY 1),
           |cost$np AS (
           |  SELECT sum(c) AS ct FROM (
           |    SELECT query_id, count(*) AS c
           |    FROM probes$np JOIN assigned USING (cell)
           |    WHERE neighbor_id != query_id GROUP BY 1)),
           |arm$np AS (
           |  SELECT CAST($np AS BIGINT) AS nprobe,
           |    CAST(count(*) AS BIGINT) AS queries,
           |    CAST(sum(h) AS BIGINT) AS hits,
           |    CAST(sum((h * 1000) // 10) // count(*) AS BIGINT)
           |      AS mean_recall_permille,
           |    CAST(min((h * 1000) // 10) AS BIGINT) AS min_recall_permille,
           |    CAST(max((h * 1000) // 10) AS BIGINT) AS max_recall_permille,
           |    CAST(ct // count(*) AS BIGINT) AS mean_candidates
           |  FROM per$np CROSS JOIN cost$np GROUP BY ct)""".stripMargin
      }.mkString(",\n")
      val armSelects = Seq(1, 2, 4, 8)
        .map(np => s"SELECT * FROM arm$np").mkString("\nUNION ALL\n")
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce
         |              FROM embeddings WHERE vec_id % 50 = 7),
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM embeddings CROSS JOIN q
         |  WHERE vec_id != query_id
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosEx DESC, vec_id) <= 10),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, embedding AS ne, cell
         |  FROM embeddings CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY $cosCent DESC, cell) = 1),
         |$armCtes
         |$armSelects""".stripMargin
    },

    // q146's recall shape with q165's quantized positive cut in BOTH the
    // exact and the probed CTEs — the exclusion must be identical on the
    // two sides or recall would grade the cut, not the probe
    "q168_hard_negatives_ivf" -> {
      val cosEx = Similarity.cosineSqlText("qe", "embedding")
      val cosCent = Similarity.cosineSqlText("embedding", "ce")
      val cosQCent = Similarity.cosineSqlText("qe", "ce")
      val cosQN = Similarity.cosineSqlText("qe", "ne")
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce
         |              FROM embeddings WHERE vec_id % 50 = 7),
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM embeddings CROSS JOIN q
         |  WHERE vec_id != query_id
         |    AND floor(($cosEx)*1000000.0 + 0.5) < 400000
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosEx DESC, vec_id) <= 10),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, embedding AS ne, cell
         |  FROM embeddings CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY $cosCent DESC, cell) = 1),
         |probes AS (
         |  SELECT query_id, qe, cell
         |  FROM q CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosQCent DESC, cell) <= 3),
         |approx AS (
         |  SELECT query_id, neighbor_id
         |  FROM probes JOIN assigned USING (cell)
         |  WHERE neighbor_id != query_id
         |    AND floor(($cosQN)*1000000.0 + 0.5) < 400000
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosQN DESC, neighbor_id) <= 10)
         |SELECT e.query_id,
         |  CAST(count(*) AS BIGINT) AS evaluated,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000) // 10 AS BIGINT) AS recall_permille
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY 1""".stripMargin
    },

    "q161_matryoshka_recall" -> {
      // per prefix width p: the q25 exact ranking over sliced lists
      // (embedding[1:p] — DuckDB list slicing), recall-joined against the
      // full-dim exact top-10, UNION ALL over the three widths
      val cosEx = Similarity.cosineSqlText("qe", "embedding")
      def arm(p: Int): String = {
        val cosP = Similarity.cosineSqlText("qp", "ep")
        s"""SELECT e.query_id,
           |  CAST(count(*) AS BIGINT) AS evaluated,
           |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS hits,
           |  CAST((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           |    * 1000) // 10 AS BIGINT) AS recall_permille,
           |  CAST($p AS BIGINT) AS p_dims
           |FROM exact e LEFT JOIN (
           |  SELECT query_id, vec_id AS neighbor_id
           |  FROM (SELECT vec_id, embedding[1:$p] AS ep FROM embeddings)
           |  CROSS JOIN (SELECT query_id, qe[1:$p] AS qp FROM q)
           |  WHERE vec_id != query_id
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY $cosP DESC, vec_id) <= 10) a
           |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
           |GROUP BY 1""".stripMargin
      }
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM embeddings CROSS JOIN q
         |  WHERE vec_id != query_id
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosEx DESC, vec_id) <= 10)
         |${Seq(8, 16, 32).map(arm).mkString("\nUNION ALL\n")}""".stripMargin
    },

    // base PQ fit (the shared PqSql chain on the % 10 != 9 slice), state
    // sums, batch fold, and the full-corpus encode census under the
    // folded codebooks, all re-derived — the stored state never seen
    "q177_pq_incremental" -> {
      val (m, kc, iters, sub) = (4, 8, 2, 16)
      def dot(a: String, b: String) = Similarity.dotLongSqlText(a, b)
      s"""WITH qv AS (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5)
         |     AS BIGINT) FOR i IN range(1, len(embedding)+1)] AS v
         |  FROM embeddings),
         |bsrc AS (SELECT vec_id, v FROM qv WHERE vec_id % 10 != 9),
         |jj AS (SELECT unnest(range($m)) AS j),
         |${PqSql.chain("", "bsrc", m, kc, iters, sub)},
         |sn AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS n_base
         |  FROM codes GROUP BY 1, 2),
         |ss AS (SELECT co.j, co.cell, ii.i, sum(s.sv[ii.i]) AS s
         |  FROM codes co JOIN sv s ON s.vec_id = co.vec_id AND s.j = co.j
         |  CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS i) ii
         |  GROUP BY 1, 2, 3),
         |bsv AS (SELECT vec_id, j,
         |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS sv
         |  FROM qv CROSS JOIN jj WHERE vec_id % 10 = 9),
         |bcodes AS (SELECT vec_id, j, cell FROM (
         |    SELECT s.vec_id, s.j, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "c.v")} - ${dot("c.v", "c.v")}
         |          DESC, c.cell) AS rn
         |    FROM bsv s JOIN cb$iters c ON s.j = c.j) WHERE rn = 1),
         |bn AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS n_batch
         |  FROM bcodes GROUP BY 1, 2),
         |bs AS (SELECT co.j, co.cell, ii.i, sum(s.sv[ii.i]) AS s
         |  FROM bcodes co JOIN bsv s ON s.vec_id = co.vec_id AND s.j = co.j
         |  CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS i) ii
         |  GROUP BY 1, 2, 3),
         |nn AS (SELECT c.j, c.cell, coalesce(sn.n_base, 0) AS n_base,
         |    coalesce(bn.n_batch, 0) AS n_batch,
         |    coalesce(sn.n_base, 0) + coalesce(bn.n_batch, 0) AS n_total
         |  FROM cb$iters c LEFT JOIN sn USING (j, cell)
         |  LEFT JOIN bn USING (j, cell)),
         |fi AS (SELECT c.j, c.cell, ii.i,
         |    CASE WHEN nn.n_total = 0 THEN c.v[ii.i]
         |      ELSE CAST(CASE WHEN coalesce(ss.s, 0) + coalesce(bs.s, 0) < 0
         |          THEN -1 ELSE 1 END
         |        * (abs(coalesce(ss.s, 0) + coalesce(bs.s, 0)) // nn.n_total)
         |        AS BIGINT)
         |    END AS cx
         |  FROM cb$iters c
         |  CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS i) ii
         |  JOIN nn ON nn.j = c.j AND nn.cell = c.cell
         |  LEFT JOIN ss ON ss.j = c.j AND ss.cell = c.cell AND ss.i = ii.i
         |  LEFT JOIN bs ON bs.j = c.j AND bs.cell = c.cell AND bs.i = ii.i),
         |folded AS (SELECT j, cell, list(cx ORDER BY i) AS v
         |  FROM fi GROUP BY 1, 2),
         |fsv AS (SELECT vec_id, j,
         |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS sv
         |  FROM qv CROSS JOIN jj),
         |fcodes AS (SELECT vec_id, j, cell FROM (
         |    SELECT s.vec_id, s.j, f.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "f.v")} - ${dot("f.v", "f.v")}
         |          DESC, f.cell) AS rn
         |    FROM fsv s JOIN folded f ON s.j = f.j) WHERE rn = 1),
         |ac AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS encoded_full
         |  FROM fcodes GROUP BY 1, 2)
         |SELECT CAST(nn.j AS BIGINT) AS subspace,
         |  CAST(nn.cell AS BIGINT) AS cell, nn.n_base, nn.n_batch,
         |  nn.n_total,
         |  CAST(list_sum([folded.v[i]*i FOR i IN range(1, ${sub + 1})])
         |    AS BIGINT) AS cw_weighted,
         |  coalesce(ac.encoded_full, 0) AS encoded_full
         |FROM nn JOIN folded ON folded.j = nn.j AND folded.cell = nn.cell
         |LEFT JOIN ac ON ac.j = nn.j AND ac.cell = nn.cell"""
        .stripMargin
    },

    // coarse fit on the base slice (kmeans chain), base residuals, the
    // shared PqSql chain over them, batch residual fold under the FROZEN
    // coarse layer, and the full-corpus residual-encode census under the
    // folded codebooks — all re-derived; the stored state never seen.
    // Per-(j, cell) sums use list-comprehension aggregation over list(sv)
    // (the q176 idiom — no unnest(range) row explosions), and every
    // multi-referenced CTE is MATERIALIZED (KmeansSql scaladoc: DuckDB's
    // default inlining re-evaluates the whole upstream chain per
    // reference).
    "q178_ivfpq_incremental" -> {
      val (m, kc, iters, sub) = (4, 8, 2, 16)
      def dot(a: String, b: String) = Similarity.dotLongSqlText(a, b)
      val cosB = Similarity.cosineLongSqlText("b.v", "c.v")
      val cosF = Similarity.cosineLongSqlText("q.v", "c.v")
      val zeros = s"[CAST(0 AS HUGEINT) FOR i IN range(1, ${sub + 1})]"
      s"""WITH ${KmeansSql.kmeansCtes("8", 2, 64,
           "(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 != 9)")},
         |${KmeansSql.finAssignCte(2)},
         |rv AS MATERIALIZED (SELECT q.vec_id,
         |    [q.v[i] - c.v[i] FOR i IN range(1, len(q.v)+1)] AS v
         |  FROM qv q JOIN fin f ON q.vec_id = f.vec_id
         |  JOIN c2 c ON f.cell = c.cell),
         |jj AS (SELECT unnest(range($m)) AS j),
         |${PqSql.chain("", "rv", m, kc, iters, sub)},
         |sn AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS n_base
         |  FROM codes GROUP BY 1, 2),
         |ss AS MATERIALIZED (SELECT j, cell,
         |    [CAST(list_sum([v[i] FOR v IN vs]) AS HUGEINT)
         |     FOR i IN range(1, ${sub + 1})] AS s
         |  FROM (SELECT co.j, co.cell, list(s.sv) AS vs
         |        FROM codes co JOIN sv s
         |          ON s.vec_id = co.vec_id AND s.j = co.j
         |        GROUP BY co.j, co.cell) t),
         |bqv AS MATERIALIZED (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5)
         |     AS BIGINT) FOR i IN range(1, len(embedding)+1)] AS v
         |  FROM embeddings WHERE vec_id % 10 = 9),
         |bfin AS MATERIALIZED (SELECT vec_id, cell FROM (
         |    SELECT b.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY $cosB DESC, c.cell) AS rn
         |    FROM bqv b CROSS JOIN c2 c) WHERE rn = 1),
         |brv AS MATERIALIZED (SELECT b.vec_id,
         |    [b.v[i] - c.v[i] FOR i IN range(1, len(b.v)+1)] AS v
         |  FROM bqv b JOIN bfin f ON b.vec_id = f.vec_id
         |  JOIN c2 c ON f.cell = c.cell),
         |bsv AS MATERIALIZED (SELECT vec_id, j,
         |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS sv
         |  FROM brv CROSS JOIN jj),
         |bcodes AS MATERIALIZED (SELECT vec_id, j, cell FROM (
         |    SELECT s.vec_id, s.j, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "c.v")} - ${dot("c.v", "c.v")}
         |          DESC, c.cell) AS rn
         |    FROM bsv s JOIN cb$iters c ON s.j = c.j) WHERE rn = 1),
         |bn AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS n_batch
         |  FROM bcodes GROUP BY 1, 2),
         |bs AS MATERIALIZED (SELECT j, cell,
         |    [CAST(list_sum([v[i] FOR v IN vs]) AS HUGEINT)
         |     FOR i IN range(1, ${sub + 1})] AS s
         |  FROM (SELECT co.j, co.cell, list(s.sv) AS vs
         |        FROM bcodes co JOIN bsv s
         |          ON s.vec_id = co.vec_id AND s.j = co.j
         |        GROUP BY co.j, co.cell) t),
         |nn AS MATERIALIZED (SELECT c.j, c.cell,
         |    coalesce(sn.n_base, 0) AS n_base,
         |    coalesce(bn.n_batch, 0) AS n_batch,
         |    coalesce(sn.n_base, 0) + coalesce(bn.n_batch, 0) AS n_total
         |  FROM cb$iters c LEFT JOIN sn USING (j, cell)
         |  LEFT JOIN bn USING (j, cell)),
         |fi AS MATERIALIZED (SELECT c.j, c.cell, nn.n_total, c.v AS cv,
         |    coalesce(ss.s, $zeros) AS sa,
         |    coalesce(bs.s, $zeros) AS sb
         |  FROM cb$iters c JOIN nn ON nn.j = c.j AND nn.cell = c.cell
         |  LEFT JOIN ss ON ss.j = c.j AND ss.cell = c.cell
         |  LEFT JOIN bs ON bs.j = c.j AND bs.cell = c.cell),
         |folded AS MATERIALIZED (SELECT j, cell,
         |    CASE WHEN n_total = 0 THEN cv
         |      ELSE [CAST(CASE WHEN sa[i] + sb[i] < 0 THEN -1 ELSE 1 END
         |              * (abs(sa[i] + sb[i]) // n_total) AS BIGINT)
         |            FOR i IN range(1, ${sub + 1})]
         |    END AS v
         |  FROM fi),
         |fqv AS MATERIALIZED (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5)
         |     AS BIGINT) FOR i IN range(1, len(embedding)+1)] AS v
         |  FROM embeddings),
         |cfin AS MATERIALIZED (SELECT vec_id, cell FROM (
         |    SELECT q.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY $cosF DESC, c.cell) AS rn
         |    FROM fqv q CROSS JOIN c2 c) WHERE rn = 1),
         |frv AS MATERIALIZED (SELECT q.vec_id,
         |    [q.v[i] - c.v[i] FOR i IN range(1, len(q.v)+1)] AS v
         |  FROM fqv q JOIN cfin f ON q.vec_id = f.vec_id
         |  JOIN c2 c ON f.cell = c.cell),
         |fsv AS MATERIALIZED (SELECT vec_id, j,
         |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS sv
         |  FROM frv CROSS JOIN jj),
         |fcodes AS MATERIALIZED (SELECT vec_id, j, cell FROM (
         |    SELECT s.vec_id, s.j, f.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "f.v")} - ${dot("f.v", "f.v")}
         |          DESC, f.cell) AS rn
         |    FROM fsv s JOIN folded f ON s.j = f.j) WHERE rn = 1),
         |ac AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS encoded_full
         |  FROM fcodes GROUP BY 1, 2)
         |SELECT CAST(nn.j AS BIGINT) AS subspace,
         |  CAST(nn.cell AS BIGINT) AS cell, nn.n_base, nn.n_batch,
         |  nn.n_total,
         |  CAST(list_sum([folded.v[i]*i FOR i IN range(1, ${sub + 1})])
         |    AS BIGINT) AS cw_weighted,
         |  coalesce(ac.encoded_full, 0) AS encoded_full
         |FROM nn JOIN folded ON folded.j = nn.j AND folded.cell = nn.cell
         |LEFT JOIN ac ON ac.j = nn.j AND ac.cell = nn.cell"""
        .stripMargin
    },

    // per-dim base/batch second moments from scratch, added, ranked, and
    // dealt — the whole fold-equals-refit claim under the hash
    "q179_opq_incremental" -> {
      val (m, sub, dims) = (4, 16, 64)
      s"""WITH qv AS MATERIALIZED (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5)
         |     AS BIGINT) FOR i IN range(1, len(embedding)+1)] AS v
         |  FROM embeddings),
         |en AS MATERIALIZED (SELECT i,
         |    CAST(sum(CASE WHEN vec_id % 10 != 9 THEN v[i]*v[i]
         |      ELSE 0 END) AS BIGINT) AS e_base,
         |    CAST(sum(CASE WHEN vec_id % 10 = 9 THEN v[i]*v[i]
         |      ELSE 0 END) AS BIGINT) AS e_batch
         |  FROM qv CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i) ii
         |  GROUP BY i),
         |rk AS (SELECT i, e_base, e_batch, e_base + e_batch AS e_total,
         |    row_number() OVER (ORDER BY e_base + e_batch DESC, i) AS r
         |  FROM en)
         |SELECT CAST(((r-1) % $m) * $sub + ((r-1) // $m) + 1 AS BIGINT)
         |    AS pos,
         |  CAST((r-1) % $m AS BIGINT) AS subspace,
         |  CAST(i AS BIGINT) AS dim, e_base, e_batch, e_total
         |FROM rk""".stripMargin
    },

    // the full-corpus PQ chain, survivors' per-(j, cell) counts and sums
    // read off the same codes (the takedown encoded under the same
    // codebooks, so the subtraction IS the survivor slice), the per-
    // subspace re-derive, and the survivor re-encode census — all from
    // scratch, the stored state never seen
    "q184_pq_retract" -> {
      val (m, kc, iters, sub) = (4, 8, 2, 16)
      def dot(a: String, b: String) = Similarity.dotLongSqlText(a, b)
      val zeros = s"[CAST(0 AS HUGEINT) FOR i IN range(1, ${sub + 1})]"
      s"""WITH qv AS MATERIALIZED (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5)
         |     AS BIGINT) FOR i IN range(1, len(embedding)+1)] AS v
         |  FROM embeddings),
         |jj AS (SELECT unnest(range($m)) AS j),
         |${PqSql.chain("", "qv", m, kc, iters, sub)},
         |an AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS n_full
         |  FROM codes GROUP BY 1, 2),
         |wn AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS n_after
         |  FROM codes WHERE vec_id % 10 != 9 GROUP BY 1, 2),
         |ws AS MATERIALIZED (SELECT j, cell,
         |    [CAST(list_sum([v[i] FOR v IN vs]) AS HUGEINT)
         |     FOR i IN range(1, ${sub + 1})] AS s
         |  FROM (SELECT co.j, co.cell, list(s.sv) AS vs
         |        FROM codes co JOIN sv s
         |          ON s.vec_id = co.vec_id AND s.j = co.j
         |        WHERE co.vec_id % 10 != 9
         |        GROUP BY co.j, co.cell) t),
         |nn AS MATERIALIZED (SELECT c.j, c.cell,
         |    coalesce(an.n_full, 0) AS n_full,
         |    coalesce(wn.n_after, 0) AS n_after
         |  FROM cb$iters c LEFT JOIN an USING (j, cell)
         |  LEFT JOIN wn USING (j, cell)),
         |fi AS MATERIALIZED (SELECT c.j, c.cell, nn.n_after, c.v AS cv,
         |    coalesce(ws.s, $zeros) AS ss
         |  FROM cb$iters c JOIN nn ON nn.j = c.j AND nn.cell = c.cell
         |  LEFT JOIN ws ON ws.j = c.j AND ws.cell = c.cell),
         |unf AS MATERIALIZED (SELECT j, cell,
         |    CASE WHEN n_after = 0 THEN cv
         |      ELSE [CAST(CASE WHEN ss[i] < 0 THEN -1 ELSE 1 END
         |              * (abs(ss[i]) // n_after) AS BIGINT)
         |            FOR i IN range(1, ${sub + 1})]
         |    END AS v
         |  FROM fi),
         |scodes AS MATERIALIZED (SELECT vec_id, j, cell FROM (
         |    SELECT s.vec_id, s.j, u.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "u.v")} - ${dot("u.v", "u.v")}
         |          DESC, u.cell) AS rn
         |    FROM (SELECT * FROM sv WHERE vec_id % 10 != 9) s
         |    JOIN unf u ON s.j = u.j) WHERE rn = 1),
         |ac AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS encoded_survivors
         |  FROM scodes GROUP BY 1, 2)
         |SELECT CAST(nn.j AS BIGINT) AS subspace,
         |  CAST(nn.cell AS BIGINT) AS cell, nn.n_full,
         |  nn.n_full - nn.n_after AS n_takedown, nn.n_after,
         |  CAST(list_sum([unf.v[i]*i FOR i IN range(1, ${sub + 1})])
         |    AS BIGINT) AS cw_weighted,
         |  coalesce(ac.encoded_survivors, 0) AS encoded_survivors
         |FROM nn JOIN unf ON unf.j = nn.j AND unf.cell = nn.cell
         |LEFT JOIN ac ON ac.j = nn.j AND ac.cell = nn.cell""".stripMargin
    },

    // q184's retraction over RESIDUALS: coarse fit on the full corpus,
    // residuals, the shared PqSql chain over them, survivor filters off
    // the same codes, and the survivor residual re-encode under the
    // frozen coarse layer + retracted codebooks
    "q185_ivfpq_retract" -> {
      val (m, kc, iters, sub) = (4, 8, 2, 16)
      def dot(a: String, b: String) = Similarity.dotLongSqlText(a, b)
      val zeros = s"[CAST(0 AS HUGEINT) FOR i IN range(1, ${sub + 1})]"
      s"""WITH ${KmeansSql.kmeansCtes("8", 2, 64, "embeddings")},
         |${KmeansSql.finAssignCte(2)},
         |rv AS MATERIALIZED (SELECT q.vec_id,
         |    [q.v[i] - c.v[i] FOR i IN range(1, len(q.v)+1)] AS v
         |  FROM qv q JOIN fin f ON q.vec_id = f.vec_id
         |  JOIN c2 c ON f.cell = c.cell),
         |jj AS (SELECT unnest(range($m)) AS j),
         |${PqSql.chain("", "rv", m, kc, iters, sub)},
         |an AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS n_full
         |  FROM codes GROUP BY 1, 2),
         |wn AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS n_after
         |  FROM codes WHERE vec_id % 10 != 9 GROUP BY 1, 2),
         |ws AS MATERIALIZED (SELECT j, cell,
         |    [CAST(list_sum([v[i] FOR v IN vs]) AS HUGEINT)
         |     FOR i IN range(1, ${sub + 1})] AS s
         |  FROM (SELECT co.j, co.cell, list(s.sv) AS vs
         |        FROM codes co JOIN sv s
         |          ON s.vec_id = co.vec_id AND s.j = co.j
         |        WHERE co.vec_id % 10 != 9
         |        GROUP BY co.j, co.cell) t),
         |nn AS MATERIALIZED (SELECT c.j, c.cell,
         |    coalesce(an.n_full, 0) AS n_full,
         |    coalesce(wn.n_after, 0) AS n_after
         |  FROM cb$iters c LEFT JOIN an USING (j, cell)
         |  LEFT JOIN wn USING (j, cell)),
         |fi AS MATERIALIZED (SELECT c.j, c.cell, nn.n_after, c.v AS cv,
         |    coalesce(ws.s, $zeros) AS ss
         |  FROM cb$iters c JOIN nn ON nn.j = c.j AND nn.cell = c.cell
         |  LEFT JOIN ws ON ws.j = c.j AND ws.cell = c.cell),
         |unf AS MATERIALIZED (SELECT j, cell,
         |    CASE WHEN n_after = 0 THEN cv
         |      ELSE [CAST(CASE WHEN ss[i] < 0 THEN -1 ELSE 1 END
         |              * (abs(ss[i]) // n_after) AS BIGINT)
         |            FOR i IN range(1, ${sub + 1})]
         |    END AS v
         |  FROM fi),
         |scodes AS MATERIALIZED (SELECT vec_id, j, cell FROM (
         |    SELECT s.vec_id, s.j, u.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "u.v")} - ${dot("u.v", "u.v")}
         |          DESC, u.cell) AS rn
         |    FROM (SELECT * FROM sv WHERE vec_id % 10 != 9) s
         |    JOIN unf u ON s.j = u.j) WHERE rn = 1),
         |ac AS MATERIALIZED (SELECT j, cell,
         |    CAST(count(*) AS BIGINT) AS encoded_survivors
         |  FROM scodes GROUP BY 1, 2)
         |SELECT CAST(nn.j AS BIGINT) AS subspace,
         |  CAST(nn.cell AS BIGINT) AS cell, nn.n_full,
         |  nn.n_full - nn.n_after AS n_takedown, nn.n_after,
         |  CAST(list_sum([unf.v[i]*i FOR i IN range(1, ${sub + 1})])
         |    AS BIGINT) AS cw_weighted,
         |  coalesce(ac.encoded_survivors, 0) AS encoded_survivors
         |FROM nn JOIN unf ON unf.j = nn.j AND unf.cell = nn.cell
         |LEFT JOIN ac ON ac.j = nn.j AND ac.cell = nn.cell""".stripMargin
    },

    // per-dim full/takedown second moments from scratch, subtracted,
    // ranked by what REMAINS, and dealt — the unfold-equals-refit-on-
    // the-difference claim under the hash
    "q186_opq_retract" -> {
      val (m, sub, dims) = (4, 16, 64)
      s"""WITH qv AS MATERIALIZED (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5)
         |     AS BIGINT) FOR i IN range(1, len(embedding)+1)] AS v
         |  FROM embeddings),
         |en AS MATERIALIZED (SELECT i,
         |    CAST(sum(v[i]*v[i]) AS BIGINT) AS e_full,
         |    CAST(sum(CASE WHEN vec_id % 10 = 9 THEN v[i]*v[i]
         |      ELSE 0 END) AS BIGINT) AS e_takedown
         |  FROM qv CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i) ii
         |  GROUP BY i),
         |rk AS (SELECT i, e_full, e_takedown,
         |    e_full - e_takedown AS e_after,
         |    row_number() OVER (ORDER BY e_full - e_takedown DESC, i) AS r
         |  FROM en)
         |SELECT CAST(((r-1) % $m) * $sub + ((r-1) // $m) + 1 AS BIGINT)
         |    AS pos,
         |  CAST((r-1) % $m AS BIGINT) AS subspace,
         |  CAST(i AS BIGINT) AS dim, e_full, e_takedown, e_after
         |FROM rk""".stripMargin
    },

    "q147_pq_recall" -> {
      // full PQ replay — the shared PqSql chain (seeds → Lloyd → codes →
      // lut → ADC → top-10) over the quantized embeddings, recall-joined
      // against the exact cosine ranking.
      val (m, kc, iters, sub) = (4, 8, 2, 16)
      val cosEx = Similarity.cosineSqlText("qe", "embedding")
      s"""WITH qv AS (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)
         |   FOR i IN range(1, len(embedding)+1)] AS v FROM embeddings),
         |jj AS (SELECT unnest(range($m)) AS j),
         |${PqSql.chain("", "qv", m, kc, iters, sub)},
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM embeddings CROSS JOIN q
         |  WHERE vec_id != query_id
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosEx DESC, vec_id) <= 10)
         |SELECT e.query_id,
         |  CAST(count(*) AS BIGINT) AS evaluated,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000) // 10 AS BIGINT) AS recall_permille
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY 1""".stripMargin
    },

    "q156_opq_recall" -> {
      // q147's PqSql chain in a PERMUTED space: per-dim energy Σv[i]²
      // over the quantized vectors → rank (energy DESC, dim ASC) →
      // round-robin deal over the m subspaces (rank r−1 lands at permuted
      // position ((r−1) % m)·sub + (r−1)//m) → pv = permuted vectors →
      // the identical chain on pv. The exact baseline stays in the
      // ORIGINAL space: dots are permutation-invariant, so the cosine
      // ranking is unchanged.
      val (m, kc, iters, sub, dims) = (4, 8, 2, 16, 64)
      val cosEx = Similarity.cosineSqlText("qe", "embedding")
      s"""WITH qv AS (SELECT vec_id,
         |  [CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)
         |   FOR i IN range(1, len(embedding)+1)] AS v FROM embeddings),
         |jj AS (SELECT unnest(range($m)) AS j),
         |en AS (SELECT i, sum(v[i]*v[i]) AS e
         |  FROM qv CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i)
         |  GROUP BY i),
         |rk AS (SELECT i, row_number() OVER (ORDER BY e DESC, i) AS r
         |       FROM en),
         |pm AS (SELECT list(i ORDER BY ((r-1) % $m) * $sub + ((r-1) // $m))
         |         AS perm FROM rk),
         |pv AS MATERIALIZED (SELECT vec_id,
         |    [v[perm[p]] FOR p IN range(1, ${dims + 1})] AS v
         |  FROM qv CROSS JOIN pm),
         |${PqSql.chain("", "pv", m, kc, iters, sub)},
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM embeddings CROSS JOIN q
         |  WHERE vec_id != query_id
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosEx DESC, vec_id) <= 10)
         |SELECT e.query_id,
         |  CAST(count(*) AS BIGINT) AS evaluated,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000) // 10 AS BIGINT) AS recall_permille
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY 1""".stripMargin
    },

    "q157_opq_tf_recall" -> {
      // hashed-tf qv (FNV bucket % 64 over the shared word split, exact
      // long counts — scale=1, no quantize CTE) → TWO PqSql chains:
      // plain (unprefixed) and energy-permuted (oen/ork/opm/opv + the
      // o-prefixed chain) → ONE exact cosine baseline (dots are
      // permutation-invariant) → the two recall rollups UNION ALL'd
      // under a method column.
      val (m, kc, iters, sub, dims) = (4, 8, 2, 16, 64)
      import graft.plans.Fnv1a64Expression.stringSqlText
      val cosEx = Similarity.cosineLongSqlText("q.v", "c.v")
      def recallSel(method: String, approx: String) =
        s"""SELECT e.query_id, '$method' AS method,
           |  CAST(count(*) AS BIGINT) AS evaluated,
           |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0
           |    END) AS BIGINT) AS hits,
           |  CAST((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0
           |    END) * 1000) // 10 AS BIGINT) AS recall_permille
           |FROM exact e LEFT JOIN $approx a
           |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
           |GROUP BY 1""".stripMargin
      s"""WITH tk AS (SELECT doc_id, unnest($wordsSql) AS w FROM documents),
         |tb AS (SELECT doc_id,
         |    CAST((${stringSqlText("w")}) % $dims AS BIGINT) AS b FROM tk),
         |tc AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY 1, 2),
         |grid AS (SELECT doc_id, unnest(range(0, $dims)) AS b
         |         FROM (SELECT DISTINCT doc_id FROM tk)),
         |qv AS MATERIALIZED (SELECT g.doc_id AS vec_id,
         |    list(CAST(coalesce(tc.c, 0) AS BIGINT) ORDER BY g.b) AS v
         |  FROM grid g LEFT JOIN tc ON g.doc_id = tc.doc_id AND g.b = tc.b
         |  GROUP BY 1),
         |jj AS (SELECT unnest(range($m)) AS j),
         |oen AS (SELECT i, sum(v[i]*v[i]) AS e
         |  FROM qv CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i)
         |  GROUP BY i),
         |ork AS (SELECT i, row_number() OVER (ORDER BY e DESC, i) AS r
         |        FROM oen),
         |opm AS (SELECT list(i ORDER BY ((r-1) % $m) * $sub + ((r-1) // $m))
         |          AS perm FROM ork),
         |opv AS MATERIALIZED (SELECT vec_id,
         |    [v[perm[p]] FOR p IN range(1, ${dims + 1})] AS v
         |  FROM qv CROSS JOIN opm),
         |${PqSql.chain("", "qv", m, kc, iters, sub)},
         |${PqSql.chain("o", "opv", m, kc, iters, sub)},
         |q AS (SELECT vec_id, v FROM qv WHERE vec_id % 50 = 0),
         |exact AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM qv c CROSS JOIN q
         |  WHERE c.vec_id != q.vec_id
         |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY $cosEx DESC, c.vec_id) <= 10)
         |${recallSel("pq", "approx")}
         |UNION ALL
         |${recallSel("opq", "oapprox")}""".stripMargin
    },

    "q152_ivfpq_recall" -> {
      // full IVF-PQ replay: the q84 k-means chain (density-adaptive k,
      // FNV seeds, 2 Lloyd rounds) → final assignment → exact long
      // residuals → PQ seeds/Lloyd/codes on residual slices (pa/ps/pn
      // CTE names; the kmeans chain owns a/s/n) → lut over QUERY slices
      // (the query is never residualized) → per-(query,cell) coarse
      // offset → ADC = offset + Σ lookups over probed cells only
      val (m, kc, iters, sub) = (4, 8, 2, 16)
      import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
      val fnv = toSignedSqlText(
        longSqlText("14695981039346656037::HUGEINT", "vec_id::HUGEINT"))
      def dot(a: String, b: String) = Similarity.dotLongSqlText(a, b)
      val cosEx = Similarity.cosineSqlText("qe", "embedding")
      val cosQC = Similarity.cosineLongSqlText("q2.v", "c.v")
      val kSql = "SELECT greatest(8, least(CAST(ceil(count(*) / 50.0) " +
        "AS BIGINT), CAST(ceil(sqrt(count(*))) AS BIGINT))) FROM qv"
      val pqLloyd = (1 to iters).map { it =>
        s"""pa$it AS MATERIALIZED (SELECT vec_id, j, sv, code FROM (
           |    SELECT s.vec_id, s.j, s.sv, c.code,
           |      row_number() OVER (PARTITION BY s.vec_id, s.j
           |        ORDER BY 2*${dot("s.sv", "c.v")} - ${dot("c.v", "c.v")}
           |          DESC, c.code) AS rn
           |    FROM sv s JOIN cb${it - 1} c ON s.j = c.j) WHERE rn = 1),
           |ps$it AS (SELECT j, code, i,
           |      CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END
           |        * (abs(sum(x)) // count(*)) AS BIGINT) AS cx
           |    FROM (SELECT j, code, i, sv[i] AS x
           |          FROM pa$it CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS i))
           |    GROUP BY j, code, i),
           |pn$it AS (SELECT j, code, list(cx ORDER BY i) AS v
           |         FROM ps$it GROUP BY j, code),
           |cb$it AS MATERIALIZED (SELECT p.j, p.code, coalesce(pn$it.v, p.v) AS v
           |         FROM cb${it - 1} p LEFT JOIN pn$it USING (j, code))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ${KmeansSql.kmeansCtes(kSql, 2, 64, "embeddings")},
         |${KmeansSql.finAssignCte(2)},
         |rv AS MATERIALIZED (SELECT q.vec_id, f.cell,
         |    [q.v[i] - c.v[i] FOR i IN range(1, len(q.v)+1)] AS v
         |  FROM qv q JOIN fin f ON q.vec_id = f.vec_id
         |  JOIN c2 c ON f.cell = c.cell),
         |seeds AS (SELECT v, rn FROM (
         |    SELECT v, row_number() OVER (ORDER BY $fnv, vec_id) AS rn
         |    FROM rv) WHERE rn <= $kc),
         |jj AS (SELECT unnest(range($m)) AS j),
         |cb0 AS (SELECT j, CAST(rn AS INTEGER) AS code,
         |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS v
         |  FROM seeds CROSS JOIN jj),
         |sv AS MATERIALIZED (SELECT vec_id, j,
         |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS sv
         |  FROM rv CROSS JOIN jj),
         |$pqLloyd,
         |codes AS MATERIALIZED (SELECT vec_id, j, code FROM (
         |    SELECT s.vec_id, s.j, c.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY 2*${dot("s.sv", "c.v")} - ${dot("c.v", "c.v")}
         |          DESC, c.code) AS rn
         |    FROM sv s JOIN cb$iters c ON s.j = c.j) WHERE rn = 1),
         |qsv AS (SELECT vec_id, j,
         |    list_slice(v, j*$sub + 1, (j+1)*$sub) AS sv
         |  FROM qv CROSS JOIN jj WHERE vec_id % 50 = 0),
         |lut AS MATERIALIZED (SELECT s.vec_id AS query_id, c.j, c.code,
         |    ${dot("s.sv", "c.v")} AS pd
         |  FROM qsv s JOIN cb$iters c ON s.j = c.j),
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |probes AS (SELECT query_id, cell FROM (
         |    SELECT q2.vec_id AS query_id, c.cell,
         |      row_number() OVER (PARTITION BY q2.vec_id
         |        ORDER BY $cosQC DESC, c.cell) AS rn
         |    FROM qv q2 CROSS JOIN c2 c WHERE q2.vec_id % 50 = 0)
         |  WHERE rn <= 3),
         |off AS (SELECT p.query_id, p.cell, ${dot("qq.v", "c.v")} AS ofs
         |  FROM probes p JOIN qv qq ON p.query_id = qq.vec_id
         |  JOIN c2 c ON p.cell = c.cell),
         |adcres AS (SELECT p.query_id, co.vec_id AS neighbor_id, r.cell,
         |    CAST(sum(l.pd) AS BIGINT) AS adcr
         |  FROM codes co
         |  JOIN (SELECT vec_id, cell FROM rv) r ON co.vec_id = r.vec_id
         |  JOIN probes p ON p.cell = r.cell
         |  JOIN lut l ON co.j = l.j AND co.code = l.code
         |    AND l.query_id = p.query_id
         |  WHERE co.vec_id != p.query_id
         |  GROUP BY 1, 2, 3),
         |adc AS (SELECT a.query_id, a.neighbor_id,
         |    a.adcr + o.ofs AS adc
         |  FROM adcres a JOIN off o
         |    ON a.query_id = o.query_id AND a.cell = o.cell),
         |approx AS (SELECT query_id, neighbor_id FROM adc
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc DESC, neighbor_id) <= 10),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM embeddings CROSS JOIN q
         |  WHERE vec_id != query_id
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY $cosEx DESC, vec_id) <= 10)
         |SELECT e.query_id,
         |  CAST(count(*) AS BIGINT) AS evaluated,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000) // 10 AS BIGINT) AS recall_permille
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY 1""".stripMargin
    },

    // INDEPENDENT formulation: rank() over the whole corpus per signal
    // ((rank − 1)·10⁶ // N == the strictly-below CDF) — the oracle runs
    // the global-window shape the engine deliberately avoids, so the
    // hash match proves the value-aggregate device is invisible
    "q167_quality_rank_blend" ->
      s"""WITH base AS (
         |  SELECT doc_id, $normSql AS norm, $wordsSql AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_tokens,
         |    CAST(CASE WHEN len(ws) = 0 THEN 0 ELSE floor(
         |      CAST(len(list_filter(ws, x -> list_contains($stopListSql, x)))
         |        AS DOUBLE) / len(ws) * 1000000.0 + 0.5) END AS BIGINT)
         |      AS stop_micro,
         |    CAST(1000000 - CASE WHEN len(norm) = 0 THEN 0 ELSE floor(
         |      CAST(len(norm) - len(regexp_replace(norm, '[[:punct:]]', '', 'g'))
         |        AS DOUBLE) / len(norm) * 1000000.0 + 0.5) END AS BIGINT)
         |      AS negpunct_micro
         |  FROM base),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sig),
         |rk AS (
         |  SELECT sig.*,
         |    CAST(((rank() OVER (ORDER BY n_tokens) - 1) * 1000000) // nn.n
         |      AS BIGINT) AS r_tokens,
         |    CAST(((rank() OVER (ORDER BY stop_micro) - 1) * 1000000) // nn.n
         |      AS BIGINT) AS r_stop,
         |    CAST(((rank() OVER (ORDER BY negpunct_micro) - 1) * 1000000) // nn.n
         |      AS BIGINT) AS r_punct
         |  FROM sig CROSS JOIN nn)
         |SELECT doc_id, n_tokens, stop_micro, negpunct_micro,
         |  r_tokens, r_stop, r_punct,
         |  CAST((r_tokens + r_stop + r_punct) // 3 AS BIGINT) AS blended_micro,
         |  CAST(CASE WHEN (r_tokens + r_stop + r_punct) // 3 >= 500000
         |    THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM rk""".stripMargin,

    // nullif'd denominators mirror the engine's NULL-on-empty-doc ratio
    // semantics (0.0/0 is NaN in both engines otherwise, and NaN compares
    // differently: DuckDB orders NaN above all values, Spark's when() sees
    // a false predicate — NULL behaves identically in both)
    "q28_text_stats" ->
      s"""WITH base AS (
         |  SELECT doc_id, $normSql AS norm, $wordsSql AS ws FROM documents),
         |stats AS (
         |  SELECT doc_id, norm, ws,
         |    CAST(len(list_filter(ws, x -> list_contains($stopListSql, x)))
         |      AS DOUBLE) / nullif(len(ws), 0) AS stop_raw
         |  FROM base)
         |SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
         |    AS BIGINT) AS n_subtokens,
         |  floor(CAST(len(norm) - len(regexp_replace(norm, '[[:punct:]]', '', 'g'))
         |    AS DOUBLE) / nullif(len(norm), 0) * 1000000.0 + 0.5)/1000000.0
         |    AS punct_ratio,
         |  floor(stop_raw * 1000000.0 + 0.5)/1000000.0 AS stop_ratio,
         |  floor(CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
         |    / nullif(len(ws), 0) * 1000000.0 + 0.5)/1000000.0 AS avg_token_len,
         |  CASE WHEN stop_raw >= 0.02 THEN 'en' ELSE 'unknown' END AS lang_guess,
         |  md5(norm) AS fp
         |FROM stats""".stripMargin,

    "q29_multimodal_bytes" ->
      """WITH p AS (
        |  SELECT doc_id, encode(text) AS bytes,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    lower(hex(encode(text))) AS h, md5(text) AS checksum
        |  FROM documents)
        |SELECT doc_id, 'text/plain' AS mime, n_bytes, checksum,
        |  substring(h, 1, 16) AS head_hex,
        |  CAST(len(list_filter(range(0, 4),
        |    i -> i * greatest(n_bytes // 4, 1) + 1 <= n_bytes)) AS BIGINT)
        |    AS n_frames,
        |  CAST(len(h) - len(replace(h, '0', '')) AS BIGINT) AS hist_0,
        |  CAST(len(h) - len(replace(h, '7', '')) AS BIGINT) AS hist_7,
        |  CAST(len(h) - len(replace(h, 'f', '')) AS BIGINT) AS hist_f
        |FROM p""".stripMargin,

    // replay of q99's generative formulas: the Spark side must RECOVER
    // these values by parsing the serialized bytes, so agreement proves the
    // decoder (offsets, endianness, two's complement, row padding) is right
    "q99_media_decode" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    32 + doc_id % 33 AS n,
        |    8000 + (doc_id % 8) * 1000 AS rate,
        |    (2 + doc_id % 6) * 3 AS rowb,
        |    2 + doc_id % 4 AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS wav_valid,
        |  CAST(1 AS BIGINT) AS wav_channels,
        |  CAST(rate AS BIGINT) AS wav_rate,
        |  CAST(16 AS BIGINT) AS wav_bits,
        |  CAST(n AS BIGINT) AS wav_n_samples,
        |  CAST((n * 2 * 1000000) // (rate * 2) AS BIGINT) AS wav_duration_us,
        |  CAST(list_sum([abs(((doc_id*131 + (i-1)*7919) % 65536) - 32768)
        |    FOR i IN range(1, n + 1)]) AS BIGINT) AS wav_sum_abs,
        |  CAST(list_max([abs(((doc_id*131 + (i-1)*7919) % 65536) - 32768)
        |    FOR i IN range(1, n + 1)]) AS BIGINT) AS wav_max_abs,
        |  CAST(1 AS BIGINT) AS bmp_valid,
        |  CAST(rowb // 3 AS BIGINT) AS bmp_width,
        |  CAST(h AS BIGINT) AS bmp_height,
        |  CAST(24 AS BIGINT) AS bmp_bpp,
        |  CAST(list_sum([(doc_id + ((j-1) // rowb)*31 + ((j-1) % rowb)*5) % 256
        |    FOR j IN range(1, h * rowb + 1)]) AS BIGINT) AS bmp_sum_pixels
        |FROM p""".stripMargin,

    // re-derives BOTH perceptual hashes from the generative formulas (no
    // byte parsing), builds the 64-bit words as HUGEINT bit sums folded to
    // signed, and takes ALL-pairs hamming ≤ 3 — an independent formulation
    // of the Spark side's chunk-bucketed join, so the bucketing's exact
    // recall at hamming ≤ 3 (pigeonhole) is itself oracle-proven. The
    // cell/segment mean compare is 64·s > total: the exact integer
    // cross-multiplication with the constant counts divided out.
    "q128_media_near_dups" -> {
      import graft.plans.Fnv1a64Expression.toSignedSqlText
      def bits(sCol: String, totCol: String, idxCol: String): String =
        toSignedSqlText(
          s"sum(CASE WHEN 64*$sCol > $totCol THEN 1::HUGEINT << $idxCol" +
            " ELSE 0::HUGEINT END)")
      s"""WITH base AS (SELECT doc_id, doc_id // 5 AS grp, doc_id % 5 AS m
         |  FROM documents),
         |ic AS (SELECT doc_id,
         |    unnest([{'cell': ((j // 48) // 2) * 8 + ((j % 48) // 3) // 2,
         |             'v': ((grp+1) * ((j // 48)*131 + (j % 48)*17 + 7)
         |                   + CASE WHEN (j // 48) < 2 AND (j % 48) < 6
         |                     THEN m*40 ELSE 0 END) % 256}
         |           FOR j IN range(0, 768)]) AS e
         |  FROM base),
         |icell AS (SELECT doc_id, e.cell AS cell, sum(e.v) AS s
         |  FROM ic GROUP BY 1, 2),
         |itot AS (SELECT doc_id, sum(s) AS total FROM icell GROUP BY 1),
         |ih AS (SELECT icell.doc_id, ${bits("s", "total", "cell")} AS h
         |  FROM icell JOIN itot USING (doc_id) GROUP BY icell.doc_id),
         |ac AS (SELECT doc_id,
         |    unnest([{'seg': i // 2,
         |             'a': abs((((grp+1) * (i*7919 + 13)
         |                   + CASE WHEN i < 4 THEN m*1000 ELSE 0 END)
         |                   % 65536) - 32768)}
         |           FOR i IN range(0, 128)]) AS e
         |  FROM base),
         |acell AS (SELECT doc_id, e.seg AS seg, sum(e.a) AS s
         |  FROM ac GROUP BY 1, 2),
         |atot AS (SELECT doc_id, sum(s) AS total FROM acell GROUP BY 1),
         |ah AS (SELECT acell.doc_id, ${bits("s", "total", "seg")} AS h
         |  FROM acell JOIN atot USING (doc_id) GROUP BY acell.doc_id)
         |SELECT 'image' AS modality, a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
         |FROM ih a JOIN ih b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h, b.h)) <= 3
         |UNION ALL
         |SELECT 'audio', a.doc_id, b.doc_id,
         |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT)
         |FROM ah a JOIN ah b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h, b.h)) <= 3""".stripMargin
    },

    // replays the COMPOSED index map (generative pixel formula ∘ nearest-
    // neighbor resize): thumbnail byte (r', k') reads source row r'·h div 3,
    // source column (k' div 3)·w div 5, channel k' mod 3 — one flat range
    // over the 45 thumbnail bytes with rp = j div 15, kp = j mod 15. The
    // constants: 5×3 output → rowBytes 15, stride 16 → 54 + 48 bytes.
    "q169_media_resize" ->
      """WITH p AS (SELECT doc_id, 6 + doc_id % 9 AS w, 4 + doc_id % 5 AS h
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS thumb_valid,
        |  CAST(5 AS BIGINT) AS thumb_w,
        |  CAST(3 AS BIGINT) AS thumb_h,
        |  CAST(102 AS BIGINT) AS thumb_bytes,
        |  CAST(list_sum([
        |      (doc_id + (((j // 15) * h) // 3) * 31
        |       + (((((j % 15) // 3) * w) // 5) * 3 + (j % 15) % 3) * 5) % 256
        |      FOR j IN range(0, 45)]) AS BIGINT) AS thumb_sum_pixels
        |FROM p""".stripMargin,

    // both variants reduce to the SAME composed thumb formula (the
    // floor(floor(2x)/2) = floor(x) identity), so the oracle materializes
    // each corpus row's 45 thumbnail pixel bytes from the base-doc formula
    // and groups on the pixel TUPLE — an independent partition (no md5, no
    // byte construction) that must coincide with the engine's md5 groups
    "q172_media_cross_resolution" ->
      """WITH p AS (SELECT doc_id, 6 + doc_id % 9 AS w, 4 + doc_id % 5 AS h
        |           FROM documents),
        |u AS (SELECT doc_id AS id, doc_id AS base, w, h FROM p
        |      UNION ALL
        |      SELECT doc_id + 10000000, doc_id, w, h FROM p),
        |t AS (SELECT id, [
        |        (base + (((j // 15) * h) // 3) * 31
        |         + (((((j % 15) // 3) * w) // 5) * 3 + (j % 15) % 3) * 5) % 256
        |        FOR j IN range(0, 45)] AS px
        |      FROM u),
        |g AS (SELECT px, count(*) AS group_size, min(id) AS canonical_id
        |      FROM t GROUP BY px)
        |SELECT t.id AS doc_id,
        |  CAST(g.group_size AS BIGINT) AS group_size,
        |  CAST(g.canonical_id AS BIGINT) AS canonical_id
        |FROM t JOIN g USING (px)""".stripMargin,

    // replays q99's generative sample formula at the decimated indices 4j:
    // the engine must recover these values by PARSING the resampled bytes,
    // so the decimator's header rewrite (rate, sizes) and the stride are
    // both under the hash
    "q173_media_resample" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    32 + doc_id % 33 AS n0,
        |    8000 + (doc_id % 8) * 1000 AS r0
        |  FROM documents),
        |q AS (SELECT doc_id, (n0 + 3) // 4 AS n, r0 // 4 AS r FROM p)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS ds_valid,
        |  CAST(r AS BIGINT) AS ds_rate,
        |  CAST(n AS BIGINT) AS ds_n_samples,
        |  CAST((n * 2 * 1000000) // (r * 2) AS BIGINT) AS ds_duration_us,
        |  CAST(list_sum([abs(((doc_id*131 + (j-1)*4*7919) % 65536) - 32768)
        |    FOR j IN range(1, n + 1)]) AS BIGINT) AS ds_sum_abs,
        |  CAST(list_max([abs(((doc_id*131 + (j-1)*4*7919) % 65536) - 32768)
        |    FOR j IN range(1, n + 1)]) AS BIGINT) AS ds_max_abs
        |FROM q""".stripMargin,

    // replays the WHOLE filter: y_j = clamp16(floor((Σ_k s(2j+k−9)·h_k +
    // 2^14)/2^15)) over the generative samples with zero-padding, the
    // floor computed as the same non-negative-shift truncating division
    // the engine uses (floor ≠ trunc on negatives; the shift makes them
    // agree provably) — one wrong tap, pad, or rounding breaks the hash
    "q175_wav_sinc_resample" -> {
      val taps = graft.ext.Resample.TapsM2.mkString("[", ", ", "]")
      s"""WITH p AS (
         |  SELECT doc_id,
         |    32 + doc_id % 33 AS n0,
         |    8000 + (doc_id % 8) * 1000 AS r0
         |  FROM documents),
         |q AS (SELECT doc_id, n0, (n0 + 1) // 2 AS n, r0 // 2 AS r FROM p),
         |jx AS (SELECT doc_id, n0, n, r, unnest(range(1, n + 1)) AS j
         |  FROM q),
         |ys AS (SELECT doc_id, n, r,
         |  LEAST(32767, GREATEST(-32768,
         |    (list_sum([
         |      (CASE WHEN (2*(j-1)+(k-1)-9) >= 0
         |            AND (2*(j-1)+(k-1)-9) < n0
         |        THEN ((doc_id*131 + (2*(j-1)+(k-1)-9)*7919) % 65536)
         |             - 32768
         |        ELSE 0 END) * ($taps[k])
         |      FOR k IN range(1, 20)]) + 16384 + 2147483648) // 32768
         |    - 65536)) AS y
         |  FROM jx)
         |SELECT doc_id,
         |  CAST(1 AS BIGINT) AS rs_valid,
         |  CAST(min(r) AS BIGINT) AS rs_rate,
         |  CAST(min(n) AS BIGINT) AS rs_n_samples,
         |  CAST((min(n) * 2 * 1000000) // (min(r) * 2) AS BIGINT)
         |    AS rs_duration_us,
         |  CAST(sum(abs(y)) AS BIGINT) AS rs_sum_abs,
         |  CAST(max(abs(y)) AS BIGINT) AS rs_max_abs
         |FROM ys GROUP BY doc_id""".stripMargin
    },

    "q34_salted_rollup" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) / 100.0
        |    AS qty_sum,
        |  count(*) AS line_count
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,

    "q43_salted_join" ->
      s"""SELECT c_mktsegment, count(*) AS orders,
         |  ${XDet.moneySumSql("o_totalprice", 2)} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin,

    // char 24-gram twin of the q22 oracle, unguarded single-join form
    "q44_char_jaccard" ->
      s"""WITH nm AS (SELECT doc_id, $normSql AS norm FROM documents),
         |idx AS (SELECT doc_id, norm,
         |          unnest(range(1, length(norm) - 22)) AS pos
         |        FROM nm WHERE length(norm) >= 24),
         |gram AS (SELECT doc_id, substring(norm, pos, 24) AS g FROM idx),
         |sh AS (SELECT DISTINCT doc_id,
         |         ${graft.plans.Fnv1a64Expression.toSignedSqlText(
                      graft.plans.Fnv1a64Expression.stringSqlText("g"))}
         |           AS shingle
         |       FROM gram),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |          FROM sh a JOIN sh b USING (shingle)
         |          WHERE a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, inter AS shared,
         |  floor(CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter)*1000000.0
         |    + 0.5)/1000000.0 AS jaccard
         |FROM inter
         |JOIN sizes na ON id_a = na.doc_id
         |JOIN sizes nb ON id_b = nb.doc_id
         |WHERE CAST(inter AS DOUBLE)/(na.n_sh + nb.n_sh - inter) >= 0.3""".stripMargin,

    "q35_cosine_near_dups" -> {
      val cosCent = Similarity.cosineSqlText("embedding", "ce")
      val cosAB = Similarity.cosineSqlText("ea", "eb")
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce
         |              FROM embeddings WHERE vec_id % 50 = 7),
         |assigned AS (
         |  SELECT vec_id, embedding, cell
         |  FROM embeddings CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY $cosCent DESC, cell) = 1),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    a.embedding AS ea, b.embedding AS eb
         |  FROM assigned a JOIN assigned b USING (cell)
         |  WHERE a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  floor(($cosAB)*1000000.0 + 0.5)/1000000.0 AS cosine
         |FROM pairs
         |WHERE $cosAB >= 0.4""".stripMargin
    },

    // SRP oracle: the same FNV-derived integer hyperplanes re-derived in
    // HUGEINT SQL, the same exact sign bits over scaled-long vectors, the
    // same 16-bit band keys — then candidates and the exact cosine verify.
    // Nothing is borrowed from the Spark side but the (deterministic)
    // weight DEFINITION; the banding and verification are re-expressed.
    "q77_srp_near_dups" -> {
      import graft.plans.Fnv1a64Expression.{longSqlText, toSignedSqlText}
      // double FNV fold, mirroring hyperplaneWeights: the first pass stays
      // unsigned HUGEINT (its bytes feed the second pass exactly like
      // Spark's >>> on the signed long), the second converts to signed
      // before the modular map
      val h1 = longSqlText("14695981039346656037::HUGEINT",
        "CAST(i*64 + d AS HUGEINT)")
      val signedFnv = toSignedSqlText(
        longSqlText("14695981039346656037::HUGEINT", "h1"))
      val wexpr = s"((($signedFnv) % 1001 + 1001) % 1001 - 500)"
      val cosAB = Similarity.cosineSqlText("ea", "eb")
      s"""WITH aug AS (
         |  SELECT vec_id,
         |    [CAST(embedding[dd] AS DOUBLE) FOR dd IN range(1, 65)] AS emb
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000,
         |    [CAST(embedding[dd] AS DOUBLE)
         |       + CASE WHEN dd = 1 THEN 0.05 ELSE 0.0 END
         |     FOR dd IN range(1, 65)]
         |  FROM embeddings WHERE vec_id % 50 = 3),
         |e AS (SELECT vec_id,
         |  [CAST(floor(emb[dd]*1000000.0 + 0.5)
         |    AS BIGINT) FOR dd IN range(1, 65)] AS qv FROM aug),
         |idx AS (SELECT i, d
         |        FROM (SELECT unnest(range(128)) AS i),
         |             (SELECT unnest(range(64)) AS d)),
         |hh AS (SELECT i, d, $h1 AS h1 FROM idx),
         |wts AS (SELECT i, list($wexpr ORDER BY d) AS w
         |        FROM hh GROUP BY i),
         |dots AS (SELECT vec_id, i,
         |           list_sum([qv[d+1]*w[d+1] FOR d IN range(0, 64)]) AS dot
         |         FROM e CROSS JOIN wts),
         |bv AS (SELECT vec_id, i // 16 AS band,
         |         list(CASE WHEN dot >= 0 THEN 1::BIGINT ELSE 0::BIGINT END
         |           ORDER BY i) AS bits
         |       FROM dots GROUP BY 1, 2),
         |keys AS (SELECT vec_id, band,
         |           list_sum([bits[j+1]*(1::BIGINT << j)
         |             FOR j IN range(0, 16)]) AS bkey FROM bv),
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |         FROM keys a JOIN keys b
         |           ON a.band = b.band AND a.bkey = b.bkey
         |          AND a.vec_id < b.vec_id),
         |pairs AS (SELECT id_a, id_b, a.emb AS ea, b.emb AS eb
         |          FROM cand JOIN aug a ON a.vec_id = id_a
         |                    JOIN aug b ON b.vec_id = id_b)
         |SELECT id_a, id_b,
         |  floor(($cosAB)*1000000.0 + 0.5)/1000000.0 AS cosine
         |FROM pairs WHERE $cosAB >= 0.95""".stripMargin
    },

    // rolling sketch oracle: min over the same FNV of the same trigram
    // windows; docs shorter than 3 words fall back to the whole-text hash
    "q51_rolling_sketch" -> {
      import graft.plans.Fnv1a64Expression.{stringSqlText, toSignedSqlText}
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents
         |           WHERE text IS NOT NULL),
         |grams AS (
         |  SELECT doc_id, array_to_string(ws[i+1:i+3], ' ') AS g
         |  FROM (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i
         |        FROM w WHERE len(ws) >= 3)
         |  UNION ALL
         |  SELECT doc_id, array_to_string(ws, ' ') AS g
         |  FROM w WHERE len(ws) < 3)
         |SELECT doc_id,
         |  min(${toSignedSqlText(stringSqlText("g"))}) AS sketch
         |FROM grams GROUP BY doc_id""".stripMargin
    },

    // session boundary rule mirrored exactly: events merge iff the gap to
    // the previous event is STRICTLY less than 30 min (Spark merges while
    // next.ts < prev.ts + gap), session end = last event + gap
    "q50_session_windows" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS dt FROM events),
        |lg AS (SELECT *, lag(dt) OVER (PARTITION BY user_id ORDER BY dt)
        |         AS pdt FROM e),
        |mk AS (SELECT *, CASE WHEN pdt IS NULL
        |         OR dt - pdt >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |       FROM lg),
        |sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY dt
        |           ROWS UNBOUNDED PRECEDING) AS sid
        |         FROM mk)
        |SELECT strftime(min(dt), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(dt) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |    AS session_end,
        |  user_id, count(*) AS events
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    // closed-session boundary rule mirrored exactly: merge iff gap <= 30
    // min (strictly-greater closes — the complement of q50's rule); each
    // user's last island is the unemitted streaming tail and is dropped
    "q98_closed_sessions" ->
      """WITH e AS (SELECT user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |lg AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |         AS pt FROM e),
        |mk AS (SELECT *, CASE WHEN pt IS NULL
        |         OR t - pt > 1800000000 THEN 1 ELSE 0 END AS brk FROM lg),
        |sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |           ROWS UNBOUNDED PRECEDING) AS sid
        |         FROM mk),
        |agg AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS events,
        |          min(t) AS first_ts_micros, max(t) AS last_ts_micros
        |        FROM sess GROUP BY 1, 2),
        |mx AS (SELECT user_id, max(sid) AS msid FROM agg GROUP BY 1)
        |SELECT user_id, events, first_ts_micros, last_ts_micros
        |FROM agg JOIN mx USING (user_id) WHERE sid < msid""".stripMargin,

    // µs-cast before every comparison, matching the Spark read-side
    // truncation (events.parquet is TIMESTAMP(NANOS))
    "q102_attribution_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_us,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_us, p.value
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        |  AND CAST(p.ts AS TIMESTAMP)
        |    <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE""".stripMargin,

    // tumbling 1h windows are epoch-aligned in both engines: date_trunc is
    // Spark's window(ts, '1 hour') start for hour-multiples
    "q47_stream_batch_twin" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
        |             event_type
        |           FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  event_type, count(*) AS events
        |FROM e GROUP BY 1, 2, 3""".stripMargin,

    "q37_length_quantiles" ->
      """SELECT lang, count(*) AS docs,
        |  quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.75) AS p75
        |FROM documents GROUP BY lang""".stripMargin,

    "q38_rollup_orders" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS orders,
         |  ${XDet.moneySumSql("o_totalprice", 2)} AS total
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q39_set_ops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O')
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal < 0""".stripMargin,
  )
}
