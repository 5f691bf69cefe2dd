package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge LEARNING over the corpus — the training side of
  * the subword story ([[graft.plans.WordpieceExpression]] is the inference
  * side over a GIVEN vocabulary; this learns the vocabulary's merge rules
  * from the data, Sennrich et al. ACL'16).
  *
  * Algorithm (word-level BPE over a frequency dictionary — the standard
  * formulation): build the (word, count) table once, represent each word as
  * a wrapped-symbol string (initially its characters), then for k rounds:
  * count adjacent symbol pairs weighted by word count, take the argmax pair
  * under the total order (count DESC, left ASC, right ASC), and merge that
  * pair everywhere.
  *
  * Distributed posture (the X58 k-means model): the mutable state — the
  * learned merge list — is DRIVER-sized (k rows), collected via a bounded
  * `TakeOrderedAndProject` (orderBy.limit(1), never a global sort) and
  * folded back into the next round as LITERAL `replace` calls; the data-
  * sized side stays a DataFrame. Per round: one projection + one pair
  * explode + one mergeable groupBy over the distinct-WORD table — which is
  * VOCABULARY-sized, not corpus-sized. The corpus is scanned exactly once
  * (the pinned frequency table); 100 TB of text funnels into a few million
  * distinct words before any iteration starts, so rounds cost |vocab|, and
  * the explode/agg shape partitions on the pair key like any other
  * aggregate here.
  *
  * Merge application is EXACTLY canonical greedy left-to-right list
  * merging, via representation: each symbol rides wrapped as `(sym)`, so
  * the merge of pair (l, r) is ONE literal `replace(sym, "(l)(r)", "(lr)")`
  * — the pattern consumes whole wrapped tokens only (symbols are
  * [[WordCharset]]-restricted, so '(' never occurs inside one), every token
  * carries its own delimiters (no shared separator, the trap a
  * space-separated encoding falls into on runs like `a a a a`), and
  * `replace`'s non-overlapping left-to-right scan in BOTH Spark and DuckDB
  * is precisely the greedy merge order. One pass per merge, no fixpoint
  * iteration. The DuckDB oracle replays the whole fit — wrapped chars, pair
  * counts, argmax, replaces — as k unrolled CTE layers, so a wrong
  * tie-break or a non-greedy alignment breaks the hash.
  *
  * Pre-tokenization contract: the frequency table keeps words matching
  * `^[a-z0-9]+$` with 2..[[MaxWordLen]] characters (normalized text is
  * already lowercase). Real tokenizer training applies the same shape —
  * punctuation is split off upstream and unbounded "words" (URLs, base64
  * blobs) are excluded so they cannot dominate every round; here the
  * charset additionally guarantees the wrapper characters stay unambiguous.
  */
object Bpe {

  /** Symbols per word cap — bounds the per-word explode fan-out. */
  val MaxWordLen = 16

  /** Regex (full-match) for words admitted to BPE training. */
  val WordCharset = "[a-z0-9]+"

  /** The base-alphabet chars of [[WordCharset]], one string each — the
    * single source for every site that enumerates the base vocabulary
    * (the merge learner's seed symbols, [[bpeVocab]]'s export,
    * [[vocabPrune]]'s piece accounting; the SQL oracles inline the same
    * 36 chars and cite this constant). If the charset ever changes, this
    * and [[WordCharset]] must move together.
    */
  val BaseChars: Seq[String] =
    "abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString)

  /** (word, wc) frequency table over the normalized corpus, charset- and
    * length-bounded. The ONE corpus-sized pass of the whole fit — pin the
    * result.
    */
  def wordFreq(docs: DataFrame, text: String): DataFrame =
    docs
      .select(explode(split(Dedup.normalizeText(col(text)), " ")).as("word"))
      .filter(length(col("word")).between(2, MaxWordLen) &&
        col("word").rlike(s"^$WordCharset$$"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** "(h)(e)(l)(l)(o)" — each character wrapped in its own delimiters. */
  private def wrappedSym(word: Column): Column =
    regexp_replace(word, "(.)", "($1)")

  /** All learned merges applied in rank order — one greedy replace each. */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(wrappedSym(word)) { case (c, (l, r)) =>
      call_function("replace", c, lit(s"($l)($r)"), lit(s"($l$r)"))
    }

  /** Wrapped-symbol string → symbol array. */
  private def symArray(sym: Column): Column =
    split(regexp_replace(sym, "^\\(|\\)$", ""), "\\)\\(")

  /** Adjacent symbol pairs of `sym` weighted by `wc`: (l, r, wc) rows.
    * Words collapsed to a single symbol emit none (the size guard — Spark's
    * `sequence(0, -1)` would DESCEND).
    */
  private def pairStream(freq: DataFrame, sym: Column): DataFrame =
    freq.select(col("wc"), symArray(sym).as("__a"))
      .filter(size(col("__a")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(0, size(__a) - 2), " +
          "j -> struct(__a[j] AS l, __a[j + 1] AS r))")).as("__p"))
      .select(col("__p.l").as("l"), col("__p.r").as("r"), col("wc"))

  /** Learn `k` merge rules, one Spark job per merge — the literal
    * formulation (argmax, merge, repeat). Kept as the REFERENCE
    * implementation: [[learnMerges]] must match it bit-for-bit (the
    * BpeSpec property), and the q132 oracle replays exactly this loop.
    */
  def learnMergesSequential(freq: DataFrame, k: Int): Seq[(String, String, Long)] = {
    var merges = Vector.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val sym = applyMerges(col("word"), merges.map(m => (m._1, m._2)))
      val best = pairStream(freq, sym)
        .groupBy("l", "r").agg(sum("wc").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val row = best.head
        merges :+= ((row.getString(0), row.getString(1), row.getLong(2)))
      }
    }
    merges
  }

  /** Learn `k` merge rules in BATCHED rounds — bit-identical to
    * [[learnMergesSequential]] (spec-pinned, and the q132 oracle replays
    * the sequential loop, so any divergence hash-fails) at a fraction of
    * the driver barriers: each round collects the top-(2·cap+4) ranked
    * pairs in ONE bounded `TakeOrderedAndProject` job and accepts, on the
    * driver, the longest ranked PREFIX that sequential greedy provably
    * also picks. A 32k-merge vocabulary then costs ~vocab-batches jobs,
    * not 2·32k sequential barriers (the round-8 scale flag).
    *
    * Why a ranked prefix is safe (each condition maps to a stop rule):
    * accepting p₁..pⱼ from the round's total order (count DESC, l, r)
    * reproduces sequential steps 1..j iff each pᵢ₊₁'s count is INVARIANT
    * under merges p₁..pᵢ and nothing those merges CREATE can outrank it.
    *
    *  - Pairwise symbol-disjointness (stop before any candidate touching
    *    an accepted pair's l, r, OR merged string l+r): merging (l,r)
    *    only changes counts of pairs involving l, r, or the new symbol
    *    l+r — which may COLLIDE with an existing symbol, hence the
    *    merged-string leg — so a disjoint pᵢ₊₁'s count is untouched.
    *  - Strict count drop at the batch boundary (shrink j while
    *    count(pⱼ) == count of candidate j+1): a pair CREATED by merging
    *    pₐ occurs only where an OLD pair overlapping pₐ's symbols
    *    occurred, so its count is ≤ that old pair's — and every old pair
    *    overlapping an accepted pair is ranked PAST the whole prefix
    *    (disjointness keeps it out), so created pairs rank strictly
    *    below count(pⱼ) once the boundary drop is strict. Old surviving
    *    pairs rank after pᵢ₊₁ by the round's own total order. Ties
    *    INSIDE the batch are fine; only the boundary needs strictness.
    *  - Self-pairs (l == r) TERMINATE the batch after acceptance: merging
    *    (z,z) creates (zz,z)/(z,zz) pairs bounded only by count(z,z)
    *    itself — the one case where a created pair can tie the batch.
    *  - A batch of 1 is always safe (it IS the sequential step), so the
    *    shrink loop bottoms out correct; a round with zero pairs ends
    *    the fit (merging never creates pairs out of nothing).
    *
    * Rounds re-derive the symbolization by folding ALL learned merges
    * over the base wrapped chars — O(rounds·|merges|) literal replaces
    * over the VOCABULARY-sized freq table, cheap because rounds ≈
    * k/batch; the corpus itself was scanned once into `freq`.
    */
  def learnMerges(freq: DataFrame, k: Int): Seq[(String, String, Long)] = {
    var merges = Vector.empty[(String, String, Long)]
    var exhausted = false
    while (merges.size < k && !exhausted) {
      val cap = k - merges.size
      val window = 2 * cap + 4
      val sym = applyMerges(col("word"), merges.map(m => (m._1, m._2)))
      val ranked = pairStream(freq, sym)
        .groupBy("l", "r").agg(sum("wc").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(window).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (ranked.isEmpty) exhausted = true
      else {
        var j = 0
        val used = scala.collection.mutable.Set.empty[String]
        var stop = false
        while (!stop && j < ranked.length && j < cap) {
          val (l, r, _) = ranked(j)
          if (used.contains(l) || used.contains(r)) stop = true
          else {
            used += l; used += r; used += (l + r)
            j += 1
            if (l == r) stop = true
          }
        }
        // boundary strictness: count(p_j) must strictly beat the first
        // unaccepted candidate; j == ranked.length means NO other pair
        // exists at all (window not even filled), which is vacuously safe
        while (j > 1 && j < ranked.length && ranked(j - 1)._3 == ranked(j)._3)
          j -= 1
        merges ++= ranked.take(j)
      }
    }
    merges
  }

  /** Largest merge count the model store fits (and the largest any catalog
    * face asks for — q151's sweep tops out here). One stored fit serves
    * every smaller k as a prefix slice, see [[storedMerges]].
    */
  val MaxStoredMerges = 128

  /** [[learnMerges]] through the content-keyed model store
    * ([[graft.sources.Tables.ensureMaterialized]], round-12 verdict item
    * 6): fitted merge rules are MODEL STATE — a pure function of the
    * corpus text — so they are learned once per corpus vintage, published
    * as an ordered parquet rule table, and every later session (or
    * sibling query in the same session) re-reads ~128 rows instead of
    * re-running the fit's per-round driver barriers. The store always
    * fits [[MaxStoredMerges]] rules: BPE learning is greedy-prefix-stable
    * (merge i never depends on any later merge — the q151 sweep's
    * spec-pinned property), so ONE stored model serves the whole family
    * (q132/q133/q142/q145/q151/q154) at any k ≤ 128 via `take(k)`,
    * counts included. The rank column carries the order parquet drops.
    */
  /** `variant` distinguishes stores fitted on different SLICES of the same
    * source file (e.g. the q180 frozen-vocabulary drift face trains on the
    * base slice only) — it folds into the content key, so slice fits never
    * collide with the full-corpus model. */
  def storedMerges(docs: DataFrame, text: String, srcPath: String,
                   k: Int, variant: String = ""): Seq[(String, String, Long)] = {
    require(k <= MaxStoredMerges,
      s"storedMerges serves k <= $MaxStoredMerges (got $k) — call " +
        "learnMerges directly past the store's fit size")
    val spark = docs.sparkSession
    val stored = graft.sources.Tables.ensureMaterialized(spark, "bpe_merges",
        graft.sources.Tables.contentKey(srcPath,
          s"k=$MaxStoredMerges$variant")) {
      val freq = Caches.pin(wordFreq(docs, text))
      val merges = learnMerges(freq, MaxStoredMerges)
      import spark.implicits._
      merges.zipWithIndex.map { case ((l, r, c), i) => (i.toLong, l, r, c) }
        .toDF("rank", "l", "r", "c")
    }
    stored.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .take(k).toSeq
  }

  /** The learned merge table: (rank, left, right, merged, pair_count) — k
    * rows, hash-checkable. With `srcPath` the rules come from the
    * [[storedMerges]] model store; otherwise `docs` is scanned once
    * (pinned freq table) and the fit runs in-session.
    */
  def bpeMerges(docs: DataFrame, text: String, k: Int,
                srcPath: Option[String] = None): DataFrame = {
    val merges = srcPath match {
      case Some(p) => storedMerges(docs, text, p, k)
      case None    => learnMerges(Caches.pin(wordFreq(docs, text)), k)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, l + r, c) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** The learned merges exported as a WordPiece-style INFERENCE vocabulary
    * — the bridge from training ([[learnMerges]]) to the greedy
    * longest-match tokenizer ([[graft.plans.WordpieceExpression]]): every
    * charset character plus every merged symbol, each present BOTH as a
    * start piece and as a `##`-prefixed continuation piece (BPE has no
    * word-boundary asymmetry, so the two sets coincide — the export makes
    * that explicit rather than leaving the tokenizer's continuation set
    * empty). All 36 charset chars are included unconditionally: a char
    * absent from the corpus never matches, and the fixed base keeps the
    * vocabulary deterministic for the oracle replay.
    */
  def bpeVocab(merges: Seq[(String, String)]): Seq[String] = {
    val symbols = BaseChars ++ merges.map { case (l, r) => l + r }
    symbols ++ symbols.map("##" + _)
  }

  /** Learn→tokenize round-trip accounting: per doc, the corpus token count
    * under BPE MERGE-ORDER application ([[tokenCounts]]' rule) vs greedy
    * LONGEST-MATCH inference over the exported [[bpeVocab]] — plus how
    * many word occurrences the two segmentations disagree on. The two
    * rules differ in general (greedy longest-match can split differently
    * than merge-rank order: the WordPiece-vs-BPE inference gap, public
    * knowledge from the tokenizer literature), so the disagreement count
    * is REPORTED, not assumed zero, and the oracle replays BOTH sides —
    * the BPE fit as the k-layer CTE chain and the greedy matcher as a
    * MaxWordLen-layer longest-prefix iteration.
    *
    * Both rules run once per DISTINCT word (vocabulary-sized expression
    * cost) and join back to the corpus word stream — the q133 shape.
    * Out-of-bounds words (1 char, > [[MaxWordLen]], off-charset) count 1
    * under both rules, so they never disagree.
    */
  def roundTrip(docs: DataFrame, id: String, text: String,
                merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(id),
      explode(split(Dedup.normalizeText(col(text)), " ")).as("word"))
      .filter(col("word") =!= "")
    val merged = applyMerges(col("word"), merges)
    val inBounds = length(col("word")).between(2, MaxWordLen) &&
      col("word").rlike(s"^$WordCharset$$")
    // only IN-BOUNDS words enter the broadcast table: the unbounded-
    // cardinality token mass (ids, URLs, base64) is over-length or
    // off-charset, so the build side stays vocabulary-sized at 100 TB —
    // an unfiltered distinct-word broadcast would be corpus-sized on
    // exactly those corpora. Out-of-bounds occurrences take the
    // constant-1 path through the left join's null branch (both rules
    // count them 1, so they never disagree — no join needed).
    val distinctWords = words.select("word").distinct()
      .filter(inBounds)
      .withColumn("__bpe",
        (length(merged) -
          length(call_function("replace", merged, lit("("), lit(""))))
          .cast("long"))
      .withColumn("__wp", graft.plans.WordpieceExpression
        .wordpieceCount(col("word"), bpeVocab(merges)))
    // the VOCABULARY side broadcasts (bounded per the filter above; the
    // corpus word stream is the data-sized side) — without the hint
    // Spark's post-explode size estimate can invert the build side and
    // serialize the aggregation
    words.join(broadcast(distinctWords), Seq("word"), "left")
      .groupBy(col(id))
      .agg(sum(coalesce(col("__bpe"), lit(1L))).as("bpe_tokens"),
        sum(coalesce(col("__wp"), lit(1L))).as("wp_tokens"),
        sum(when(coalesce(col("__bpe"), lit(1L)) =!=
            coalesce(col("__wp"), lit(1L)), lit(1L)).otherwise(lit(0L)))
          .as("disagree_words"))
  }

  /** Raw-word length bound for [[vocabCoverage]]: words longer than this
    * are excluded from the coverage metric entirely (an unbounded blob —
    * URL, base64 — is not a word; real coverage dashboards apply the same
    * cap). 2× the training bound, so every word the FIT ever saw is
    * covered plus a band of longer natural words.
    */
  val MaxCoverageWordLen: Int = 2 * MaxWordLen

  /** Vocabulary coverage / UNK-rate of the learned-BPE inference
    * vocabulary over the RAW word stream — the production question a
    * tokenizer report answers ("what fraction of my corpus does this
    * vocabulary even tokenize"): per `group`, the word occurrences, the
    * occurrences the greedy tokenizer maps to `[UNK]`, the distinct
    * `[UNK]` word forms, the total subword tokens, and the UNK rate in
    * integer permille.
    *
    * Unlike [[roundTrip]]/[[tokenCounts]] — whose contract EXCLUDES
    * out-of-bounds words from tokenization (count 1, never split) — this
    * operator feeds every word (up to [[MaxCoverageWordLen]]) to the
    * greedy longest-match tokenizer, so the `[UNK]` path of
    * [[graft.plans.WordpieceExpression]] is exercised on data, not just in
    * specs: the exported vocabulary contains all 36 charset characters, so
    * a word is `[UNK]` exactly when it carries an off-charset character
    * (`-`, `#`, …) — the ids, URLs, and punctuation-glued tokens real
    * corpora are full of. The UNK verdict is taken from the TOKENIZER
    * (pieces == "[UNK]"), not re-derived from a charset regex, so the
    * expression's own discard-partial-matches rule is what is measured.
    *
    * Scale shape: DIRECT per-occurrence evaluation — unlike
    * [[roundTrip]]/[[tokenCounts]], no distinct-word join. The raw word
    * stream here contains unbounded-cardinality id/URL tokens, so a
    * distinct-word table is corpus-sized (never broadcastable at 100 TB),
    * while the greedy matcher is a cheap codegen'd scalar (a handful of
    * bounded hash probes per word). The whole plan is one map-only
    * projection plus a mergeable groupBy on the small `group` key; the
    * only distinct aggregate (`unk_vocab`) partial-dedupes map-side and
    * shuffles (group, unk-word) pairs — the UNK vocabulary, not the
    * corpus.
    */
  def vocabCoverage(docs: DataFrame, group: String, text: Column,
                    merges: Seq[(String, String)]): DataFrame = {
    import graft.plans.WordpieceExpression.{wordpieceCount, wordpiecePieces}
    val vocab = bpeVocab(merges)
    docs.select(col(group),
        explode(split(Dedup.normalizeText(text), " ")).as("word"))
      .filter(col("word") =!= "" &&
        length(col("word")) <= MaxCoverageWordLen)
      .withColumn("__wp", wordpieceCount(col("word"), vocab))
      .withColumn("__unk",
        (wordpiecePieces(col("word"), vocab) === "[UNK]").cast("long"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_words"),
        sum("__unk").as("unk_words"),
        sum("__wp").as("wp_tokens"),
        countDistinct(when(col("__unk") === 1, col("word")))
          .as("unk_vocab"))
      .withColumn("unk_permille", expr("(unk_words * 1000) div n_words"))
  }

  /** Tokenizer-coverage DRIFT monitor under a FROZEN vocabulary — the
    * monitoring half of the incremental-maintenance family (X150–X153
    * fold model STATE; this watches whether the model still FITS the
    * data): the vocabulary is trained on the base corpus and frozen, a
    * new batch arrives (`isBatch` marks its rows), and per `group` the
    * report compares base vs batch on the two signals a tokenizer
    * deployment actually watches —
    *  - UNK permille (off-charset word mass: distribution shift in the
    *    raw character inventory; merge-INdependent, since the exported
    *    vocabulary always carries all 36 charset chars), and
    *  - fertility permille (subword tokens per 1000 words under the
    *    frozen merges: the number that degrades when the batch's word
    *    distribution no longer matches what the merges were learned on —
    *    merge-DEPENDENT, the reason the vocabulary is trained on the
    *    BASE slice, not the union).
    * `refit_flag` fires when either |drift| ≥ `refitPermille` — the
    * documented trigger for re-running the fit (BPE merges cannot fold:
    * merge i depends on the counts AFTER merge i−1, so unlike
    * k-means/PQ/energy state the only maintenance move is refit, and the
    * decision needs a measured signal, which this is). Slices with no
    * words in a group report NULL permilles and never fire the flag.
    *
    * Scale shape: identical to [[vocabCoverage]] — one map-only
    * projection over the word stream (the greedy matcher is a bounded
    * codegen'd scalar) plus one mergeable conditional-sum groupBy on the
    * small `group` key; the batch flag rides the row, so base and batch
    * are measured in a single corpus pass, no join anywhere.
    */
  def vocabDrift(docs: DataFrame, group: String, isBatch: Column,
                 text: Column, merges: Seq[(String, String)],
                 refitPermille: Long = 50L): DataFrame = {
    import graft.plans.WordpieceExpression.{wordpieceCount, wordpiecePieces}
    val vocab = bpeVocab(merges)
    def permille(num: String, den: String): Column =
      when(col(den) > 0, expr(s"($num * 1000) div $den"))
    docs.select(col(group), isBatch.as("__b"),
        explode(split(Dedup.normalizeText(text), " ")).as("word"))
      .filter(col("word") =!= "" &&
        length(col("word")) <= MaxCoverageWordLen)
      .withColumn("__wp", wordpieceCount(col("word"), vocab))
      .withColumn("__unk",
        (wordpiecePieces(col("word"), vocab) === "[UNK]").cast("long"))
      .groupBy(col(group))
      .agg(
        sum(when(!col("__b"), 1L).otherwise(0L)).as("base_n_words"),
        sum(when(!col("__b"), col("__unk")).otherwise(0L))
          .as("__base_unk"),
        sum(when(!col("__b"), col("__wp")).otherwise(0L)).as("__base_wp"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("batch_n_words"),
        sum(when(col("__b"), col("__unk")).otherwise(0L))
          .as("__batch_unk"),
        sum(when(col("__b"), col("__wp")).otherwise(0L)).as("__batch_wp"))
      .withColumn("base_unk_permille",
        permille("__base_unk", "base_n_words"))
      .withColumn("batch_unk_permille",
        permille("__batch_unk", "batch_n_words"))
      .withColumn("base_fertility_permille",
        permille("__base_wp", "base_n_words"))
      .withColumn("batch_fertility_permille",
        permille("__batch_wp", "batch_n_words"))
      .withColumn("unk_drift_permille",
        col("batch_unk_permille") - col("base_unk_permille"))
      .withColumn("fertility_drift_permille",
        col("batch_fertility_permille") - col("base_fertility_permille"))
      .withColumn("refit_flag", coalesce(
        (abs(col("unk_drift_permille")) >= refitPermille ||
          abs(col("fertility_drift_permille")) >= refitPermille)
          .cast("long"), lit(0L)))
      .drop("__base_unk", "__base_wp", "__batch_unk", "__batch_wp")
  }

  /** Per-doc token accounting under a learned merge list: (id, bpe_tokens,
    * ws_tokens) — the corpus re-tokenized by its OWN learned rules. The
    * merge cascade (k replaces) runs once per DISTINCT word; the corpus
    * word stream joins the result by word (Σ words rows, the LM-scoring
    * shape), so the expression cost is vocabulary-sized. Words outside the
    * training bounds (1 char, > [[MaxWordLen]], or off-charset) count 1
    * token each — they were never split. The token count is the '('
    * population of the merged string (every symbol carries exactly one).
    */
  def tokenCounts(docs: DataFrame, id: String, text: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(id),
      explode(split(Dedup.normalizeText(col(text)), " ")).as("word"))
      .filter(col("word") =!= "")
    val merged = applyMerges(col("word"), merges)
    // in-bounds words only on the broadcast side (out-of-bounds words
    // count 1 via the left join's null branch) — see [[roundTrip]]'s
    // cardinality note: the unbounded id/URL token mass must not reach
    // the broadcast build
    val distinctWords = words.select("word").distinct()
      .filter(length(col("word")).between(2, MaxWordLen) &&
        col("word").rlike(s"^$WordCharset$$"))
      .withColumn("__ntok",
        (length(merged) -
          length(call_function("replace", merged, lit("("), lit(""))))
          .cast("long"))
    // vocabulary side broadcasts — see [[roundTrip]]'s join note
    words.join(broadcast(distinctWords), Seq("word"), "left")
      .groupBy(col(id))
      .agg(sum(coalesce(col("__ntok"), lit(1L))).as("bpe_tokens"),
        count(lit(1)).as("ws_tokens"))
  }

  /** Usage-weighted piece counts of the greedy tokenizer over the TRAINING
    * word-frequency table: per merged-or-base SYMBOL (the `##` prefix
    * stripped — BPE's export is boundary-symmetric, so start and
    * continuation occurrences of one symbol are one budget line), the
    * total corpus occurrences of that piece in the greedy longest-match
    * segmentation. The greedy matcher runs once per DISTINCT in-bounds
    * word (vocabulary-sized expression cost, the q133 shape); the word
    * count `wc` weights each piece by its corpus multiplicity.
    *
    * This is the measurement [[vocabPrune]] prunes on: greedy
    * longest-match routinely strands early merges (a rank-3 merge
    * swallowed by every longer merge containing it scores ZERO here), and
    * a usage table is how a production tokenizer build finds them.
    */
  def pieceUsage(freq: DataFrame,
                 merges: Seq[(String, String)]): DataFrame = {
    import graft.plans.WordpieceExpression.wordpiecePieces
    freq
      .withColumn("__p", wordpiecePieces(col("word"), bpeVocab(merges)))
      .select(explode(split(col("__p"), " ")).as("piece"), col("wc"))
      .select(regexp_replace(col("piece"), "^##", "").as("sym"), col("wc"))
      .groupBy("sym").agg(sum("wc").as("usage"))
  }

  /** Usage-based vocabulary pruning + before/after coverage — the
    * maintenance pass a tokenizer build runs after [[learnMerges]]: learn
    * k merges, MEASURE which exported pieces the greedy tokenizer actually
    * uses on the training corpus ([[pieceUsage]]), drop merged symbols
    * whose usage falls below `minUsagePermille` of the total in-bounds
    * word mass (a RELATIVE threshold — an absolute count would mean a
    * different policy at every corpus scale), and report
    * [[vocabCoverage]] side by side for the full and pruned vocabularies.
    * Base charset pieces are never pruned (they are the tokenizer's
    * totality guarantee: any in-charset word segments, whatever the merge
    * list).
    *
    * The pruning decision itself is model-sized: `usage` is joined to the
    * ≤ k merged symbols and collected (k rows — the q132 merge-collect
    * posture, never a data-path collect). Everything corpus-sized stays
    * distributed: the usage measurement is one explode + mergeable
    * groupBy, each coverage pass is q145's map-only projection + small
    * rollup.
    *
    * Output per (variant ∈ full|pruned, group): q145's coverage columns
    * plus `n_pieces` (distinct un-prefixed symbols in that vocabulary) and
    * `n_merges_kept`.
    */
  def vocabPrune(docs: DataFrame, group: String, text: Column,
                 trainText: String, k: Int,
                 minUsagePermille: Int,
                 preMerges: Option[Seq[(String, String)]] = None)
      : DataFrame = {
    require(minUsagePermille >= 0,
      s"minUsagePermille must be >= 0, got $minUsagePermille")
    val freq = Caches.pin(wordFreq(docs, trainText))
    // preMerges: the caller already holds the fitted rules (the model
    // store) — the freq pin stays, it still feeds totalWc and pieceUsage
    val merges = preMerges.getOrElse(learnMerges(freq, k).map(m => (m._1, m._2)))
    // sum() over zero rows is NULL — fail with a diagnosis instead of the
    // opaque NPE getLong would throw on an empty training corpus
    val totalWc = freq.agg(sum(col("wc"))).head match {
      case r if r.isNullAt(0) =>
        throw new IllegalArgumentException(
          "vocabPrune: empty training corpus — no words passed the " +
            s"charset/length gate (${WordCharset}, 2..$MaxWordLen chars)")
      case r => r.getLong(0)
    }
    val usage = pieceUsage(freq, merges)
    val spark = docs.sparkSession
    import spark.implicits._
    val mergedSyms = merges.map { case (l, r) => l + r }.distinct
    // k-row model collect: usage of the merged symbols only
    val usedEnough: Set[String] = usage
      .join(broadcast(mergedSyms.toDF("sym")), Seq("sym"), "left_semi")
      .filter(col("usage") * lit(1000L) >=
        lit(totalWc) * lit(minUsagePermille.toLong))
      .collect().map(_.getString(0)).toSet
    val kept = merges.filter { case (l, r) => usedEnough(l + r) }
    def sized(v: Seq[(String, String)]): Long =
      (BaseChars ++ v.map { case (l, r) => l + r }).distinct.size.toLong
    Seq(("full", merges), ("pruned", kept)).map { case (variant, ms) =>
      vocabCoverage(docs, group, text, ms)
        .withColumn("variant", lit(variant))
        .withColumn("n_pieces", lit(sized(ms)))
        .withColumn("n_merges_kept", lit(ms.map(m => m._1 + m._2)
          .distinct.size.toLong))
    }.reduce(_ unionByName _)
      .select(col("variant"), col(group), col("n_words"), col("unk_words"),
        col("wp_tokens"), col("unk_vocab"), col("unk_permille"),
        col("n_pieces"), col("n_merges_kept"))
  }
}
