package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data curation: token counting
  * (whitespace and regex "BPE-ish" subtokens), quality stats (punctuation /
  * stopword ratios, average token length), a stopword-based language-ID
  * heuristic, and document fingerprints. Pure Catalyst column expressions —
  * every ratio is an exact-integer quotient so the doubles are reproducible
  * in any engine.
  */
object TextAnalysis {

  /** Small English function-word list for the language heuristic (public
    * knowledge; any real pipeline would plug a per-language table here).
    */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that", "be")

  /** whitespace tokens of the normalized text */
  def tokens(text: Column): Column =
    filter(split(Dedup.normalizeText(text), " "), w => w =!= "")

  /** whitespace token count, as long */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** "BPE-ish" subtoken count: alpha runs, digit runs, and single other
    * non-space chars — the pre-merge word pieces of a byte-pair tokenizer.
    * The regex is shared verbatim with the DuckDB oracle (RE2 and Java agree
    * on this subset).
    */
  val SubtokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def subtokenCount(text: Column): Column =
    size(regexp_extract_all(Dedup.normalizeText(text), lit(SubtokenRegex), lit(0)))
      .cast("long")

  /** Default subword vocabulary for [[wordpieceCount]]: every lowercase
    * letter and digit as both a start piece and a `##` continuation piece
    * (so alphanumeric words never fall to `[UNK]` — only words carrying
    * out-of-vocabulary characters do), plus common English onsets and
    * suffix pieces so real words split into 1–3 multi-character pieces
    * rather than characters. A production pipeline would plug a learned
    * BPE/WordPiece vocabulary here; the ALGORITHM (greedy longest-match,
    * `##` continuations, whole-word `[UNK]`) is what the engine provides
    * and what the oracle re-derives.
    */
  val WordpieceVocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val starts = Seq(
      "ag", "ba", "bi", "co", "cu", "da", "du", "fa", "fi", "gr", "ha",
      "jo", "ke", "li", "me", "or", "pa", "qu", "ro", "sc", "sl", "sm",
      "so", "sp", "st", "ta", "th", "va", "ve", "wi",
      "the", "spa", "str", "val", "win", "tab", "cus", "dat")
    val conts = Seq(
      "##er", "##in", "##ing", "##ion", "##ble", "##ue", "##ow", "##an",
      "##all", "##ey", "##up", "##ge", "##it", "##ta", "##ark", "##art",
      "##ast", "##atch", "##dow", "##eam", "##ery", "##lter", "##lumn",
      "##oup", "##ort", "##ash", "##ine", "##tor", "##tomer", "##rge",
      "##oin", "##der", "##can", "##mall", "##low", "##ata", "##ream")
    singles ++ singles.map("##" + _) ++ starts ++ conts
  }

  /** Greedy longest-match subword token count of the normalized text —
    * the number production token budgets are denominated in (see
    * [[graft.plans.WordpieceExpression]]); NULL text → NULL (callers
    * coalesce to 0 like [[tokenCount]] consumers do).
    */
  def wordpieceCount(text: Column,
                     vocab: Seq[String] = WordpieceVocab): Column =
    graft.plans.WordpieceExpression.wordpieceCount(
      Dedup.normalizeText(text), vocab)

  /** The subword pieces themselves, space-joined — [[wordpieceCount]]'s
    * debuggable twin. */
  def wordpiecePieces(text: Column,
                      vocab: Seq[String] = WordpieceVocab): Column =
    graft.plans.WordpieceExpression.wordpiecePieces(
      Dedup.normalizeText(text), vocab)

  /** Default scored vocabulary for the unigram-LM Viterbi tokenizer
    * ([[graft.plans.UnigramExpression]]): integer scores in MILLIBITS
    * (quantized log₂-probabilities ×1000, negative — the log-free X75
    * posture: `ln` is not bit-stable across engines, pinned integers
    * are). Every lowercase letter and digit is a piece (so only words
    * with out-of-alphabet characters fall to `[UNK]`), common corpus
    * words are whole pieces, and several corpus words are DELIBERATELY
    * absent as whole pieces ("customer", "vector", "column", "window")
    * with competing sub-piece splits supplied instead, so the Viterbi
    * objective genuinely decides segmentations rather than rubber-
    * stamping whole words. A production pipeline would plug an
    * EM-learned SentencePiece vocabulary here; the ALGORITHM (exact
    * integer Viterbi, whole-word `[UNK]`) is what the engine provides
    * and what the oracle re-derives.
    */
  val UnigramVocab: Seq[(String, Long)] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -14000L)
    val words = Seq(
      "the" -> -6000L, "data" -> -7000L, "table" -> -7000L,
      "stream" -> -7200L, "value" -> -7100L, "query" -> -7300L,
      "filter" -> -7400L, "order" -> -7100L, "group" -> -7200L,
      "batch" -> -7400L, "merge" -> -7500L, "small" -> -7300L,
      "scan" -> -7000L, "sort" -> -7000L, "hash" -> -7000L,
      "join" -> -6900L, "key" -> -6800L, "row" -> -6700L,
      "line" -> -7000L, "slow" -> -7100L, "fast" -> -7000L,
      "spark" -> -7200L, "part" -> -6900L, "agg" -> -7100L,
      "big" -> -6800L)
    val pieces = Seq(
      "cus" -> -9600L, "tom" -> -9200L, "er" -> -7800L, "tomer" -> -9000L,
      "ve" -> -9400L, "ctor" -> -10400L, "vec" -> -9800L, "tor" -> -9000L,
      "co" -> -9200L, "lumn" -> -9800L, "col" -> -9600L, "umn" -> -10600L,
      "win" -> -8800L, "dow" -> -9200L, "wind" -> -10200L, "ow" -> -8800L,
      "tab" -> -9000L, "le" -> -8000L, "str" -> -9400L, "eam" -> -9400L,
      "ing" -> -8200L, "que" -> -9800L, "ry" -> -9000L, "or" -> -8600L,
      "der" -> -9000L, "an" -> -8400L, "in" -> -8000L, "ta" -> -8800L,
      "all" -> -8800L, "st" -> -8600L)
    singles ++ words ++ pieces
  }

  /** `[UNK]` score for [[unigramCount]]/[[unigramScore]] — far below any
    * real segmentation so an unreachable word is unambiguous in sums. */
  val UnigramUnkScore: Long = -100000L

  /** Viterbi (unigram-LM) subword token count of the normalized text —
    * the max-score segmentation's piece count under [[UnigramVocab]];
    * NULL text → NULL (callers coalesce like [[tokenCount]] consumers).
    */
  def unigramCount(text: Column,
                   vocab: Seq[(String, Long)] = UnigramVocab): Column =
    graft.plans.UnigramExpression.unigramCount(
      Dedup.normalizeText(text), vocab, UnigramUnkScore)

  /** The summed Viterbi segmentation score (millibits) — the model
    * log-likelihood the decode maximizes, exact in integers. */
  def unigramScore(text: Column,
                   vocab: Seq[(String, Long)] = UnigramVocab): Column =
    graft.plans.UnigramExpression.unigramScore(
      Dedup.normalizeText(text), vocab, UnigramUnkScore)

  /** The winning pieces, space-joined — [[unigramCount]]'s debuggable
    * twin (spec-land: piece strings are engine-internal artifacts). */
  def unigramPieces(text: Column,
                    vocab: Seq[(String, Long)] = UnigramVocab): Column =
    graft.plans.UnigramExpression.unigramPieces(
      Dedup.normalizeText(text), vocab, UnigramUnkScore)

  /** characters of punctuation / total characters of the normalized text.
    * Empty normalized text → NULL (nullif'd denominator), never NaN:
    * `0.0 / 0` is NaN in Spark, which a downstream `coalesce` can't catch
    * and which `floor(_).cast("long")` silently turns into 0 while ANSI
    * engines error — NULL propagates predictably through both.
    */
  def punctRatio(text: Column): Column = {
    val norm = Dedup.normalizeText(text)
    (length(norm) - length(regexp_replace(norm, "[\\p{Punct}]", ""))).cast("double") /
      nullif(length(norm), lit(0))
  }

  /** fraction of whitespace tokens that are stopwords; zero-token doc →
    * NULL (see [[punctRatio]] for the NaN rationale) */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val ts = tokens(text)
    size(filter(ts, t => array_contains(typedLit(stopwords), t))).cast("double") /
      nullif(size(ts), lit(0))
  }

  /** mean token length (exact-int quotient); zero-token doc → NULL */
  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    aggregate(transform(ts, t => length(t).cast("long")), lit(0L), (s, x) => s + x)
      .cast("double") / nullif(size(ts), lit(0))
  }

  /** n-gram language-ID heuristic: enough stopword mass → the candidate
    * language, else "unknown". One language here; production would argmax
    * over per-language stopword tables.
    */
  def langGuess(text: Column, lang: String = "en",
                stopwords: Seq[String] = EnglishStopwords,
                minRatio: Double = 0.02): Column =
    when(stopwordRatio(text, stopwords) >= minRatio, lit(lang))
      .otherwise(lit("unknown"))

  /** exact-dup fingerprint (md5 of normalized text) — see [[Dedup.fingerprint]] */
  def fingerprint(text: Column): Column = Dedup.fingerprint(text)

  /** Email address shape for [[scrubPii]]. Lowercase classes: apply to
    * lowercased/normalized text, or extend the classes before reuse. The
    * same pattern text runs in DuckDB oracles (RE2 and Java agree on it).
    */
  val EmailRegex = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** 7-plus digit runs — phone numbers, account ids — for [[scrubPii]]. */
  val LongDigitRunRegex = "[0-9]{7,}"

  /** PII redaction pass: emails → `<EMAIL>` FIRST, then long digit runs →
    * `<NUM>`. The order is a correctness constraint, not style — emails
    * contain digit runs, so the reversed order would corrupt addresses
    * before the email pattern sees them. Idempotent (the replacement
    * tokens match neither pattern); per-row scalar, codegen-friendly, no
    * shuffle. CorpusOpsSpec pins ordering + idempotence.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRegex, "<EMAIL>"),
      LongDigitRunRegex, "<NUM>")

  // ---- intra-document repetition signals (Gopher-style quality rules) -----
  // Repetitious documents (boilerplate, keyword stuffing, templated spam)
  // are a top removal class in web-scale curation. These are per-row array
  // expressions — no shuffle, codegen-friendly — and every ratio is an
  // exact-integer quotient, so the doubles reproduce bit-identically in the
  // DuckDB oracle. Pass a pre-projected token array ([[tokens]] in a prior
  // select): referencing the tokenizer inside these lambdas would re-run it
  // per array element.

  /** null-safe exact-int quotient: null on an empty denominator instead of
    * ANSI's division-by-zero error — one empty document must not kill a
    * 100 TB job */
  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den)

  /** fraction of tokens that repeat an earlier token: 1 − |distinct|/|all| */
  def dupTokenRatio(ts: Column): Column =
    ratio(size(ts) - size(array_distinct(ts)), size(ts))

  /** word `n`-gram array of a token array (empty when the doc is shorter) */
  def ngrams(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - lit(n)),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))
      .otherwise(array())

  /** fraction of `n`-grams that are repeats of an earlier `n`-gram */
  def dupNgramRatio(ts: Column, n: Int): Column = {
    val gs = ngrams(ts, n)
    ratio(size(gs) - size(array_distinct(gs)), size(gs))
  }

  /** occurrences of the most frequent token / total tokens. O(d·t) per row
    * (d distinct, t total) — documents are bounded; this is a per-row
    * scalar, not a corpus aggregate. */
  def topTokenRatio(ts: Column): Column =
    ratio(array_max(transform(array_distinct(ts),
      t => size(filter(ts, x => x === t)).cast("long"))), size(ts))

  // ---- composite quality verdict (C4/Gopher-style rule chain) -------------

  /** Ordered (rule_name, passes) list — the composite filter a web-scale
    * curation pipeline applies after dedup (C4's length/structure rules,
    * Gopher's repetition rules). Rule ORDER is part of the contract: the
    * verdict reports the FIRST failing rule. The leading `null_text` and
    * token-count rules also shield the ratio rules from three-valued-logic
    * surprises — a NULL ratio comparison is "unknown", which a CASE chain
    * skips, so every degenerate document must be caught by an earlier
    * total rule (NULL text and empty token lists are).
    *
    * Thresholds are pinned to this corpus so several rules actually fire
    * (see CurationOps q86 — a threshold no document crosses is dead code
    * to the oracle); a production pipeline would tune them per source.
    */
  def qualityRules(text: Column): Seq[(String, Column)] = {
    val ts = tokens(text)
    val n = size(ts)
    Seq(
      "null_text"         -> text.isNotNull,
      "too_few_tokens"    -> (n >= 20),
      "too_many_tokens"   -> (n <= 5000),
      "short_mean_token"  -> (avgTokenLen(text) >= 3.8),
      "low_stopword_mass" -> (stopwordRatio(text) >= 0.01),
      "dup_token_mass"    -> (dupTokenRatio(ts) <= 0.65),
      "top_token_mass"    -> (topTokenRatio(ts) <= 0.25))
  }

  /** first failing rule name, null when the document passes all rules.
    * `coalesce(when(!pass, name)…)` — exactly a SQL CASE chain, including
    * the skip-on-unknown behavior for NULL conditions. */
  def qualityFirstFail(text: Column): Column =
    coalesce(qualityRules(text).map { case (name, pass) =>
      when(!pass, lit(name)) } :+ lit(null).cast("string"): _*)

  /** Rolling-hash document sketch: the minimum hash over word `n`-gram
    * windows (winnowing with w = ∞). `portable = true` uses FNV-1a 64
    * ([[graft.plans.Fnv1a64Expression]]) so the sketch is reproducible in
    * DuckDB SQL and oracle-checkable; the default stays xxhash64.
    *
    * NOTE: `text` is tokenized inside the window lambda — prefer
    * [[rollingMinHashTokens]] over a pre-projected token-array column when
    * calling per-row at scale (expressions referenced inside higher-order
    * lambdas re-evaluate per array element, so inlining the tokenizer here
    * costs O(tokens) normalizations per row).
    */
  def rollingMinHash(text: Column, n: Int, portable: Boolean = false): Column =
    rollingMinHashTokens(tokens(text), n, portable)

  /** [[rollingMinHash]] over an existing token-array column. */
  def rollingMinHashTokens(ts: Column, n: Int,
                           portable: Boolean = false): Column = {
    def h(c: Column): Column =
      if (portable) graft.plans.Fnv1a64Expression.fnv1a64(c) else xxhash64(c)
    val shingles = when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - lit(n)),
        i => h(concat_ws(" ", slice(ts, i + lit(1), lit(n))))))
      .otherwise(array(h(concat_ws(" ", ts))))
    array_min(shingles)
  }
}
