package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation as a native
  * Catalyst expression — the third member of the subword triad beside BPE
  * learning ([[graft.ext.Bpe]]) and WordPiece greedy inference
  * ([[WordpieceExpression]]).
  *
  * The model: each vocabulary piece carries an INTEGER score (a quantized
  * log-probability — millibits in the shipped vocabulary, but any integer
  * works), and a word's segmentation is the piece sequence maximizing the
  * score sum — the exact Viterbi decode of a unigram language model over
  * pieces (Kudo 2018, the SentencePiece inference rule), as opposed to
  * WordPiece's greedy longest-match, which commits left-to-right and can
  * be globally suboptimal. Scores are integers by design (the log-free
  * X75 posture): `ln` is not bit-stable across engines while integer
  * addition and comparison are, so the WHOLE decode — scores, the DP, the
  * argmax — replays exactly in any engine and the result hash-checks.
  *
  * Algorithm (per space-separated word of the pre-normalized input):
  * `best[0] = (0 score, 0 pieces)`; for each end position i,
  * `best[i] = max over piece p ending at i of best[i-|p|] + score(p)`,
  * ordered by (score DESC, piece count ASC) — both components of the DP
  * state, so the winning (score, count) pair is unique without further
  * tie-breaking. If `best[len]` is unreachable (some character has no
  * covering piece) the WHOLE word becomes one `[UNK]` with `unkScore` —
  * the WordPiece rule, kept so the two tokenizers differ only in their
  * objective. For the pieces string (spec-land, not oracle-shaped) a
  * remaining tie on (score, count) resolves to the LONGEST last piece —
  * deterministic output for testing.
  *
  * Scale shape: a pure scalar — the 100 TB plan is a map-only projection
  * with zero exchanges; the vocabulary compiles into one shared reference
  * object per executor (the [[WordpieceExpression]] posture). Cost is
  * O(len · maxPieceLen) per word with zero allocation beyond two
  * per-word DP arrays.
  */
object UnigramOps {

  /** Precompiled scored vocabulary. Lookup structures are transient and
    * rebuilt lazily after serialization to executors. */
  final class Vocab(val entries: Seq[(String, Long)], val unkScore: Long)
      extends Serializable {
    // Published through ONE volatile reference to an immutable holder (the
    // [[WordpieceOps.Vocab]] posture): one Vocab per executor is shared by
    // many task threads, and a plain two-field double-checked publish could
    // expose `map != null` with `maxLen` still -1 on a weak-memory machine
    // — decode() would then probe zero piece lengths and silently emit
    // all-[UNK] counts with no error.
    private final class Compiled(
        val map: java.util.HashMap[String, java.lang.Long], val maxLen: Int)
    @transient @volatile private var compiled: Compiled = _

    private def ensure(): Compiled = {
      var c = compiled
      if (c == null) synchronized {
        c = compiled
        if (c == null) {
          val m = new java.util.HashMap[String, java.lang.Long]()
          var ml = 0
          entries.foreach { case (p, s) =>
            if (p.nonEmpty) { m.put(p, s); ml = math.max(ml, p.length) }
          }
          c = new Compiled(m, ml)
          compiled = c
        }
      }
      c
    }
    def scores: java.util.HashMap[String, java.lang.Long] = ensure().map
    def maxLen: Int = ensure().maxLen

    override def equals(o: Any): Boolean = o match {
      case v: Vocab => v.entries == entries && v.unkScore == unkScore
      case _ => false
    }
    override def hashCode(): Int = (entries, unkScore).hashCode()
  }

  /** Viterbi-decode one word: fills `bestScore`/`bestN`/`bestL` (caller
    * provides arrays of length ≥ w.length+1; `bestL` may be null when the
    * piece backtrace is not needed). Returns true when position
    * `w.length` is reachable. `bestL(i)` is the winning last-piece length
    * at i (longest among (score, n)-ties — the documented pieces-string
    * tie-break; candidates probe l descending so the first strict win
    * sticks). */
  private def decode(v: Vocab, w: String, bestScore: Array[Long],
                     bestN: Array[Int], bestL: Array[Int]): Boolean = {
    val n = w.length
    val m = v.scores
    val maxL = v.maxLen
    bestN(0) = 0
    bestScore(0) = 0L
    var i = 1
    while (i <= n) {
      bestN(i) = -1 // unreachable
      var l = math.min(maxL, i)
      while (l >= 1) {
        if (bestN(i - l) >= 0) {
          val s = m.get(w.substring(i - l, i))
          if (s != null) {
            val cs = bestScore(i - l) + s.longValue()
            val cn = bestN(i - l) + 1
            // (score DESC, pieces ASC); probe order l = long→short makes
            // the longest last piece win remaining exact ties
            if (bestN(i) < 0 || cs > bestScore(i) ||
                (cs == bestScore(i) && cn < bestN(i))) {
              bestScore(i) = cs
              bestN(i) = cn
              if (bestL != null) bestL(i) = l
            }
          }
        }
        l -= 1
      }
      i += 1
    }
    bestN(n) >= 0
  }

  /** (Σ tokens, Σ score) over the words of `text`, packed by the caller's
    * chosen emit. Called from generated code — plain static shape. */
  def fold(v: Vocab, text: UTF8String, emitScore: Boolean): Long = {
    val s = text.toString
    var tokens = 0L
    var score = 0L
    var i = 0
    val n = s.length
    var bs: Array[Long] = null
    var bn: Array[Int] = null
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        val w = s.substring(i, j)
        if (bs == null || bs.length < w.length + 1) {
          bs = new Array[Long](math.max(w.length + 1, 64))
          bn = new Array[Int](bs.length)
        }
        if (decode(v, w, bs, bn, null)) {
          tokens += bn(w.length)
          score += bs(w.length)
        } else {
          tokens += 1L
          score += v.unkScore
        }
        i = j
      }
    }
    if (emitScore) score else tokens
  }

  /** The winning pieces, space-joined (`[UNK]` for unreachable words) —
    * the debuggable twin of [[fold]]; spec-pinned, not oracle-shaped. */
  def piecesString(v: Vocab, text: UTF8String): UTF8String = {
    val s = text.toString
    val out = new java.util.ArrayList[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        val w = s.substring(i, j)
        val bs = new Array[Long](w.length + 1)
        val bn = new Array[Int](w.length + 1)
        val bl = new Array[Int](w.length + 1)
        if (decode(v, w, bs, bn, bl)) {
          val stack = new java.util.ArrayList[String]()
          var p = w.length
          while (p > 0) { stack.add(w.substring(p - bl(p), p)); p -= bl(p) }
          var k = stack.size() - 1
          while (k >= 0) { out.add(stack.get(k)); k -= 1 }
        } else out.add("[UNK]")
        i = j
      }
    }
    UTF8String.fromString(String.join(" ", out))
  }
}

/** `graft_unigram(text)` — Viterbi subword token count (LongType,
  * mode="count"), summed segmentation score (LongType, mode="score"), or
  * the winning pieces string (StringType, mode="pieces") under the scored
  * vocabulary. The vocabulary is a constructor constant compiled into one
  * shared reference object (the [[WordpieceExpression]] posture).
  */
case class UnigramExpression(child: Expression,
                             vocab: Seq[(String, Long)],
                             unkScore: Long,
                             mode: String) extends UnaryExpression {
  require(Set("count", "score", "pieces").contains(mode),
    s"mode must be count|score|pieces, got $mode")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType =
    if (mode == "pieces") StringType else LongType
  override def prettyName: String = "graft_unigram"

  @transient private lazy val vb = new UnigramOps.Vocab(vocab, unkScore)

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    mode match {
      case "pieces" => UnigramOps.piecesString(vb, t)
      case m => UnigramOps.fold(vb, t, emitScore = m == "score")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("ugVocab", vb,
      classOf[UnigramOps.Vocab].getName)
    nullSafeCodeGen(ctx, ev, c => mode match {
      case "pieces" =>
        s"${ev.value} = graft.plans.UnigramOps.piecesString($vref, $c);"
      case "score" =>
        s"${ev.value} = graft.plans.UnigramOps.fold($vref, $c, true);"
      case _ =>
        s"${ev.value} = graft.plans.UnigramOps.fold($vref, $c, false);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramExpression {
  /** Column API: Viterbi token count of `text`. */
  def unigramCount(text: Column, vocab: Seq[(String, Long)],
                   unkScore: Long): Column =
    ColumnBridge.column(UnigramExpression(
      ColumnBridge.expression(text), vocab, unkScore, "count"))

  /** Column API: summed Viterbi segmentation score of `text`. */
  def unigramScore(text: Column, vocab: Seq[(String, Long)],
                   unkScore: Long): Column =
    ColumnBridge.column(UnigramExpression(
      ColumnBridge.expression(text), vocab, unkScore, "score"))

  /** Column API: the winning pieces, space-joined. */
  def unigramPieces(text: Column, vocab: Seq[(String, Long)],
                    unkScore: Long): Column =
    ColumnBridge.column(UnigramExpression(
      ColumnBridge.expression(text), vocab, unkScore, "pieces"))
}
