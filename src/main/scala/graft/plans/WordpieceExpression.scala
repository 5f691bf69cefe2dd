package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword (WordPiece-style) tokenization as a native
  * Catalyst expression.
  *
  * Why it exists: every token-budget operator in the catalog (shard packing,
  * curation capstone, temperature mixture, weighted heavy hitters) counts
  * WHITESPACE tokens, but production training-data pipelines budget in
  * subword tokens — the ratio differs 1.3–2× by language and systematically
  * by content type, so mixtures and shard sizes computed on whitespace
  * counts are simply the wrong number. This expression computes the
  * standard greedy longest-match algorithm (the WordPiece inference rule —
  * public knowledge from the BERT literature) over a caller-supplied
  * vocabulary, entirely per-row: no UDF, no explode, no exchange, stays in
  * WholeStageCodegen via a static helper call.
  *
  * Algorithm (per whitespace-separated word of the input, which callers
  * pre-normalize): at each position take the LONGEST vocabulary piece that
  * matches; pieces after the first carry the `##` continuation prefix; if
  * no piece matches at some position the WHOLE word becomes one `[UNK]`
  * token (the standard rule — partial matches are discarded). Greedy is
  * deliberately not globally optimal ("tab ##l ##e" can beat "ta ##ble"):
  * that is exactly how WordPiece inference behaves, and determinism is the
  * property the pipeline needs.
  *
  * Scale shape: a pure scalar — the 100 TB plan is a map-only projection
  * with zero exchanges; the vocabulary rides along as one broadcast-sized
  * reference object per executor, never per row.
  */
object WordpieceOps {

  /** Precompiled vocabulary: start pieces and continuation pieces (stored
    * WITHOUT the `##` prefix) in hash sets, plus max piece lengths so the
    * longest-match probe loop is bounded by the vocabulary, not the word.
    * Lookup structures are transient and rebuilt lazily after
    * serialization to executors.
    */
  final class Vocab(val pieces: Seq[String]) extends Serializable {
    // One shared Vocab per executor serves many task threads. The compiled
    // lookup state is published through a SINGLE volatile reference to an
    // immutable holder — the fields are fully written before the volatile
    // store, so a reader that sees the holder sees every field (a plain
    // multi-field double-checked publish can expose startSet != null with
    // maxStartLen still -1 on a weak-memory machine, silently truncating
    // every longest-match probe to zero).
    private final class Compiled(val startSet: java.util.HashSet[String],
                                 val contSet: java.util.HashSet[String],
                                 val maxStartLen: Int, val maxContLen: Int)
    @transient @volatile private var compiled: Compiled = _

    private def ensure(): Compiled = {
      var c = compiled
      if (c == null) synchronized {
        c = compiled
        if (c == null) {
          val s = new java.util.HashSet[String]()
          val ct = new java.util.HashSet[String]()
          var ms = 0
          var mc = 0
          pieces.foreach { p =>
            if (p.startsWith("##")) {
              val suf = p.substring(2)
              if (suf.nonEmpty) { ct.add(suf); mc = math.max(mc, suf.length) }
            } else if (p.nonEmpty) { s.add(p); ms = math.max(ms, p.length) }
          }
          c = new Compiled(s, ct, ms, mc)
          compiled = c
        }
      }
      c
    }

    def starts: java.util.HashSet[String] = ensure().startSet
    def conts: java.util.HashSet[String] = ensure().contSet
    def maxStart: Int = ensure().maxStartLen
    def maxCont: Int = ensure().maxContLen

    override def equals(o: Any): Boolean = o match {
      case v: Vocab => v.pieces == pieces
      case _ => false
    }
    override def hashCode(): Int = pieces.hashCode()
  }

  /** Longest piece length matching `w` at `pos` (continuation set when
    * `cont`), or -1 if none. */
  private def longestMatch(v: Vocab, w: String, pos: Int,
                           cont: Boolean): Int = {
    val set = if (cont) v.conts else v.starts
    var l = math.min(if (cont) v.maxCont else v.maxStart, w.length - pos)
    while (l >= 1) {
      if (set.contains(w.substring(pos, pos + l))) return l
      l -= 1
    }
    -1
  }

  /** Subword tokens of one word; -1 signals [UNK] (counts as 1 token). */
  private def wordTokens(v: Vocab, w: String,
                         out: java.util.ArrayList[String]): Int = {
    var pos = 0
    var n = 0
    val mark = if (out != null) out.size() else 0
    while (pos < w.length) {
      val l = longestMatch(v, w, pos, cont = pos > 0)
      if (l < 0) {
        if (out != null) {
          while (out.size() > mark) out.remove(out.size() - 1)
          out.add("[UNK]")
        }
        return 1
      }
      if (out != null) out.add(if (pos > 0) "##" + w.substring(pos, pos + l)
                               else w.substring(pos, pos + l))
      pos += l
      n += 1
    }
    n
  }

  /** Total subword-token count of a (pre-normalized) text: Σ per-word
    * greedy-match tokens over its space-separated words. Called from
    * generated code — must stay a plain static-shaped method. */
  def countTokens(v: Vocab, text: UTF8String): Long = {
    val s = text.toString
    var count = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        count += wordTokens(v, s.substring(i, j), null)
        i = j
      }
    }
    count
  }

  /** The pieces themselves, space-joined (`##` prefixes kept) — the
    * debuggable twin of [[countTokens]]; spec-pinned, not oracle-shaped
    * (piece strings are engine-internal vocabulary artifacts). */
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
        wordTokens(v, s.substring(i, j), out)
        i = j
      }
    }
    UTF8String.fromString(String.join(" ", out))
  }
}

/** `graft_wordpiece(text)` — subword token count (LongType) or the pieces
  * string (StringType, `emitPieces = true`) under greedy longest-match over
  * `vocab`. The vocabulary is a constructor constant (like the sketch
  * aggregates' `k`), not a per-row child: it compiles into one shared
  * reference object, and two expressions are equal iff their vocabularies
  * are.
  */
case class WordpieceExpression(child: Expression, vocab: Seq[String],
                               emitPieces: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = if (emitPieces) StringType else LongType
  override def prettyName: String = "graft_wordpiece"

  @transient private lazy val vb = new WordpieceOps.Vocab(vocab)

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (emitPieces) WordpieceOps.piecesString(vb, t)
    else WordpieceOps.countTokens(vb, t)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("wpVocab", vb,
      classOf[WordpieceOps.Vocab].getName)
    val call = if (emitPieces) "piecesString" else "countTokens"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordpieceOps.$call($vref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordpieceExpression {
  /** Column API: subword token count of `text` under `vocab`. */
  def wordpieceCount(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      WordpieceExpression(ColumnBridge.expression(text), vocab))

  /** Column API: space-joined pieces of `text` under `vocab`. */
  def wordpiecePieces(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      WordpieceExpression(ColumnBridge.expression(text), vocab,
        emitPieces = true))
}
