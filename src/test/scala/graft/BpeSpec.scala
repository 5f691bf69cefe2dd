package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Bpe, Caches}

/** BPE merge learning: hand-computed fits, fixpoint merge application,
  * tie-breaks, and the length bounds. See `Bpe` scaladoc for the
  * replace-to-fixpoint ≡ greedy-list-merge argument these pin.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("learned merges match a hand computation, in rank order") {
    // freq: abab wc2, aaaa wc1, ab wc3
    val d = docs("abab abab", "aaaa", "ab ab ab")
    val freq = Bpe.wordFreq(d, "text")
    val merges = Bpe.learnMerges(freq, 3)
    // iter1: (a,b) 2*2+3 = 7 beats (a,a) 3, (b,a) 2
    // iter2: abab -> [ab,ab]; (a,a) 3 beats (ab,ab) 2
    // iter3: (ab,ab) 2 beats (aa,aa) 1
    assert(merges === Seq(("a", "b", 7L), ("a", "a", 3L), ("ab", "ab", 2L)))
  }

  test("merge application is greedy left-to-right on self-pair runs") {
    // the canonical-BPE trap: a space-separated encoding mis-aligns on
    // runs (8 a's → aa a aa a aa); the wrapped-token representation must
    // produce the greedy [aa aa aa aa] in ONE replace pass
    val d = docs("aaaaaaaa")
    val sym = d.select(
      Bpe.applyMerges(lit("aaaaaaaa"), Seq(("a", "a"))).as("s"))
      .head().getString(0)
    assert(sym === "(aa)(aa)(aa)(aa)")
    // and an odd run keeps its greedy tail: 5 a's → aa aa a
    val sym5 = d.select(
      Bpe.applyMerges(lit("aaaaa"), Seq(("a", "a"))).as("s"))
      .head().getString(0)
    assert(sym5 === "(aa)(aa)(a)")
  }

  test("argmax ties break lexicographically on (left, right)") {
    val d = docs("cd cd", "ab ab")
    val merges = Bpe.learnMerges(Bpe.wordFreq(d, "text"), 1)
    assert(merges === Seq(("a", "b", 2L)))
  }

  test("off-charset and out-of-length words never enter training") {
    // "a.b" (punctuation) and a 17-char word are excluded; only "ab" trains
    val d = docs("a.b a.b a.b ab ab", "abcdefghijklmnopq")
    val freq = Bpe.wordFreq(d, "text")
    assert(freq.select("word").as[String].collect().toSeq === Seq("ab"))
    val merges = Bpe.learnMerges(freq, 2)
    assert(merges === Seq(("a", "b", 2L))) // round 2 finds no pair left
  }

  test("bpeMerges emits the ranked merge table") {
    val out = Bpe.bpeMerges(docs("abab abab", "aaaa", "ab ab ab"), "text", 3)
      .orderBy("rank").collect()
    Caches.releaseAll()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq ===
      Seq((1L, "a", "b", "ab", 7L), (2L, "a", "a", "aa", 3L),
        (3L, "ab", "ab", "abab", 2L)))
  }

  test("tokenCounts applies merges per distinct word; out-of-bound words count 1") {
    val d = docs(
      "abab abab", // [abab][abab] under the 3 merges -> 2
      "aaaa", // [aa aa] -> 2
      "ab ab ab", // 3
      "x abcdefghijklmnopq") // 1-char + 17-char: both out of bound -> 1 each
    val freq = Caches.pin(Bpe.wordFreq(d, "text"))
    val merges = Bpe.learnMerges(freq, 3).map(m => (m._1, m._2))
    val out = Bpe.tokenCounts(d, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    Caches.releaseAll()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 3L, 3L), (3L, 2L, 2L)))
  }

  test("roundTrip: greedy longest-match over the exported vocab can disagree with merge-order BPE") {
    // fit learns (b,c) then (bc,d) then (a,b): round1 ties (b,c)/(c,d)
    // at 5 and breaks lexically; round2 (bc,d) 5; round3 (a,b) 3.
    // "abcd" then splits [a, bcd] (2) under merge order but greedy
    // longest-match eats the "ab" piece first: [ab, ##c, ##d] (3) —
    // the classic BPE-vs-WordPiece inference gap, pinned here
    val d = docs("bcd bcd bcd bcd ab ab ab abcd")
    val freq = Caches.pin(Bpe.wordFreq(d, "text"))
    val merges = Bpe.learnMerges(freq, 3).map(m => (m._1, m._2))
    assert(merges === Seq(("b", "c"), ("bc", "d"), ("a", "b")))
    val out = Bpe.roundTrip(d, "doc_id", "text", merges).collect()
    Caches.releaseAll()
    // bpe: 4·[bcd] + 3·[ab] + [a,bcd] = 9; wp: 4 + 3 + 3 = 10
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq((0L, 9L, 10L, 1L)))
  }

  test("roundTrip: out-of-bound words count 1 under both rules and never disagree") {
    val d = docs("ab ab x abcdefghijklmnopq")
    val freq = Caches.pin(Bpe.wordFreq(d, "text"))
    val merges = Bpe.learnMerges(freq, 2).map(m => (m._1, m._2))
    val out = Bpe.roundTrip(d, "doc_id", "text", merges).collect()
    Caches.releaseAll()
    // [ab][ab] = 1+1 both rules; "x" and the 17-char word 1 each
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq((0L, 4L, 4L, 0L)))
  }

  test("batched learner is bit-identical to the sequential reference") {
    // adversarial shapes: self-pair runs (created pairs can tie their
    // creator), tie-heavy two-letter corpora (boundary strictness), and a
    // symbol-collision corpus where a merged string equals an existing
    // symbol ("ab" both as a merge product and a standalone word)
    val corpora = Seq(
      Seq("abab abab", "aaaa", "ab ab ab"),
      Seq("aaaaaaaa aaaa", "bbbb", "abab baba"),
      Seq("ab ab", "cd cd", "ef ef", "gh gh"), // all count 2: max tie field
      Seq("abc abc ab ab c c bc", "ababc"),
      Seq("zz zz zz", "zzz zzz", "zzzz"))
    corpora.foreach { texts =>
      val d = docs(texts: _*)
      val freq = Caches.pin(Bpe.wordFreq(d, "text"))
      val seqM = Bpe.learnMergesSequential(freq, 6)
      val batM = Bpe.learnMerges(freq, 6)
      Caches.releaseAll()
      assert(batM === seqM, s"corpus: $texts")
    }
  }

  test("batched == sequential on 30 seeded random two-letter corpora") {
    // two-letter alphabet maximizes pair collisions, ties, self-pairs,
    // and merged-string/symbol collisions — the regimes where an unsafe
    // batch would diverge; seeded, so failures reproduce
    val rnd = new scala.util.Random(20260814L)
    (1 to 30).foreach { trial =>
      val words = Seq.fill(2 + rnd.nextInt(12)) {
        val len = 2 + rnd.nextInt(7)
        (1 to len).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      }
      val d = docs(words.grouped(4).map(_.mkString(" ")).toSeq: _*)
      val freq = Caches.pin(Bpe.wordFreq(d, "text"))
      val k = 1 + rnd.nextInt(7)
      val seqM = Bpe.learnMergesSequential(freq, k)
      val batM = Bpe.learnMerges(freq, k)
      Caches.releaseAll()
      assert(batM === seqM, s"trial $trial k=$k words=$words")
    }
  }

  test("vocabCoverage: UNK verdicts, length cap, and the rollup, hand-computed") {
    // one merge (a,b): pieces = 36 chars + "ab" (start and ## forms).
    // s1 exercises the three UNK shapes: off-charset at pos 0 after a
    // 1-char match ("a-b": a matches, '-' stalls), off-charset mid-word
    // after a MERGED match ("ab-x": greedy eats "ab" then stalls — the
    // discard-partial-matches rule), and off-charset interior ("xy#z").
    // s2 exercises the boundary: a 32-char word IS counted (32 single
    // chars), a 33-char word is excluded from the metric entirely.
    val d = Seq(
      ("s1", "ab ab ab a-b xy#z ab-x"),
      ("s2", "abc " + "a" * 33 + " cd " + "a" * 32))
      .toDF("source", "text")
    val merges = Seq(("a", "b"))
    val out = Bpe.vocabCoverage(d, "source", col("text"), merges)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      // s1: 6 words, 3 UNK (all distinct forms), wp = 3·[ab] + 3·1 = 6
      ("s1", 6L, 3L, 6L, 3L, 500L),
      // s2: abc = [ab,##c] 2, a*32 = 32, cd = [c,##d] 2
      ("s2", 3L, 0L, 36L, 0L, 0L)))
  }

  test("vocabDrift: planted drift fires the refit flag in both directions, " +
      "an in-distribution batch stays quiet, empty slices stay NULL") {
    // pieces = 36 chars + "ab". Base words tokenize tightly (ab = 1
    // piece); the g1 batch is off-charset-heavy (UNK drift) AND
    // merge-mismatched (cd never merged: fertility drift); the g2 batch
    // repeats the base distribution (no drift, flag 0); g3 has only
    // batch words (base permilles NULL, drifts NULL, flag 0).
    val d = Seq(
      ("g1", false, "ab ab ab ab ab ab ab ab ab ab"),
      ("g1", true, "x-y p#q cd cd cd cd cd cd cd cd"),
      ("g2", false, "ab ab ab ab"),
      ("g2", true, "ab ab ab ab"),
      ("g3", true, "ab ab"))
      .toDF("grp", "b", "text")
    val out = Bpe.vocabDrift(d, "grp", col("b"), col("text"),
        Seq(("a", "b")))
      .orderBy("grp").collect()
    val g1 = out(0)
    // base: 10 words, 0 UNK, 10 pieces -> fertility 1000; batch: 10
    // words, 2 UNK, wp = 2·1 + 8·2 = 18 -> 1800; unk 0 -> 200
    assert((g1.getLong(1), g1.getLong(2)) === ((10L, 10L)))
    assert((g1.getLong(3), g1.getLong(4)) === ((0L, 200L)))
    assert((g1.getLong(5), g1.getLong(6)) === ((1000L, 1800L)))
    assert((g1.getLong(7), g1.getLong(8)) === ((200L, 800L)))
    assert(g1.getLong(9) === 1L)
    val g2 = out(1)
    assert((g2.getLong(7), g2.getLong(8)) === ((0L, 0L)))
    assert(g2.getLong(9) === 0L)
    val g3 = out(2)
    assert(g3.getLong(1) === 0L) // no base words
    assert(g3.isNullAt(3) && g3.isNullAt(5)) // base permilles NULL
    assert(g3.isNullAt(7) && g3.isNullAt(8)) // drifts NULL
    assert(g3.getLong(9) === 0L) // a NULL drift never fires the flag
  }

  test("pieceUsage scores greedy piece consumption; a merge swallowed by " +
      "a longer merge strands at zero") {
    // 20×"abc" + 1×"abd": learns (a,b) then (ab,c). Greedy tokenizes
    // "abc" as the single piece "abc" — the intermediate "ab" is consumed
    // ONLY by the rare "abd" ("ab" + "##d").
    val docs = (Seq.fill(20)("abc") :+ "abd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val freq = Bpe.wordFreq(docs, "text")
    val merges = Bpe.learnMerges(freq, 2).map(m => (m._1, m._2))
    assert(merges === Seq(("a", "b"), ("ab", "c")))
    val usage = Bpe.pieceUsage(freq, merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(usage === Map("abc" -> 20L, "ab" -> 1L, "d" -> 1L))
    // "ab" never appears: greedy on "abc" skips straight to the longer
    // piece, so the symbol's only usage is the rare word's
  }

  test("vocabPrune drops under-used merges, keeps coverage honest on " +
      "both variants, hand-computed") {
    val docs = ((1 to 20).map(i => (i.toLong, "a", "abc")) :+
      ((21L, "b", "abd"))).toDF("doc_id", "source", "text")
    // threshold 100‰ of 21 occurrences = 2.1: usage(ab) = 1 < 2.1 pruned,
    // usage(abc) = 20 kept
    val out = Bpe.vocabPrune(docs, "source", col("text"), "text",
      k = 2, minUsagePermille = 100)
      .orderBy("variant", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    assert(out.toSeq === Seq(
      // full vocab: chars + {ab, abc} (38 pieces, 2 merges)
      ("full", "a", 20L, 0L, 20L, 0L, 0L, 38L, 2L),
      ("full", "b", 1L, 0L, 2L, 0L, 0L, 38L, 2L),   // abd = [ab,##d]
      // pruned: "ab" gone (37 pieces, 1 merge); "abc" still 1 token,
      // "abd" degrades to [a,##b,##d] = 3 — the pruning cost, measured
      ("pruned", "a", 20L, 0L, 20L, 0L, 0L, 37L, 1L),
      ("pruned", "b", 1L, 0L, 3L, 0L, 0L, 37L, 1L)))
  }
}
