package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Multimodal, TextAnalysis}

class TextMultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox, it jumps over the lazy dog!"),
    (2L, "rij tuin fiets gracht kaas molen klomp dijk")
  ).toDF("doc_id", "text")

  test("token and subtoken counts") {
    val m = docs.select($"doc_id", TextAnalysis.tokenCount($"text"),
      TextAnalysis.subtokenCount($"text")).as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) === ((10L, 12L))) // 10 words; comma and bang are subtokens
    assert(m(2L) === ((8L, 8L)))
  }

  test("wordpiece: greedy longest-match pieces and counts, hand-computed") {
    val cases = Seq(
      (1L, "the"),          // whole-word start piece
      (2L, "table"),        // GREEDY takes 'tab' though 'ta ##ble' is shorter
      (3L, "value"),        // val + ##ue
      (4L, "customer"),     // cus + ##tomer
      (5L, "query"),        // qu + ##ery
      (6L, "x9z"),          // single-char fallback pieces
      (7L, "ab%"),          // '%' has no piece -> whole word [UNK]
      (8L, ""),             // empty text -> 0 tokens
      (9L, "the value")     // multi-word sum
    ).toDF("id", "text")
    val got = cases.select($"id",
        TextAnalysis.wordpieceCount($"text").as("n"),
        TextAnalysis.wordpiecePieces($"text").as("p"))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === ((1L, "the")))
    assert(got(2L) === ((3L, "tab ##l ##e")))
    assert(got(3L) === ((2L, "val ##ue")))
    assert(got(4L) === ((2L, "cus ##tomer")))
    assert(got(5L) === ((2L, "qu ##ery")))
    assert(got(6L) === ((3L, "x ##9 ##z")))
    assert(got(7L) === ((1L, "[UNK]")))
    assert(got(8L) === ((0L, "")))
    assert(got(9L) === ((3L, "the val ##ue")))
  }

  test("wordpiece: NULL text is NULL; count equals piece-string length") {
    val n = Seq((1L, Option.empty[String]), (2L, Some("Spark  Window")))
      .toDF("id", "text")
      .select($"id", TextAnalysis.wordpieceCount($"text").as("n"),
        TextAnalysis.wordpiecePieces($"text").as("p"))
      .as[(Long, Option[Long], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(n(1L) === ((None, None)))
    // normalization lowers + collapses whitespace before matching
    val (cnt, pieces) = (n(2L)._1.get, n(2L)._2.get)
    assert(cnt === pieces.split(" ").length.toLong)
    assert(pieces === "spa ##r ##k win ##dow")
  }

  test("unigram Viterbi: hand-computed max-score decodes under the " +
      "default vocabulary") {
    val cases = Seq(
      (1L, "table"),    // whole piece beats tab+le (-7000 vs -17000)
      (2L, "customer"), // cus+tomer (-18600) beats cus+tom+er (-26600)
      (3L, "window"),   // win+dow (-18000) beats wind+ow (-19000)
      (4L, "vector"),   // vec+tor (-18800) beats ve+ctor (-19800)
      (5L, "column"),   // co+lumn (-19000) beats col+umn (-20200)
      (6L, "x9%"),      // '%' unreachable -> whole word [UNK]
      (7L, ""),         // empty text -> 0 tokens, 0 score
      (8L, "table x9% window") // multi-word sum with an UNK in the middle
    ).toDF("id", "text")
    val got = cases.select($"id",
        TextAnalysis.unigramCount($"text").as("n"),
        TextAnalysis.unigramScore($"text").as("s"),
        TextAnalysis.unigramPieces($"text").as("p"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((1L, -7000L, "table")))
    assert(got(2L) === ((2L, -18600L, "cus tomer")))
    assert(got(3L) === ((2L, -18000L, "win dow")))
    assert(got(4L) === ((2L, -18800L, "vec tor")))
    assert(got(5L) === ((2L, -19000L, "co lumn")))
    assert(got(6L) === ((1L, TextAnalysis.UnigramUnkScore, "[UNK]")))
    assert(got(7L) === ((0L, 0L, "")))
    assert(got(8L) === ((4L, -7000L + TextAnalysis.UnigramUnkScore - 18000L,
      "table [UNK] win dow")))
  }

  test("unigram Viterbi beats greedy longest-match: the constructed case") {
    import graft.plans.UnigramExpression
    // greedy longest-match on this vocab commits to 'ab' first and is
    // forced into the expensive 'c': ab+c = -25. Viterbi takes the
    // globally optimal a+bc = -10 — the same piece count, higher score.
    val vocab = Seq("ab" -> -5L, "a" -> -6L, "bc" -> -4L, "c" -> -20L,
      "b" -> -30L)
    val greedyScore = -5L + -20L // what longest-match would pay
    val got = Seq(Tuple1("abc")).toDF("text")
      .select(
        UnigramExpression.unigramScore($"text", vocab, -1000L).as("s"),
        UnigramExpression.unigramPieces($"text", vocab, -1000L).as("p"))
      .as[(Long, String)].head()
    assert(got === ((-10L, "a bc")))
    assert(got._1 > greedyScore)
  }

  test("unigram Viterbi tie-break: equal (score, pieces) resolves to the " +
      "longest last piece") {
    import graft.plans.UnigramExpression
    // 'aaa': aa+a and a+aa both score -15 with 2 pieces; the documented
    // tie-break (longest LAST piece) picks a+aa. a+a+a also scores -15
    // but loses on piece count.
    val vocab = Seq("aa" -> -10L, "a" -> -5L)
    val got = Seq(Tuple1("aaa")).toDF("text")
      .select(
        UnigramExpression.unigramCount($"text", vocab, -1000L).as("n"),
        UnigramExpression.unigramScore($"text", vocab, -1000L).as("s"),
        UnigramExpression.unigramPieces($"text", vocab, -1000L).as("p"))
      .as[(Long, Long, String)].head()
    assert(got === ((2L, -15L, "a aa")))
  }

  test("unigram Viterbi: NULL text is NULL; count equals piece count") {
    val n = Seq((1L, Option.empty[String]), (2L, Some("Spark  Window")))
      .toDF("id", "text")
      .select($"id", TextAnalysis.unigramCount($"text").as("n"),
        TextAnalysis.unigramPieces($"text").as("p"))
      .as[(Long, Option[Long], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(n(1L) === ((None, None)))
    val (cnt, pieces) = (n(2L)._1.get, n(2L)._2.get)
    assert(cnt === pieces.split(" ").length.toLong)
    assert(pieces === "spark win dow")
  }

  test("ratios, language guess, fingerprint equality for case variants") {
    val r = docs.select($"doc_id",
        TextAnalysis.stopwordRatio($"text").as("sr"),
        TextAnalysis.punctRatio($"text").as("pr"),
        TextAnalysis.langGuess($"text").as("lang"))
      .as[(Long, Double, Double, String)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    assert(r(1L)._1 === 3.0 / 10) // the, it, the
    assert(r(1L)._2 === 2.0 / 48) // ',' and '!' over 48 normalized chars
    assert(r(1L)._3 === "en")
    assert(r(2L)._1 === 0.0 && r(2L)._3 === "unknown")
    val fps = Seq(("a b", 1), ("A  b ", 2)).toDF("text", "i")
      .select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("zero-denominator docs: ratios are NULL (never NaN), and the q167 " +
      "micro-signal coalesce genuinely fires") {
    // empty, whitespace-only (norm → ""), punct-only (tokens=1, norm>0):
    // 0.0/0 in Spark is NaN, which coalesce can't catch and floor().cast
    // silently zeroes — the nullif'd denominators must surface NULL instead
    val edge = Seq(("", 1L), ("   \t  ", 2L), ("!!!", 3L), ("the cat", 4L))
      .toDF("text", "doc_id")
    val r = edge.select($"doc_id",
        TextAnalysis.stopwordRatio($"text").as("sr"),
        TextAnalysis.punctRatio($"text").as("pr"),
        TextAnalysis.avgTokenLen($"text").as("al"))
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) === ((None, None, None)))
    assert(r(2L) === ((None, None, None)))
    assert(r(3L) === ((Some(0.0), Some(1.0), Some(3.0)))) // "!!!": 1 token
    assert(r(4L)._1 === Some(0.5))
    assert(!r.values.exists(v =>
      Seq(v._1, v._2, v._3).flatten.exists(_.isNaN)))
    // the exact q167 signal shape over the edge docs: guarded to 0 / 1e6
    val sig = edge.filter($"text".isNotNull).select($"doc_id",
        coalesce(floor(TextAnalysis.stopwordRatio($"text") * 1e6 + 0.5)
          .cast("long"), lit(0L)).as("stop_micro"),
        (lit(1000000L) - coalesce(
          floor(TextAnalysis.punctRatio($"text") * 1e6 + 0.5).cast("long"),
          lit(0L))).as("negpunct_micro"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(sig(1L) === ((0L, 1000000L)))
    assert(sig(2L) === ((0L, 1000000L)))
    assert(sig(3L) === ((0L, 0L))) // all-punct: ratio 1 → negpunct 0
  }

  test("repetition signals: hand-computed ratios, empty doc yields null") {
    import graft.ext.TextAnalysis._
    val df = Seq(
      ("a b a b a b",        0), // 6 tokens, 2 distinct; 4 trigrams, 2 distinct
      ("w x y z",            1), // no repetition at all
      ("",                   2)  // empty: every ratio must be null, not error
    ).toDF("text", "i")
    val got = df.select($"i", tokens($"text").as("ts"))
      .select($"i", dupTokenRatio($"ts").as("dt"),
        dupNgramRatio($"ts", 3).as("dg"), topTokenRatio($"ts").as("tt"))
      .orderBy("i").collect()
    assert(got(0).getDouble(1) === 4.0 / 6)  // a,b repeat 4 times
    assert(got(0).getDouble(2) === 2.0 / 4)  // "a b a","b a b" repeat
    assert(got(0).getDouble(3) === 3.0 / 6)  // 'a' x3 of 6
    assert(got(1).getDouble(1) === 0.0 && got(1).getDouble(2) === 0.0)
    assert(got(1).getDouble(3) === 1.0 / 4)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2) && got(2).isNullAt(3))
  }

  test("contamination overlap counts shared distinct shingles only") {
    import graft.ext.Dedup
    val corpus = Seq((1L, "p q r s t u v"), (2L, "a b c d e f")).toDF("id", "text")
    val bench = Seq((100L, "q r s t u zz ww")).toDF("id", "text")
    val got = Dedup.contaminationOverlap(
        Dedup.wordShingles(corpus, "id", "text", 5),
        Dedup.wordShingles(bench, "id", "text", 5), "id")
      .as[(Long, Long, Long)].collect().toSet
    // doc 1 shares exactly one 5-gram ("q r s t u"); doc 2 shares none
    assert(got === Set((1L, 100L, 1L)))
  }

  test("rolling min-hash sketch is content-determined") {
    val twice = Seq(("x", "one two three four five"), ("y", "one two three four five"),
        ("z", "six seven eight nine ten")).toDF("id", "text")
      .select($"id", TextAnalysis.rollingMinHash($"text", 3).as("h"))
      .as[(String, Long)].collect().toMap
    assert(twice("x") === twice("y"))
    assert(twice("x") !== twice("z"))
  }

  test("payload packing: metadata, frame sampling, nibble histogram") {
    val p = Multimodal.packPayload(docs.filter($"doc_id" === 1), "text")
    val meta = p.select($"payload.meta.mime", $"payload.meta.n_bytes",
      $"payload.meta.checksum").as[(String, Long, String)].head()
    assert(meta._1 === "text/plain" && meta._2 === 48L && meta._3.length === 32)

    val frames = p.select(Multimodal.frameSample($"payload.bytes", 4, 16))
      .as[Seq[Array[Byte]]].head()
    assert(frames.size === 4)
    assert(new String(frames.head, "UTF-8") === "The quick brown ")

    val hist = p.select(Multimodal.nibbleHistogram($"payload.bytes"))
      .as[Seq[Long]].head()
    assert(hist.size === 16 && hist.sum === 96L) // 48 bytes = 96 nibbles
  }

  test("WAV decoder recovers an independently serialized golden file") {
    // serialized with java.nio here, decoded by the expression codec —
    // writer and reader share no code, so agreement proves the layout
    import java.nio.{ByteBuffer, ByteOrder}
    val rate = 22050
    val samples = Array[Short](0, 1, -1, 32767, -32768, 123)
    val bb = ByteBuffer.allocate(44 + samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val d = Seq(Tuple1(bb.array())).toDF("bin")
      .select(Multimodal.decodeWav($"bin").as("d")).select($"d.*")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    //    (valid, channels, rate, bits, n, duration_us, sum_abs, max_abs)
    assert(d._1 === 1L && d._2 === 1L && d._3 === 22050L && d._4 === 16L)
    assert(d._5 === 6L)
    assert(d._6 === 12L * 1000000L / 44100L) // floor(272108.84…) = 272108
    assert(d._7 === 0L + 1 + 1 + 32767 + 32768 + 123) // two's complement ok
    assert(d._8 === 32768L)
  }

  test("WAV decoder rejects corrupt magic instead of throwing") {
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = ByteBuffer.allocate(46).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFX".getBytes("US-ASCII")) // big-endian RIFF variant: unsupported
    bb.putInt(38); bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(2); bb.putShort(7)
    val d = Seq(Tuple1(bb.array())).toDF("bin")
      .select(Multimodal.decodeWav($"bin").as("d"))
      .select($"d.valid", $"d.sample_rate", $"d.sum_abs")
      .as[(Long, Option[Long], Option[Long])].head()
    assert(d === ((0L, None, None)))
  }

  test("BMP decoder skips row padding (golden bytes, 3x2 at 24bpp)") {
    // w=3 -> rowBytes 9, stride 12: three pad bytes per row, set to 0xFF
    // so a naive stride-less reader would inflate the sum by 6*255
    import java.nio.{ByteBuffer, ByteOrder}
    val (w, h, stride) = (3, 2, 12)
    val bb = ByteBuffer.allocate(54 + stride * h)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("BM".getBytes("US-ASCII")); bb.putInt(54 + stride * h)
    bb.putInt(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(stride * h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    var v = 0
    for (_ <- 0 until h) {
      for (_ <- 0 until w * 3) { v += 1; bb.put(v.toByte) } // payload 1..18
      for (_ <- 0 until stride - w * 3) bb.put(0xFF.toByte) // padding
    }
    val d = Seq(Tuple1(bb.array())).toDF("bin")
      .select(Multimodal.decodeBmp($"bin").as("d")).select($"d.*")
      .as[(Long, Long, Long, Long, Long)].head()
    //    (valid, width, height, bpp, sum_pixels)
    assert(d === ((1L, 3L, 2L, 24L, (1 to 18).sum.toLong)))
  }

  test("BMP decoder rejects non-BI_RGB compression") {
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("BM".getBytes("US-ASCII")); bb.putInt(54); bb.putInt(0)
    bb.putInt(54); bb.putInt(40); bb.putInt(1); bb.putInt(1)
    bb.putShort(1); bb.putShort(24); bb.putInt(1 /* BI_RLE8 */); bb.putInt(0)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    val d = Seq(Tuple1(bb.array())).toDF("bin")
      .select(Multimodal.decodeBmp($"bin").as("d"))
      .select($"d.valid", $"d.width")
      .as[(Long, Option[Long])].head()
    assert(d === ((0L, None)))
  }

  test("fabricated WAV/BMP round-trip through the decoders (q99 device)") {
    val id = col("doc_id")
    val samples = transform(sequence(lit(0L), lit(4L)),
      i => pmod(id * 131L + i * 7919L, lit(65536L)) - 32768L)
    val df = Seq(1L, 2L, 3L).toDF("doc_id")
      .withColumn("wav", Multimodal.fabricateWav(lit(16000L), samples))
      .withColumn("bmp", Multimodal.fabricateBmp(lit(5L), lit(3L),
        (r, k) => pmod(id + r * 31L + k * 5L, lit(256L))))
    val got = df.select(id,
        Multimodal.decodeWav($"wav").as("w"), Multimodal.decodeBmp($"bmp").as("b"))
      .select(id, $"w.valid", $"w.n_samples", $"w.sum_abs",
        $"b.valid", $"b.width", $"b.height", $"b.sum_pixels")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { r =>
      val docId = r._1
      val expSum = (0L until 5L)
        .map(i => math.abs((docId * 131 + i * 7919) % 65536 - 32768)).sum
      val expPix = (for (row <- 0L until 3L; k <- 0L until 15L)
        yield (docId + row * 31 + k * 5) % 256).sum
      assert(r._2 === 1L && r._3 === 5L && r._4 === expSum, s"wav doc $docId")
      assert(r._5 === 1L && r._6 === 5L && r._7 === 3L && r._8 === expPix,
        s"bmp doc $docId")
    }
  }

  test("bmp aHash: one bright 2x2 block sets exactly that cell's bit") {
    // 16x16 all-black except pixels (rows 2-3, cols 2-3) = white: those
    // 4 pixels are exactly grid cell (1,1) = bit 9; every other cell's
    // mean (0) is not above the global mean, so hash == 1 << 9.
    val bmp = Multimodal.fabricateBmp(lit(16L), lit(16L), (r, k) =>
      when(r >= 2L && r < 4L && k >= 6L && k < 12L, lit(255L))
        .otherwise(lit(0L)))
    val got = Seq(1).toDF("i").select(Multimodal.bmpAHash64(bmp))
      .as[Long].head()
    assert(got === (1L << 9))
  }

  test("wav envelope: energy in one segment sets exactly that bit") {
    // 128 zero samples except i = 10, 11 (segment 5) — hash == 1 << 5
    val samples = transform(sequence(lit(0L), lit(127L)),
      i => when(i === 10L || i === 11L, lit(1000L)).otherwise(lit(0L)))
    val got = Seq(1).toDF("i")
      .select(Multimodal.wavEnvelope64(
        Multimodal.fabricateWav(lit(8000L), samples)))
      .as[Long].head()
    assert(got === (1L << 5))
  }

  test("perceptual hashes return null on corrupt bytes, never throw") {
    val r = Seq(1).toDF("i").select(
        Multimodal.bmpAHash64(unhex(lit("deadbeef"))).as("b"),
        Multimodal.wavEnvelope64(unhex(lit("deadbeef"))).as("w"))
      .as[(Option[Long], Option[Long])].head()
    assert(r === ((None, None)))
  }

  test("hammingNearDups64 equals the all-pairs truth (pigeonhole recall)") {
    import graft.plans.Fnv1a64Expression.fnv1a64
    // 100 pseudo-random fingerprints, each duplicated with 1 low bit
    // flipped: every (2i, 2i+1) pair is hamming 1 and must be found;
    // chance cross-pairs are whatever they are — the operator must agree
    // with the exact all-pairs computation either way.
    val fps = spark.range(200).select(col("id"),
      fnv1a64(expr("id div 2")).bitwiseXOR(pmod(col("id"), lit(2L)))
        .as("fp"))
    val got = graft.ext.Dedup.hammingNearDups64(fps, "id", "fp", 3)
      .as[(Long, Long, Int)].collect().toSet
    val all = fps.as[(Long, Long)].collect()
    val truth = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(truth.size >= 100, "planted pairs must be in the truth set")
    assert(got === truth)
  }

  test("quality verdict: each rule fires on a crafted doc, in order") {
    val en = "the and for with that this from they have was are " // stopwordy
    val longDoc = en * 3 +
      "alphabet butterfly gammaray deltawing epsilonic zetas ethanol theorem"
    // 25 distinct 2-char tokens: passes the count rule, fails mean length
    val shortTokens = (0 until 25)
      .map(i => "" + ('a' + i / 10).toChar + ('0' + i % 10).toChar)
      .mkString(" ")
    val cases = Seq(
      (1L, null.asInstanceOf[String], "null_text"),
      (2L, "short doc", "too_few_tokens"),
      (3L, ("word " * 6000).trim, "too_many_tokens"),
      (4L, shortTokens, "short_mean_token"),
      (5L, longDoc, null.asInstanceOf[String]))
    val df = cases.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val got = df.select($"doc_id",
        TextAnalysis.qualityFirstFail($"text").as("ff"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, expected) =>
      assert(got(id) === expected, s"doc $id")
    }
  }

  test("quality verdict: order contract — earliest failing rule is named") {
    // fails BOTH too_few_tokens and low_stopword_mass (no stopwords at
    // all); the earlier rule must win
    val df = Seq((1L, "zyx wvu tsr qpo")).toDF("doc_id", "text")
    val ff = df.select(TextAnalysis.qualityFirstFail($"text"))
      .as[String].head()
    assert(ff === "too_few_tokens")
  }

  test("BMP resize: identity dims round-trip byte-identical, both strides") {
    // w=5 pads rows to 16 bytes, w=4 doesn't (12 = multiple of 4): the
    // identity resize must reproduce the input EXACTLY in both regimes
    for ((w, h) <- Seq((5, 3), (4, 2))) {
      val src = Seq(Tuple1(1L)).toDF("id").select(
        Multimodal.fabricateBmp(lit(w.toLong), lit(h.toLong),
          (r, k) => pmod(lit(7L) + r * 31L + k * 5L, lit(256L))).as("bmp"))
      val (orig, same) = src.select($"bmp",
          Multimodal.resizeBmp($"bmp", w, h))
        .as[(Array[Byte], Array[Byte])].head()
      assert(same.toSeq === orig.toSeq, s"identity resize at ${w}x$h")
    }
  }

  test("BMP resize: nearest-neighbor map against an independent writer") {
    // golden 4x2 source serialized with java.nio (no shared code with
    // fabricateBmp): pixel bytes of storage row r are 10r+k for byte k.
    import java.nio.{ByteBuffer, ByteOrder}
    val (w, h) = (4, 2)
    val bb = ByteBuffer.allocate(54 + w * 3 * h).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte); bb.putInt(54 + w * 3 * h)
    bb.putInt(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(w * 3 * h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    for (r <- 0 until h; k <- 0 until w * 3) bb.put((10 * r + k).toByte)
    val out = Seq(Tuple1(bb.array())).toDF("bin")
      .select(Multimodal.resizeBmp($"bin", 2, 1).as("t"))
      .select($"t", Multimodal.decodeBmp($"t").as("d"))
      .as[(Array[Byte], (Long, Long, Long, Long, Long))].head()
    // 2x1 output: srcR = 0, srcC in {0, 2} -> source bytes 0,1,2 and 6,7,8
    assert(out._2 === ((1L, 2L, 1L, 24L, 0L + 1 + 2 + 6 + 7 + 8)))
    // 2 px = 6 row bytes -> stride 8: output pads where the source didn't
    assert(out._1.length === 54 + 8)
    assert(out._1.slice(54, 60).map(_ & 0xFF).toSeq === Seq(0, 1, 2, 6, 7, 8))
  }

  test("BMP resize: integer upsample preserves total mass x factor^2") {
    val src = Seq(Tuple1(1L)).toDF("id").select(
      Multimodal.fabricateBmp(lit(2L), lit(2L),
        (r, k) => pmod(r * 100L + k * 3L, lit(256L))).as("bmp"))
    val (srcSum, upSum) = src.select(
        Multimodal.decodeBmp($"bmp").getField("sum_pixels"),
        Multimodal.decodeBmp(Multimodal.resizeBmp($"bmp", 4, 4))
          .getField("sum_pixels"))
      .as[(Long, Long)].head()
    // every source pixel appears in exactly a 2x2 output block
    assert(upSum === 4 * srcSum)
  }

  test("BMP resize commutes with integer upsampling (floor(floor(2x)/2) = floor(x))") {
    // an INDEPENDENTLY fabricated 2x upsample (never through resizeBmp)
    // must canonicalize to the byte-identical thumbnail — the q172
    // cross-resolution dedup identity, across both stride regimes
    for ((w, h) <- Seq((7L, 5L), (4L, 2L))) {
      def base(r: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
        pmod(lit(3L) + r * 31L + k * 5L, lit(256L))
      val pair = Seq(Tuple1(1L)).toDF("id").select(
        Multimodal.fabricateBmp(lit(w), lit(h), base).as("b1"),
        Multimodal.fabricateBmp(lit(w * 2), lit(h * 2),
          (r, k) => base(floor(r / 2.0).cast("long"),
            floor(floor(k / 3.0) / 2.0).cast("long") * 3L + pmod(k, lit(3L))))
          .as("b2"))
      val (t1, t2) = pair.select(
          Multimodal.resizeBmp($"b1", 5, 3), Multimodal.resizeBmp($"b2", 5, 3))
        .as[(Array[Byte], Array[Byte])].head()
      assert(t1.toSeq === t2.toSeq, s"thumbs diverged at ${w}x$h")
    }
  }

  test("WAV decimation: strided subset against an independent writer") {
    // golden 7-sample WAV serialized with java.nio; decimate by 2 keeps
    // samples 0, 2, 4, 6 and halves the rate
    import java.nio.{ByteBuffer, ByteOrder}
    val samples = Array[Short](100, -200, 300, -400, 500, -600, 700)
    val bb = ByteBuffer.allocate(44 + samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(16000); bb.putInt(32000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val d = Seq(Tuple1(bb.array())).toDF("bin")
      .withColumn("ds", Multimodal.decimateWav($"bin", 2))
      .select(Multimodal.decodeWav($"ds").as("d")).select($"d.*")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    //    (valid, channels, rate, bits, n, duration_us, sum_abs, max_abs)
    assert(d._1 === 1L && d._2 === 1L && d._3 === 8000L && d._4 === 16L)
    assert(d._5 === 4L)                         // ceil(7/2)
    assert(d._7 === 100L + 300 + 500 + 700)     // samples 0,2,4,6
    assert(d._8 === 700L)
  }

  test("WAV decimation: factor 1 round-trips a fabricated WAV byte-identically") {
    val src = Seq(Tuple1(5L)).toDF("id").select(
      Multimodal.fabricateWav(lit(8000L),
        transform(sequence(lit(0L), lit(9L)),
          i => pmod(i * 7919L, lit(65536L)) - 32768L)).as("wav"))
    val (orig, same) = src.select($"wav", Multimodal.decimateWav($"wav", 1))
      .as[(Array[Byte], Array[Byte])].head()
    assert(same.toSeq === orig.toSeq)
  }

  test("WAV decimation rejects stereo input as null, never throws") {
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(40)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(2) // PCM but STEREO: unsupported
    bb.putInt(8000); bb.putInt(32000); bb.putShort(4); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(4); bb.putShort(1); bb.putShort(2)
    val got = Seq(Tuple1(bb.array())).toDF("bin")
      .select(Multimodal.decimateWav($"bin", 2))
      .as[Option[Array[Byte]]].head()
    assert(got.isEmpty)
  }

  test("BMP resize rejects invalid input as null, never throws") {
    val got = Seq(Tuple1("notabmp".getBytes("UTF-8"))).toDF("bin")
      .select(Multimodal.resizeBmp($"bin", 2, 2))
      .as[Option[Array[Byte]]].head()
    assert(got.isEmpty)
  }

  test("WAV decimation rejects truncated / size-lying input as null") {
    import java.nio.{ByteBuffer, ByteOrder}
    // header-valid mono 16-bit WAV whose data chunk CLAIMS 8 samples but
    // carries only 2 — pre-guard this emitted a corrupt non-null WAV (null
    // sample reads silently dropped by the serializer's array_join)
    val bb = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(40)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(16) // lies: only 4 bytes follow
    bb.putShort(1); bb.putShort(2)
    val truncated = bb.array()
    // size-LYING header: declares ~2^31 data bytes on a 48-byte input —
    // pre-guard, outN drove a multi-GB sequence() allocation
    val lying = truncated.clone()
    ByteBuffer.wrap(lying).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue)
    val got = Seq(Tuple1(truncated), Tuple1(lying)).toDF("bin")
      .select(Multimodal.decimateWav($"bin", 2))
      .as[Option[Array[Byte]]].collect()
    assert(got.forall(_.isEmpty))
  }

  test("sinc resample through the seam: decimate-by-1 is byte-identical " +
      "(parse → rebuild round trip)") {
    import graft.ext.Resample
    val src = Seq(Tuple1(7L)).toDF("id").select(
      Multimodal.fabricateWav(lit(8000L),
        transform(sequence(lit(0L), lit(24L)),
          i => pmod(i * 7919L + 13L, lit(65536L)) - 32768L)).as("wav"))
    val (orig, same) = Resample.resampleWav(src, "wav", "rs", factor = 1)
      .select($"wav", $"rs").as[(Array[Byte], Array[Byte])].head()
    assert(same.toSeq === orig.toSeq)
  }

  test("sinc resample golden: factor-2 output matches an independent " +
      "integer convolution, edges zero-padded") {
    import graft.ext.Resample
    import java.nio.{ByteBuffer, ByteOrder}
    val samples = Array[Short](1000, -2000, 3000, -4000, 5000, -6000,
      7000, -8000, 9000, -10000, 11000, -12000, 32767)
    val bb = ByteBuffer.allocate(44 + samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(16000); bb.putInt(32000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    // independent reference: the documented formula, straight-line
    val h = Resample.TapsM2
    val expN = (samples.length + 1) / 2
    val expected = (0 until expN).map { j =>
      var acc = 0L
      for (k <- h.indices) {
        val i = 2 * j + k - 9
        if (i >= 0 && i < samples.length) acc += samples(i).toLong * h(k)
      }
      val y = (acc + 16384L + 2147483648L) / 32768L - 65536L
      math.max(-32768L, math.min(32767L, y))
    }
    val got = Resample.resampleWavBytes(bb.array(), 2)
    val gb = ByteBuffer.wrap(got).order(ByteOrder.LITTLE_ENDIAN)
    assert(gb.getInt(24) === 8000)           // rate halved
    assert(gb.getInt(40) === expN * 2)       // data chunk resized
    val gotSamples = (0 until expN).map(j => gb.getShort(44 + 2 * j).toLong)
    assert(gotSamples === expected)
    // and the seam yields the same bytes as the pure function
    val viaSeam = Resample.resampleWav(
        Seq(Tuple1(bb.array())).toDF("wav"), "wav", "rs", factor = 2)
      .select($"rs").as[Array[Byte]].head()
    assert(viaSeam.toSeq === got.toSeq)
  }

  test("sinc resample rejects invalid input as null through the seam") {
    import graft.ext.Resample
    import java.nio.{ByteBuffer, ByteOrder}
    // stereo: valid RIFF shape, unsupported channel count
    val bb = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(40)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(2); bb.putInt(8000); bb.putInt(32000)
    bb.putShort(4); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(4)
    bb.putShort(1); bb.putShort(2)
    val rows = Seq(
      (1L, bb.array()),                     // stereo
      (2L, "noise".getBytes("UTF-8")),      // not a WAV at all
      (3L, null.asInstanceOf[Array[Byte]])  // null propagates
    ).toDF("id", "wav")
    val got = Resample.resampleWav(rows, "wav", "rs", factor = 2)
      .select($"id", $"rs").as[(Long, Option[Array[Byte]])].collect()
    assert(got.forall(_._2.isEmpty))
    // unsupported factor fails at plan time, loudly
    intercept[IllegalArgumentException] {
      Resample.resampleWav(rows, "wav", "rs", factor = 3)
    }
  }

  test("BMP resize rejects header-valid but truncated pixel data as null") {
    val full = Seq(Tuple1(1L)).toDF("id")
      .select(Multimodal.fabricateBmp(lit(4L), lit(3L),
        (r, k) => pmod(r * 10L + k, lit(256L))).as("bmp"))
      .as[Array[Byte]].head()
    val truncated = full.dropRight(5) // header intact, pixel array short
    val got = Seq(Tuple1(truncated)).toDF("bin")
      .select(Multimodal.resizeBmp($"bin", 2, 2))
      .as[Option[Array[Byte]]].head()
    assert(got.isEmpty)
  }
}
