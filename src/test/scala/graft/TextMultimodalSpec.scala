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

  test("payload packing: metadata, frame sampling, nibble histogram, stub decode") {
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

    val dec = p.select(Multimodal.decodeStub($"payload.bytes").as("d"))
      .select("d.width", "d.height", "d.channels")
      .as[(Long, Long, Long)].head()
    assert(dec._1 >= 1 && dec._1 <= 1920 && dec._2 >= 1 && dec._2 <= 1080 &&
      dec._3 === 3L)
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
}
