package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.LanguageModel

/** Hand-computable contracts for the LM curation tier behind q130 (bigram
  * LM quality filter) and q131 (DSIR importance selection) — the queries
  * are oracle-checked; these pin the arithmetic on corpora small enough to
  * verify with pencil, including the no-bigram and unseen-context edges.
  */
class LanguageModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bigramPairs: consecutive pairs, short and null docs drop") {
    val docs = Seq((1L, "a b c"), (2L, "x"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramPairs(docs, "doc_id", "text")
      .as[(Long, String, String)].collect().sorted
    assert(got.toSeq === Seq((1L, "a", "b"), (1L, "b", "c")))
  }

  test("bigram LM score: add-one smoothing, unseen context, keep threshold") {
    // train: "a b a b" -> bigrams (a,b) (b,a) (a,b); "a c" -> (a,c)
    // c2: (a,b)=2 (b,a)=1 (a,c)=1; c1: a=3 b=1; V = |{a,b,c}| = 3
    val train = Seq((100L, "a b a b"), (101L, "a c")).toDF("doc_id", "text")
    // doc 1 "a b": p(b|a) = (2+1)*1e6 div (3+3) = 500000
    // doc 2 "z z": unseen context -> (0+1)*1e6 div (0+3) = 333333
    // doc 3 "c": no bigrams -> NULL score, keep false
    // global g = (500000+333333) div 2 = 416666 -> keeps exactly doc 1
    val score = Seq((1L, "a b"), (2L, "z z"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = LanguageModel.scoreBigram(
        LanguageModel.fitBigram(train, "doc_id", "text"),
        score, "doc_id", "text")
      .as[(Long, Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((1L, Some(500000L), true)))
    assert(got(2L) === ((1L, Some(333333L), false)))
    assert(got(3L) === ((0L, None, false)))
  }

  test("importanceRatios: dense 256-row spine, target-heavy bucket ranks " +
    "above source-only bucket") {
    val target = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val source = target.union(
      Seq((2L, "zzz zzz zzz")).toDF("doc_id", "text"))
    val ratios = LanguageModel.importanceRatios(
      target, source, "doc_id", "text", buckets = 256)
    assert(ratios.count() === 256L)
    val bucketOf = LanguageModel
      .hashedFeatures(source, "doc_id", "text", 256)
      .as[(Long, Long)].collect().toMap
    val r = ratios.as[(Long, Long)].collect().toMap
    // 'aaa' appears in target and source; 'zzz' in source only
    assert(r(bucketOf(1L)) > r(bucketOf(2L)))
    assert(r.values.forall(_ >= 0L))
  }

  test("dsirSelect: picks the target-like docs, deterministically") {
    val target = Seq((900L, "cat dog cat dog cat")).toDF("doc_id", "text")
    val catty = (1L to 4L).map(i => (i, "cat dog cat"))
    val other = (11L to 14L).map(i => (i, s"rock paper scissors $i"))
    val source = (catty ++ other).toDF("doc_id", "text")
    val got = LanguageModel.dsirSelect(
        target, source, "doc_id", "text", buckets = 256, select = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L))
    // rerun is bit-stable (pure hash arithmetic, no RNG)
    val again = LanguageModel.dsirSelect(
        target, source, "doc_id", "text", buckets = 256, select = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got)
  }
}
