package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis
import graft.plans.TopKByAggregate
import graft.queries.RetrievalOps

class RetrievalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** run a RetrievalOps query against an in-memory documents table by
    * pointing it at a temp dir holding one parquet file */
  private def runOn(name: String,
                    docs: Seq[(Long, String)]): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("retrieval").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    RetrievalOps.queries(name)(spark, dir)
  }

  test("bm25: rarer query terms dominate, ranking is (score desc, id asc)") {
    // doc 1 is the query doc (doc_id % 100 == 1): its 5 distinct terms are
    // all its words. "zebra" appears only in docs 1 and 3 (rare, idf 1.4);
    // "the"/"and" appear in EVERY doc (df = N, idf 0.09 each — matching
    // both still totals 0.18). Doc 3 must outrank docs 2/4: equal lengths,
    // but doc 3 matches the rare term plus the common ones.
    val corpus = Seq(
      1L -> "zebra quantum flux the and",
      2L -> "the and common words here filler pad",
      3L -> "zebra the and runs far away tonight",
      4L -> "the and runs far away tonight quiet",
      5L -> "the and unrelated content entirely different"
    )
    val got = runOn("q101_bm25_topk", corpus)
      .select("query_id", "rnk", "doc_id", "score_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._1).distinct.toSeq === Seq(1L))
    // the query doc matches itself perfectly -> rank 1
    assert(got.head._3 === 1L)
    val rankOf = got.map(r => r._3 -> r._2).toMap
    assert(rankOf(3L) < rankOf.getOrElse(4L, Long.MaxValue),
      s"rare-term match must outrank common-term match: $rankOf")
    // scores strictly ordered by construction of the fixture
    assert(got.map(_._4).toSeq === got.map(_._4).sortBy(-_).toSeq)
  }

  test("bm25: tf saturation — 5x term repetition scores less than 5x once") {
    // same doc length (filler pads), same single matching term
    val corpus = Seq(
      1L -> "zebra unique query terms five",
      2L -> "zebra zebra zebra zebra zebra pad1 pad2 pad3 pad4 pad5",
      3L -> "zebra once pads here pad1 pad2 pad3 pad4 pad5 pad6"
    )
    val scores = runOn("q101_bm25_topk", corpus)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(scores.contains(2L) && scores.contains(3L))
    // saturating, not linear: 5 occurrences < 5x the single-occurrence score
    assert(scores(2L) > scores(3L))
    assert(scores(2L) < 5L * scores(3L))
  }

  test("chunking: window/stride arithmetic, tail chunk, fingerprints") {
    val words50 = (1 to 50).map(i => s"w$i").mkString(" ")
    val words20 = (1 to 20).map(i => s"t$i").mkString(" ")
    val got = runOn("q103_chunk_windows", Seq(1L -> words50, 2L -> words20))
      .select("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_fp")
      .as[(Long, Long, Long, Long, Long)].collect()
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // 50 tokens, window 32, stride 24 -> starts 0, 24, 48
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq ===
      Seq((0L, 0L, 32L), (1L, 24L, 26L), (2L, 48L, 2L)))
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(r => (r._2, r._3, r._4)).toSeq === Seq((0L, 0L, 20L)))
    // fingerprint = FNV of the space-joined window, independently computed
    val fp0 = graft.plans.Fnv1a64Ops.hashString(graft.plans.Fnv1a64Ops.Offset,
      org.apache.spark.unsafe.types.UTF8String.fromString(
        (1 to 32).map(i => s"w$i").mkString(" ")))
    assert(d1.head._5 === fp0)
    // overlapping chunks of the same doc still differ
    assert(got.map(_._5).distinct.length === got.length)
  }

  test("chunking: exact-dup docs produce identical fingerprint sequences") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val got = runOn("q103_chunk_windows", Seq(1L -> text, 2L -> (" " + text)))
      .select("doc_id", "chunk_idx", "chunk_fp")
      .as[(Long, Long, Long)].collect()
    val a = got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    val b = got.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq
    assert(a === b && a.nonEmpty)
  }
}
