package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Hand-computable contracts for the corpus-level n-gram signals behind
  * q87 (boilerplate ratio) and q89 (arrival-order novelty) — the queries
  * themselves are oracle-checked; these pin the semantics on a corpus
  * small enough to verify by eye, including the no-shingle edge.
  */
class CurationOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d"),   // shingles {a b c, b c d} — both first here
    (2L, "a b c x"),   // {a b c (seen), b c x (new)}
    (3L, "a b c d"),   // exact dup of doc 1 — nothing new
    (4L, "xx yy")      // 2 words: no trigrams
  ).toDF("doc_id", "text")

  test("novelty: first occurrence wins, dups score zero, short docs null") {
    val sh = Dedup.wordShingles(docs, "doc_id", "text", n = 3)
    val first = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    val got = sh.join(first, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(($"first_doc" === $"doc_id").cast("long")).as("novel"))
      .select($"doc_id", ($"novel" / $"n").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 1.0)
    assert(got(2L) === 0.5)
    assert(got(3L) === 0.0)
    assert(!got.contains(4L)) // no shingles → no row (query left-joins it)
  }

  test("boilerplate df: shared trigram counted once per doc") {
    val sh = Dedup.wordShingles(docs, "doc_id", "text", n = 3)
    val dfs = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    assert(dfs("a b c") === 3L) // docs 1, 2, 3 — once each despite dup text
    assert(dfs("b c d") === 2L)
    assert(dfs("b c x") === 1L)
  }
}
