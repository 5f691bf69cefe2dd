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

  test("url canonicalization: case, www, ports, paths, fragments collapse") {
    val urls = Seq(
      (1L, "HTTP://WWW.Sub.Example.COM:80/a/b?x=1#f"),
      (2L, "https://sub.example.com:443/other"),
      (3L, "https://sub.example.com:8080/kept-port-still-same-host"),
      (4L, "http://example.com/"),
      (5L, "https://cdn.assets.example.org/x"),
      (6L, "http://localhost/x") // single label: apex passes through
    ).toDF("id", "url")
    val got = urls.select($"id",
        graft.ext.UrlOps.canonicalHost($"url").as("h"))
      .withColumn("a", graft.ext.UrlOps.apexDomain($"h"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === (("sub.example.com", "example.com")))
    assert(got(2L) === (("sub.example.com", "example.com")))
    assert(got(3L) === (("sub.example.com", "example.com")))
    assert(got(4L) === (("example.com", "example.com")))
    assert(got(5L) === (("cdn.assets.example.org", "example.org")))
    assert(got(6L) === (("localhost", "localhost")))
  }

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

  test("token packing: shard = prefix-sum offset div budget, in FNV order") {
    import graft.plans.{Fnv1a64Ops => F}
    import graft.plans.Fnv1a64Expression.fnv1a64
    // 5 docs, one lang, 300 tokens each → budget 512 packs ~1.7 docs/shard
    val df = (1L to 5L).map(id => (id, "en", ("tok " * 300).trim))
      .toDF("doc_id", "lang", "text")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(fnv1a64($"doc_id"), $"doc_id")
    val got = df.select($"doc_id", $"lang",
        graft.ext.TextAnalysis.tokenCount($"text").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("shard", expr("(cum - n_tokens) div 512"))
      .select($"doc_id", $"cum", $"shard")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // driver-side twin: same order, same arithmetic
    val order = (1L to 5L).sortBy(id => (F.hashLong(F.Offset, id), id))
    var cum = 0L
    order.foreach { id =>
      val expectShard = cum / 512
      cum += 300
      assert(got(id) === ((cum, expectShard)), s"doc $id")
    }
  }

  test("norm outliers: a planted huge vector is flagged, peers are not") {
    import graft.ext.Similarity
    val base = (1L to 30L).map(id =>
      (id, 0, Seq.fill(4)(0.5f))) // identical norms
    val planted = Seq((99L, 0, Seq.fill(4)(5.0f))) // 100× the squared norm
    val vecs = (base ++ planted).toDF("vec_id", "label", "embedding")
    val qv = Similarity.quantize($"embedding")
    val q = vecs.select($"vec_id", $"label",
        Similarity.dotLong(qv, qv).as("__n2"))
      .select($"vec_id", $"label", expr("__n2 div 1000000").as("m"))
    val stats = q.groupBy("label").agg(
      count(lit(1)).as("n"), sum($"m").as("s1"), sum($"m" * $"m").as("s2"))
    val dN = $"n".cast("double"); val dM = $"m".cast("double")
    val dS1 = $"s1".cast("double"); val dS2 = $"s2".cast("double")
    val num = (dN * dM - dS1) * (dN * dM - dS1)
    val den = dN * dS2 - dS1 * dS1
    val flags = q.join(broadcast(stats), Seq("label"))
      .select($"vec_id", (num > lit(9.0) * den).cast("int").as("f"))
      .as[(Long, Int)].collect().toMap
    assert(flags(99L) === 1)
    assert((1L to 30L).forall(flags(_) === 0))
  }
}
