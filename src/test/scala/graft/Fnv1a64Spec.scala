package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.plans.{Fnv1a64Expression, Fnv1a64Ops}
import graft.plans.Fnv1a64Expression.fnv1a64

/** The portable hash must match the published FNV-1a 64 test vectors (for
  * ASCII, code-point folding == byte folding), and the codegen path must
  * agree with the interpreted kernel — it is the cross-engine contract the
  * q23/q27 oracles stand on.
  */
class Fnv1a64Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // published FNV-1a 64 vectors (http://www.isthe.com/chongo/tech/comp/fnv/)
  private val vectors = Seq(
    "" -> 0xcbf29ce484222325L,
    "a" -> 0xaf63dc4c8601ec8cL,
    "foobar" -> 0x85944171f73967e8L)

  test("string hash matches the published FNV-1a 64 test vectors") {
    for ((s, want) <- vectors) {
      assert(Fnv1a64Ops.hashString(Fnv1a64Ops.Offset,
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) === want)
      // and through the expression + codegen path
      val got = Seq(s).toDF("t").select(fnv1a64(col("t"))).as[Long].head()
      assert(got === want, s"codegen path for '$s'")
    }
  }

  test("long-child fold matches the seeded-family reference values") {
    // independently computed (python, mod-2^64 model — same values the
    // DuckDB oracle SQL reproduces): fnv(i, fnv("a")) for i = 0, 1, 42
    val base = 0xaf63dc4c8601ec8cL
    val expected = Map(0L -> 0x68e4f59d3562ead8L,
      1L -> 0xd751cda6b77aec7dL, 42L -> 0x9af58478119aecb6L)
    for ((i, want) <- expected) {
      val got = Seq(base).toDF("h")
        .select(fnv1a64(lit(i), col("h"))).as[Long].head()
      assert(got === want, s"family $i")
    }
  }

  test("null children propagate to null") {
    val got = Seq((Option.empty[String], 1L)).toDF("t", "h")
      .select(fnv1a64(col("t")), fnv1a64(col("h"), col("t"))).collect().head
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("non-ASCII code points fold as code points (DuckDB ascii() twin)") {
    // 'é' = U+00E9 (233), '漢' = U+6F22 — single fold step each
    val got = Seq("é漢").toDF("t").select(fnv1a64(col("t"))).as[Long].head()
    var h = Fnv1a64Ops.Offset
    h = (h ^ 0xE9) * Fnv1a64Ops.Prime
    h = (h ^ 0x6F22) * Fnv1a64Ops.Prime
    assert(got === h)
    // astral plane (4-byte UTF-8 / surrogate pair): '𝄞' = U+1D11E — the
    // byte-level decoder must yield the single code point, not surrogates
    val clef = new String(Character.toChars(0x1D11E))
    val gotClef = Seq("a" + clef).toDF("t").select(fnv1a64(col("t"))).as[Long].head()
    var h2 = Fnv1a64Ops.Offset
    h2 = (h2 ^ 'a'.toInt) * Fnv1a64Ops.Prime
    h2 = (h2 ^ 0x1D11E) * Fnv1a64Ops.Prime
    assert(gotClef === h2)
  }

  test("portable MinHash signatures are deterministic and full-length") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z w"))
      .toDF("id", "text")
    val s1 = Dedup.minHashSignatures(docs, "id", "text", n = 3, numHashes = 16,
      portable = true).orderBy("id").collect()
    val s2 = Dedup.minHashSignatures(docs, "id", "text", n = 3, numHashes = 16,
      portable = true).orderBy("id").collect()
    assert(s1.sameElements(s2))
    assert(s1.forall(_.getSeq[Long](1).length === 16))
    // near-identical docs agree on most signature slots; disjoint docs on none
    val sigs = s1.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree12 > agree13)
    assert(agree13 === 0)
  }

  test("portable SimHash differs from xxhash SimHash but is self-consistent") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"))
      .toDF("id", "text")
    val p = Dedup.simHash64Native(docs, "id", "text", portable = true)
      .orderBy("id").as[(Long, Long)].collect()
    val x = Dedup.simHash64Native(docs, "id", "text", portable = false)
      .orderBy("id").as[(Long, Long)].collect()
    assert(p(0)._2 === p(1)._2) // identical docs -> identical fingerprints
    assert(x(0)._2 === x(1)._2)
    assert(p(0)._2 !== x(0)._2) // different hash family -> different bits
  }
}
