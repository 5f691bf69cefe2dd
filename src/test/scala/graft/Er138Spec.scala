package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.operators.Behavioral

/** Hand-computable contracts behind q136 (linear attribution), q137
  * (winsorized stats — spec lives with the attribution fixture since both
  * are window-over-integers devices), and q138 (sorted-neighborhood ER
  * candidates).
  */
class LinearAttributionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // attributionJoin output shape: user, click_id, purchase_id, click_us,
  // purchase_us, value
  private def pairs(rows: (Long, Long, Long, Long, Double)*) =
    rows.map { case (u, c, p, cus, v) => (u, c, p, cus, cus + 1, v) }
      .toDF("user_id", "click_id", "purchase_id", "click_us",
        "purchase_us", "value")

  test("equal split with remainder micros on the earliest touches") {
    // vm = 10000001, 3 touches -> 3333333 each, remainder 2 -> clicks at
    // us 10 and 20 (earliest two) get one extra micro
    val got = Behavioral.linearAttribution(pairs(
        (1L, 101L, 900L, 10L, 10.000001),
        (1L, 102L, 900L, 20L, 10.000001),
        (1L, 103L, 900L, 30L, 10.000001)))
      .select("click_id", "n_touches", "credit_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((101L, 3L, 3333334L), (102L, 3L, 3333334L),
      (103L, 3L, 3333333L)))
  }

  test("conservation: credits sum exactly to the quantized value") {
    val df = Behavioral.linearAttribution(pairs(
      (1L, 1L, 900L, 5L, 7.777777), (1L, 2L, 900L, 6L, 7.777777),
      (2L, 3L, 901L, 7L, 0.333333)))
    val sums = df.groupBy("purchase_id").agg(sum("credit_micro").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sums(900L) === 7777777L)
    assert(sums(901L) === 333333L)
  }

  test("conservation holds for NEGATIVE values (refund attribution)") {
    // vm = -7, 3 touches: floor quotient -3 each, pmod remainder 2 ->
    // earliest two touches get +1 micro; sum = -3·3 + 2 = -7 exactly
    // (a truncating div + signed % would lose the remainder here)
    val got = Behavioral.linearAttribution(pairs(
        (1L, 1L, 900L, 10L, -0.000007),
        (1L, 2L, 900L, 20L, -0.000007),
        (1L, 3L, 900L, 30L, -0.000007)))
      .select("click_id", "credit_micro")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, -2L), (2L, -2L), (3L, -3L)))
    assert(got.map(_._2).sum === -7L)
  }

  test("remainder ties break on click_id at equal click_us") {
    // vm = 5, 3 touches at the SAME us -> remainder 2 goes to the two
    // smallest click ids
    val got = Behavioral.linearAttribution(pairs(
        (1L, 33L, 900L, 10L, 0.000005),
        (1L, 11L, 900L, 10L, 0.000005),
        (1L, 22L, 900L, 10L, 0.000005)))
      .select("click_id", "credit_micro")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((11L, 2L), (22L, 2L), (33L, 1L)))
  }
}

class SortedNeighborhoodSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("reversed-key pass catches first-char divergence; verify is exact") {
    val v = Seq((1L, "smith john"), (2L, "smyth john"), (3L, "zmith john"),
      (4L, "totally other")).toDF("id", "name")
    val got = Dedup.sortedNeighborhoodPairs(v, "id", "name",
        blockLen = 4, windowSize = 3, maxDist = 2)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Long)].collect().sorted
    // pass 1 blocks smit/smyt/zmit/tota: singleton blocks, no candidates;
    // pass 2 reverses to "nhoj ..." x3 sharing block "nhoj": all three
    // pair, and levenshtein keeps the dist<=2 ones
    assert(got.toSeq === Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("window bound limits candidates to rank distance < windowSize") {
    // four same-block keys in order; windowSize 2 pairs only adjacent
    val v = Seq((1L, "aaaa 1"), (2L, "aaaa 2"), (3L, "aaaa 3"),
      (4L, "aaaa 4")).toDF("id", "name")
    val got = Dedup.sortedNeighborhoodPairs(v, "id", "name",
        blockLen = 4, windowSize = 2, maxDist = 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // forward pass: (1,2) (2,3) (3,4); reversed keys sort in the same
    // relative order here, adding no new pairs
    assert(got === Set((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("union of the two passes dedupes; ids canonicalize") {
    val v = Seq((9L, "abc x"), (2L, "abc y")).toDF("id", "name")
    val got = Dedup.sortedNeighborhoodPairs(v, "id", "name",
        blockLen = 3, windowSize = 2, maxDist = 20)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // both passes find the same pair -> exactly one canonical row
    assert(got.toSeq === Seq((2L, 9L)))
  }
}

class WinsorizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q137's device: exact p5/p95 order-statistic clamp, hand-computed") {
    // replicate the query inline on a 20-value stratum: lo_i = max(1, 1)
    // = 1 -> v_lo = 1; hi_i = min(20, (1900+99) div 100 = 19) -> v_hi =
    // 19; only the 20 clamps (to 19); mean_micro = 209e6 div 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    val docs = (1 to 20).map(i => (i.toLong, "en", i.toLong))
      .toDF("doc_id", "lang", "n_chars")
    val got = docs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(byLang))
      .withColumn("__lo_i", greatest(lit(1L), expr("(__n * 5) div 100")))
      .withColumn("__hi_i", least(col("__n"), expr("(__n * 95 + 99) div 100")))
      .withColumn("__vlo",
        max(when(col("__rn") === col("__lo_i"), col("n_chars"))).over(byLang))
      .withColumn("__vhi",
        max(when(col("__rn") === col("__hi_i"), col("n_chars"))).over(byLang))
      .withColumn("__cl",
        greatest(least(col("n_chars"), col("__vhi")), col("__vlo")))
      .groupBy("lang")
      .agg(min("__vlo").as("v_lo"), min("__vhi").as("v_hi"),
        sum(when(col("n_chars") > col("__vhi"), 1L).otherwise(0L))
          .as("clamped_high"),
        expr("(sum(__cl) * 1000000) div count(1)").as("mean_micro"))
      .as[(String, Long, Long, Long, Long)].head()
    assert(got === (("en", 1L, 19L, 1L, 10450000L)))
  }
}
