package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.BloomPrune
import graft.sources.Tables

class BloomPruneSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("pruning is transparent: prune-then-join == plain join") {
    val cust = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_acctbal")
    val orders = Tables.orders(spark, sf)
    val bloom = BloomPrune.build(cust, "c_custkey")
    val pruned = BloomPrune.prune(orders, "o_custkey", bloom)
      .join(cust, $"o_custkey" === $"c_custkey")
      .select("o_orderkey", "c_custkey")
    val plain = orders.join(cust, $"o_custkey" === $"c_custkey")
      .select("o_orderkey", "c_custkey")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("no false negatives ever; measured fp rate under the sizing bound") {
    // 50 build keys vs 10k probe keys, deliberately undersized bitmap
    // (m=1024, k=3): n·k/m = 0.146 -> fp ≈ (1-e^-0.146)^3 ≈ 0.25%. The
    // FNV family is deterministic, so the measured count is stable — the
    // assertion allows 4x the analytic rate to stay robust to the exact
    // bit mixing, while still proving the filter passes ~nothing.
    val build = (1L to 50L).toDF("k")
    val probe = (1L to 10000L).toDF("k")
    val bloom = BloomPrune.build(build, "k", numBits = 1024, numHashes = 3)
    val kept = BloomPrune.prune(probe, "k", bloom,
      numBits = 1024, numHashes = 3)
    val keptKeys = kept.as[Long].collect().toSet
    assert((1L to 50L).forall(keptKeys), "false negative: a build key was pruned")
    val falsePositives = keptKeys.size - 50
    assert(falsePositives <= (0.0025 * 4 * 9950).toInt,
      s"fp too high: $falsePositives of 9950 non-members passed")
  }

  test("null keys: skipped in build, dropped in probe; empty build drops all") {
    val build = Seq(Some(1L), None, Some(2L)).toDF("k")
    val probe = Seq(Some(1L), Some(3L), None).toDF("k")
    val bloom = BloomPrune.build(build, "k", numBits = 256, numHashes = 3)
    val keptRows = BloomPrune.prune(probe, "k", bloom,
      numBits = 256, numHashes = 3).collect()
    val kept = keptRows.map(_.getLong(0)).toSet
    assert(keptRows.length === kept.size) // no null row survived
    assert(kept.contains(1L), s"member key lost: $kept")
    assert(kept.subsetOf(Set(1L, 3L))) // 3 only as a bloom false positive
    val empty = BloomPrune.build(Seq.empty[Long].toDF("k"), "k",
      numBits = 256, numHashes = 3)
    assert(BloomPrune.prune(probe, "k", empty,
      numBits = 256, numHashes = 3).isEmpty)
  }

  test("pruning adds zero shuffles beyond building the bloom itself") {
    val build = (1L to 50L).toDF("k")
    val probe = (1L to 1000L).toDF("k")
    val bloom = BloomPrune.build(build, "k", numBits = 1024, numHashes = 3)
    def shuffles(plan: String): Int =
      "Exchange".r.findAllIn(plan).size -
        "BroadcastExchange".r.findAllIn(plan).size
    val bloomPlan = bloom.queryExecution.executedPlan.toString
    val prunedPlan = BloomPrune.prune(probe, "k", bloom,
      numBits = 1024, numHashes = 3).queryExecution.executedPlan.toString
    // the bloom row arrives via broadcast; the probe side itself is never
    // re-partitioned just to be filtered
    assert(shuffles(prunedPlan) === shuffles(bloomPlan),
      s"bloom plan:\n$bloomPlan\npruned plan:\n$prunedPlan")
  }
}
