package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the driver-tail-line char budget AHEAD of catalog growth
  * (round-16, verdict item 7): the bare-key 1-decimal step measured 1,831
  * chars at 182 queries and would burst the ~2,000-char window near 200 —
  * the deciseconds ladder step has to absorb that BEFORE the round it
  * happens, so these tests simulate the future catalog and assert the
  * line still parses with per-query data intact. The ladder itself lives
  * in [[Bench.tailLine]] (extracted from main for exactly this spec).
  */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper

  /** Deterministic representative walls: mostly sub-second, a tail of
    * multi-second composites, one ~10 s pipeline face per 50 queries —
    * the sf0.1 catalog's actual shape. */
  private def wall(i: Int): Double =
    if (i % 50 == 0) 10.2
    else if (i % 10 == 0) 4.73
    else if (i % 3 == 0) 1.28
    else 0.41 + (i % 7) * 0.1

  private def line(n: Int, failed: Seq[String] = Nil,
                   names: Int => String = i => s"q${i}_face"): String =
    Bench.tailLine(
      (1 to n).map(i => (names(i), wall(i))),
      total = (1 to n).map(wall).sum,
      cpuTotal = 1059.1, failed = failed, coldBuilds = 0, loadAvg = 7.0,
      calStart = 1.23, calEnd = 1.31, sfName = "sf0.1",
      note = _ => ())

  test("the CURRENT catalog keeps per-query walls in the tail line") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val l = Bench.tailLine(
      names.zipWithIndex.map { case (k, i) => (k, wall(i + 1)) },
      total = 302.4, cpuTotal = 1059.1, failed = Nil, coldBuilds = 0,
      loadAvg = 7.0, calStart = 1.23, calEnd = 1.31, sfName = "sf0.1",
      note = _ => ())
    assert(l.length <= 1980, s"current catalog tail line ${l.length} chars")
    val json = mapper.readTree(l)
    // per-query data present under SOME ladder step on today's catalog
    val perQuery =
      (if (json.has("queries")) json.get("queries").size() else 0) +
        (if (json.has("q_ds")) json.get("q_ds").size() else 0)
    assert(perQuery === names.size,
      "per-query walls must survive at the current catalog size")
    assert(json.get("cal_start").asDouble() === 1.23)
    assert(json.get("cal_end").asDouble() === 1.31)
    assert(json.get("store_cold_builds").asInt() === 0)
  }

  test("200 queries: deciseconds step fits the window with per-query data") {
    val l = line(200)
    assert(l.length <= 1980, s"200-query tail line ${l.length} chars")
    val json = mapper.readTree(l)
    assert(json.has("q_ds") || json.has("queries"))
    val qds = if (json.has("q_ds")) json.get("q_ds") else json.get("queries")
    assert(qds.size() === 200)
    // deciseconds round-trip: 4.73 s -> 47 ds at its bare key
    if (json.has("q_ds"))
      assert(json.get("q_ds").get("10").asInt() ===
        math.round(wall(10) * 10).toInt)
  }

  test("240 queries with failures: the ladder floor always parses") {
    val l = line(240, failed = Seq("q7_face", "q13_face"))
    assert(l.length <= 1980, s"240-query tail line ${l.length} chars")
    val json = mapper.readTree(l)
    assert(json.get("metric").asText() === "total")
    assert(json.get("errors").size() === 2)
    // whatever step was chosen, the totals + provenance survive
    assert(json.has("cpu_total") && json.has("cal_start"))
  }

  test("failed queries carry -1 through every ladder step") {
    val l = Bench.tailLine(
      Seq(("q1_a", 0.5), ("q2_b", -1.0)), total = 0.5, cpuTotal = 1.0,
      failed = Seq("q2_b"), coldBuilds = 1, loadAvg = 0.1,
      calStart = 1.0, calEnd = 1.0, sfName = "sf0.01", note = _ => ())
    val json = mapper.readTree(l)
    assert(json.get("queries").get("q2").asInt() === -1)
    assert(json.get("errors").get(0).asText() === "q2_b")
    assert(json.get("store_cold_builds").asInt() === 1)
  }

  test("negative calibration (probe failed) omits the cal fields") {
    val l = Bench.tailLine(
      Seq(("q1_a", 0.5)), total = 0.5, cpuTotal = 1.0, failed = Nil,
      coldBuilds = 0, loadAvg = 0.1, calStart = -1.0, calEnd = -1.0,
      sfName = "sf0.01", note = _ => ())
    val json = mapper.readTree(l)
    assert(!json.has("cal_start") && !json.has("cal_end"))
  }
}
