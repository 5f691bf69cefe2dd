package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{HeavyHittersAggregate, KmvBottomKAggregate, KmvBuffer, MgBuffer}

class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("MgBuffer: classic decrement keeps every freq > n/(k+1) value") {
    // n = 12, k = 2 → guarantee bound n/(k+1) = 4: value 7 (freq 5) must
    // survive ANY order; interleave adversarially so decrements fire
    val stream = Seq(7L, 1L, 2L, 7L, 3L, 4L, 7L, 5L, 6L, 7L, 8L, 7L)
    val b = new MgBuffer(2)
    stream.foreach(b.add)
    assert(b.counts.contains(7L), b.counts.toMap.toString)
    assert(b.counts.size <= 2)
  }

  test("MgBuffer: merge subtracts the (k+1)-th largest and keeps heavies") {
    val a = new MgBuffer(2)
    Seq(1L, 1L, 1L, 2L, 2L).foreach(a.add) // {1->3, 2->2}
    val c = new MgBuffer(2)
    Seq(1L, 1L, 3L, 3L, 3L).foreach(c.add) // {1->2, 3->3}
    a.mergeFrom(c) // combined {1->5, 2->2, 3->3} → subtract 3rd largest (2)
    assert(a.counts.size <= 2)
    assert(a.counts(1L) === 3L) // 5 - 2
    assert(a.counts.contains(3L) && a.counts(3L) === 1L)
    assert(!a.counts.contains(2L))
    // combined n = 10, k = 2 → anything with freq > 10/3 must survive: 1 (5)
  }

  test("aggregate candidates cover all true heavies under any partitioning") {
    // 20 distinct background values + one planted heavy, shuffled across 7
    // partitions: MG with k = 8 (< 21 distinct, so decrements DO fire) must
    // still surface the heavy (freq 40/100 > 100/9)
    val rows = (1L to 60L).map(i => i % 20 + 100L) ++ Seq.fill(40)(7L)
    val df = rows.toDF("v").repartition(7)
    val cand = df.agg(HeavyHittersAggregate.heavyHitters($"v", 8).as("hh"))
      .select(explode($"hh").as("c")).select($"c.value")
      .as[Long].collect().toSet
    assert(cand.contains(7L), cand.toString)
  }

  test("graft_heavy_hitters is callable from SQL with a foldable k") {
    graft.plans.GraftExtensions.register(spark)
    ((1L to 40L).map(_ % 10) ++ Seq.fill(30)(3L)).toDF("v")
      .createOrReplaceTempView("hh_in")
    val cand = spark.sql(
      "SELECT graft_heavy_hitters(v, CAST(4 AS BIGINT)) AS hh FROM hh_in")
      .select(explode($"hh").as("c")).select($"c.value")
      .as[Long].collect().toSet
    assert(cand.contains(3L)) // freq 34/70 > 70/5
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_heavy_hitters(v, v) AS hh FROM hh_in").collect()
    }
  }

  test("MgBuffer weighted add: heavy mass survives, light mass evicts") {
    // W = 100, k = 2 → bound W/3 ≈ 33.3: value 7 carries 60 and must
    // survive; ten 4-weight values churn through the table around it
    val b = new MgBuffer(2)
    b.addWeighted(7L, 30L)
    (1L to 10L).foreach(v => b.addWeighted(v * 100L, 4L))
    b.addWeighted(7L, 30L)
    assert(b.counts.contains(7L), b.counts.toMap.toString)
    assert(b.counts.size <= 2)
    // eviction subtracts real mass: 7's counter is a LOWER bound of 60
    assert(b.counts(7L) <= 60L)
  }

  test("weighted candidates + exact re-sum equals plain groupBy/having") {
    // 20 uniform sources (weight 10 each) + one dominant (extra 300):
    // threshold 20% of W=500 → 100 > W/(k+1)=500/8 at k=7
    val rows = (1L to 20L).map(v => (v, 10L)) ++ Seq.fill(30)((7L, 10L))
    val df = rows.toDF("v", "w").repartition(9)
    val total = rows.map(_._2).sum
    val cand = df.agg(HeavyHittersAggregate
        .heavyHittersW($"v", $"w", 7).as("hh"))
      .select(explode($"hh").as("c")).select($"c.value".as("v"))
    val got = df.join(broadcast(cand), Seq("v"))
      .groupBy("v").agg(sum($"w").as("ws"))
      .filter($"ws" >= total * 0.2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(7L -> 310L))
  }

  test("graft_heavy_hitters_w and graft_kmv are callable from SQL") {
    graft.plans.GraftExtensions.register(spark)
    ((1L to 20L).map(v => (v, 10L)) ++ Seq.fill(30)((7L, 10L)))
      .toDF("v", "w").createOrReplaceTempView("whh_in")
    val cand = spark.sql(
      "SELECT graft_heavy_hitters_w(v, w, 7) AS hh FROM whh_in")
      .select(explode($"hh").as("c")).select($"c.value")
      .as[Long].collect().toSet
    assert(cand.contains(7L))
    val kmv = spark.sql(
      "SELECT graft_kmv(v * 1000003, 5) AS s FROM whh_in")
      .select(size($"s")).as[Int].head()
    assert(kmv === 5)
  }

  test("KmvBuffer keeps the k smallest distinct hashes in unsigned order") {
    val b = new KmvBuffer(3)
    // -1L is the unsigned MAXIMUM — it must be evicted once 3 smaller
    // unsigned values arrive; duplicates must not occupy slots
    Seq(-1L, 10L, 10L, 5L, 7L, 3L, 10L).foreach(b.add)
    assert(b.sortedHashes().toSeq === Seq(3L, 5L, 7L))
    val o = new KmvBuffer(3)
    Seq(1L, 5L, -2L).foreach(o.add)
    b.mergeFrom(o)
    assert(b.sortedHashes().toSeq === Seq(1L, 3L, 5L))
  }

  test("KMV sketch is identical under repartition; estimate within 30%") {
    import graft.plans.Fnv1a64Expression.fnv1a64
    val df = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    def sketch(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("event_type")
        .agg(KmvBottomKAggregate.kmv(fnv1a64($"user_id"), 64).as("kmv"),
          countDistinct($"user_id").as("exact"))
        .select($"event_type", $"kmv", $"exact")
        .as[(String, Seq[Long], Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val a = sketch(df)
    val b = sketch(df.repartition(13))
    assert(a === b) // the WHOLE sketch is order-independent, not just est
    a.foreach { case (_, (kmv, exact)) =>
      val k = 64
      if (kmv.size >= k) {
        val kth = kmv.last
        val u = kth.toDouble + (if (kth < 0) math.pow(2, 64) else 0.0) + 1.0
        val est = (k - 1).toDouble * math.pow(2, 64) / u
        assert(math.abs(est - exact) / exact < 0.3, s"est $est vs $exact")
      } else assert(kmv.size === exact)
    }
  }

  test("candidates + exact recount equals plain groupBy/having") {
    val rows = (1L to 500L).map(_ % 50) ++ Seq.fill(100)(7L) ++ Seq.fill(80)(13L)
    val df = rows.toDF("v").repartition(11)
    val n = rows.size
    val threshold = math.ceil(n * 0.05).toLong // 5% > n/(k+1) with k = 31
    val cand = df.agg(HeavyHittersAggregate.heavyHitters($"v", 31).as("hh"))
      .select(explode($"hh").as("c")).select($"c.value".as("v"))
    val got = df.join(broadcast(cand), Seq("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= threshold)
      .as[(Long, Long)].collect().toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toMap
    assert(got === exact)
    assert(got.keySet === Set(7L, 13L))
  }
}
