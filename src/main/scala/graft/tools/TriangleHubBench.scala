package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graphs
import graft.sources.Tables

/** One-off diagnostic (round-10 verdict item 3): the triangle tiers' WIN
  * case, not just their parity case. The co-purchase graph of the fixture
  * is uniform — q116 (id orientation) and q158 (degree orientation) bench
  * equal there — so this plants the exact pathology the degree tier
  * exists for: one celebrity node with the LOWEST id (0 — every real
  * partkey is ≥ 1) connected to `hubDeg` parts. Under id orientation all
  * hub edges point OUT of the hub (0 < every neighbor), making the hub a
  * single C(hubDeg, 2)-wedge join key that no partitioning can split;
  * under degree orientation the same edges point INTO the hub (it has
  * the max degree) and its out-degree is zero — wedge work stays bounded
  * by the base graph's O(m^1.5).
  *
  * Both variants must count the SAME triangles (asserted via the
  * sum-of-per-node-counts invariant, 3 · n_triangles).
  *
  * Usage: run.sh graft.tools.TriangleHubBench <sfDir> [hubDeg]
  */
object TriangleHubBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val hubDeg = args.lift(1).map(_.toLong).getOrElse(20000L)

    // q116/q158's co-purchase base (AnalyticsOps.coPurchaseEdges)
    val bk = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    val base = bk.as("a").join(bk.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("p1"), col("b.p").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2).select("p1", "p2")
    val hubEdges = Tables.part(spark, d)
      .select(col("p_partkey").cast("long").as("p2"))
      .filter(col("p2") <= hubDeg)
      .select(lit(0L).as("p1"), col("p2"))
    // pin + materialize so both variants time the COUNT, not the base join
    val edges = graft.ext.Caches.pin(base.unionByName(hubEdges))
    val m = edges.count()
    println(s"edges=$m (hubDeg=$hubDeg)")

    def time(name: String, df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val s = df.agg(sum("triangles")).head.getLong(0)
      println(f"$name: wall=${(System.nanoTime() - t0) / 1e9}%.1f s sum3tri=$s")
      s
    }
    // degree-oriented first so the id-oriented hot key cannot poison its
    // timing via leftover GC/shuffle pressure
    val b = time("degreeOriented(q158)", Graphs.triangleCountsDegreeOriented(edges))
    val a = time("idOriented(q116)", Graphs.triangleCounts(edges))
    require(a == b, s"triangle sums diverge: id=$a degree=$b")
    spark.stop()
  }
}
