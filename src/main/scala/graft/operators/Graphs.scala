package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small distributed-graph utilities beside [[ConnectedComponents]] (which
  * components) and [[PageRank]] (how central): triangle counting — the
  * clustering/cohesion primitive (a node's triangle count is the
  * numerator of its local clustering coefficient, the standard community-
  * density signal).
  */
object Graphs {

  /** Per-node triangle counts over an undirected graph given as CANONICAL
    * edges (`p1 < p2`, one row per edge — the orientation every pair
    * generator here already emits). A triangle a < b < c is found exactly
    * once as e(a,b) ⋈ e(b,c) ⋈ e(a,c): orienting the join by the id
    * order means each wedge (a,b),(b,c) is probed once, never 6× — the
    * classic oriented-wedge bound of Σ out-deg² probe work. At scale the
    * standard upgrade is DEGREE ordering (orient edges low-degree →
    * high-degree for the O(m^{3/2}) bound, Latapy/compact-forward); the
    * id orientation keeps the same plan shape — two equi-joins and one
    * aggregation, every exchange keyed — and is deterministic without a
    * degree precomputation pass.
    *
    * Returns (node, triangles) for nodes in ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("p1").as("a"), col("p2").as("b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
