package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step a
  * dedup pipeline needs between "near-dup PAIRS" (Jaccard/MinHash/SimHash
  * emit edges) and "keep one doc per GROUP": duplicate classes are the
  * components of the pair graph, and the canonical survivor is each
  * component's minimum id.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts labeled
  * with its own id; each round every vertex takes the min of its own label
  * and its neighbors' labels; fixpoint when a round changes nothing. Rounds
  * needed = the graph diameter. For dedup graphs that is small — duplicate
  * clusters are dense (a template shared by k docs is a near-clique, diameter
  * ~2) — so the pathological long-chain case (where large-star/small-star
  * alternation [Kiveris et al., "Connected Components in MapReduce", SoCC'14]
  * drops rounds to O(log n)) is deliberately not paid for here.
  *
  * Scale shape (the 100 TB contract): each round is one equi-join
  * (edges ⋈ labels, shuffled on vertex id) plus one min-aggregate — no
  * all-pairs step, no driver-side data. The per-round convergence check is a
  * scalar `count()` (an aggregate, not a collect). `localCheckpoint`
  * truncates lineage each round so the plan stays O(1) deep instead of
  * growing by two joins per iteration; the checkpoint blocks are freed by the
  * ContextCleaner once the next round's checkpoint supersedes them.
  */
object ConnectedComponents {

  /** (id, component) for every vertex appearing in `edges`; `component` is
    * the minimum vertex id of the connected component. Edges are treated as
    * undirected; self-loops and duplicate edges are harmless.
    */
  def run(edges: DataFrame, src: String, dst: String,
          maxIters: Int = 30): DataFrame = {
    // symmetrized adjacency, hash-partitioned on the join key BEFORE the
    // checkpoint: every round's edges-join needs hashpartitioning(u), and a
    // checkpoint pinned in distinct()'s (u, v) partitioning would re-shuffle
    // the full edge list EVERY round — the dominant per-round cost at scale.
    // Partitioned once here, each round only shuffles the (small) label frame.
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .repartition(col("u"))
      .localCheckpoint(true) // reused every round: pin, cut source lineage
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    // labels only ever decrease, so Σcomponent strictly decreases until the
    // fixpoint: one DECIMAL(38) aggregate per round replaces a join-against-
    // previous change count (half the convergence-check cost per round).
    // DECIMAL because a BIGINT sum of 64-bit ids can overflow silently.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)")))
        .head.getDecimal(0)) // null on an empty vertex set
        .map(_.stripTrailingZeros).getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // push every vertex's current label to each neighbor, then fold the
      // incoming labels into the vertex's own with a single min-aggregate
      val incoming = sym
        .join(labels.withColumnRenamed("id", "u"), Seq("u"))
        .select(col("v").as("id"), col("component"))
      val next = labels.unionByName(incoming)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      iter += 1
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
    }
    // partially-propagated labels are silently WRONG answers (one component
    // reported as several): refuse rather than return them. maxIters is a
    // runaway bound, not an output mode — rounds needed = graph diameter,
    // so hitting 30 means the input is not the near-clique dedup shape this
    // operator documents (use a large-star/small-star variant there).
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
          "graph diameter exceeds maxIters; labels would be wrong")
    labels
  }
}
