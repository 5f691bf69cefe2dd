package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * All similarity math runs on embeddings quantized to scaled longs
  * (`round(x · 1e6)`): every product and partial sum stays an exact integer
  * below 2^53, so the dot product is order-independent and bit-identical in
  * any engine, and the cosine derived from it (exact ints → correctly-rounded
  * sqrt/divide) is deterministic enough for hash-exact oracle comparison —
  * the same trick as `XDet.moneySum` for money columns.
  *
  * Scale shapes: [[knnExact]] is the O(|corpus|·|queries|) correctness
  * baseline (queries broadcast — use only with a bounded query set);
  * [[knnIvf]] is the 100 TB path — corpus rows are partitioned into coarse
  * cells (nearest centroid), queries probe only their `nprobe` closest
  * cells, and the candidate join is an equi-join on the cell id.
  */
object Similarity {

  val DefaultScale: Double = 1e6

  /** embedding → scaled-long vector. Quantized via `floor(x·scale + 0.5)`,
    * NOT `round`: Spark's round goes through BigDecimal on the shortest
    * decimal representation while DuckDB rounds the binary double, and the
    * two disagree on values a hair under .5 boundaries. floor(+0.5) is plain
    * IEEE arithmetic — bit-identical in every engine.
    */
  def quantize(vec: Column, scale: Double = DefaultScale): Column =
    transform(vec, x => floor(x * scale + lit(0.5)).cast("long"))

  /** exact integer dot product of two scaled-long vectors */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, x) => s + x)

  /** [[dotLong]] unrolled for a KNOWN dimension: higher-order functions
    * (`zip_with`/`aggregate`) evaluate interpreted with per-element boxing,
    * which dominates wall time when the dot product sits in a hot loop
    * (the SRP signature evaluates `bits` of these per row; the verify one
    * per candidate pair). A static Σ element_at·element_at chain stays in
    * whole-stage codegen. Left-to-right addition order matches the
    * aggregate fold — exact longs either way.
    */
  def dotLongStatic(a: Column, b: Column, dims: Int): Column =
    (1 to dims).map(i => element_at(a, i) * element_at(b, i))
      .reduce(_ + _)

  /** cosine from scaled-long vectors and their precomputed self-dots */
  def cosineFromQuantized(a: Column, b: Column, na: Column, nb: Column): Column =
    dotLong(a, b) / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** (idAlias, __qv quantized vector, __qn self-dot) projection */
  private def prep(df: DataFrame, id: String, vec: String, idAlias: String,
                   scale: Double): DataFrame =
    df.select(col(id).as(idAlias), quantize(col(vec), scale).as("__qv"))
      .withColumn("__qn", dotLong(col("__qv"), col("__qv")))

  /** Exact top-k cosine neighbors of each query vector, brute force.
    * Output: (query_id, neighbor_id, rank, cosine). Self-matches excluded.
    */
  def knnExact(corpus: DataFrame, queries: DataFrame,
               corpusId: String, corpusVec: String,
               queryId: String, queryVec: String,
               k: Int, scale: Double = DefaultScale): DataFrame = {
    val c = prep(corpus, corpusId, corpusVec, "neighbor_id", scale)
      .withColumnRenamed("__qv", "__cv").withColumnRenamed("__qn", "__cn")
    val q = prep(queries, queryId, queryVec, "query_id", scale)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineFromQuantized(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Assign every corpus row to its nearest centroid (max cosine, centroid id
    * tiebreak). Output: corpus columns + `cell`. Centroids are broadcast —
    * they are the coarse quantizer and stay small by construction.
    */
  def assignCells(corpus: DataFrame, corpusId: String, corpusVec: String,
                  centroids: DataFrame, centroidId: String, centroidVec: String,
                  scale: Double = DefaultScale): DataFrame =
    assignCellsQ(corpus, corpusId, corpusVec, centroids, centroidId,
      centroidVec, scale).drop("__qv", "__qn")

  /** [[assignCells]] retaining the quantized vector (`__qv`) and self-dot
    * (`__qn`) so downstream ranking does not recompute them per corpus row.
    */
  private def assignCellsQ(corpus: DataFrame, corpusId: String, corpusVec: String,
                           centroids: DataFrame, centroidId: String,
                           centroidVec: String, scale: Double): DataFrame = {
    val cent = prep(centroids, centroidId, centroidVec, "cell", scale)
      .withColumnRenamed("__qv", "__ctv").withColumnRenamed("__qn", "__ctn")
    val withQ = corpus
      .withColumn("__qv", quantize(col(corpusVec), scale))
      .withColumn("__qn", dotLong(col("__qv"), col("__qv")))
    val w = Window.partitionBy(corpusId).orderBy(col("__cos").desc, col("cell"))
    withQ.crossJoin(broadcast(cent))
      .withColumn("__cos",
        cosineFromQuantized(col("__qv"), col("__ctv"), col("__qn"), col("__ctn")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__cos", "__ctv", "__ctn")
  }

  /** IVF approximate top-k: queries probe their `nprobe` nearest cells and
    * rank only corpus rows assigned there. The candidate join is
    * (cell = cell) — an equi-join that scales with cell sizes, never
    * |corpus| × |queries|. Output: (query_id, rank, neighbor_id, cosine).
    */
  def knnIvf(corpus: DataFrame, queries: DataFrame,
             corpusId: String, corpusVec: String,
             queryId: String, queryVec: String,
             centroids: DataFrame, centroidId: String, centroidVec: String,
             k: Int, nprobe: Int, scale: Double = DefaultScale): DataFrame = {
    val assigned = assignCellsQ(corpus, corpusId, corpusVec,
        centroids, centroidId, centroidVec, scale)
      .select(col(corpusId).as("neighbor_id"), col("cell"),
        col("__qv").as("__cv"), col("__qn").as("__cn"))
    // per query: its nprobe closest centroids
    val cent = prep(centroids, centroidId, centroidVec, "cell", scale)
      .withColumnRenamed("__qv", "__ctv").withColumnRenamed("__qn", "__ctn")
    val q = prep(queries, queryId, queryVec, "query_id", scale)
    val wProbe = Window.partitionBy("query_id").orderBy(col("__cos").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("__cos",
        cosineFromQuantized(col("__qv"), col("__ctv"), col("__qn"), col("__ctn")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cell"), col("__qv"), col("__qn"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(assigned, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineFromQuantized(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs, bucketed by IVF cell: vectors
    * are assigned to their nearest centroid and only same-cell pairs are
    * compared — the all-pairs comparison never happens. Near-identical
    * vectors land in the same cell with high probability (they agree on
    * their nearest centroid unless they straddle a cell boundary); like all
    * single-probe LSH-style dedup this trades boundary recall for the
    * |corpus|²→Σ|cell|² cost cut. Output: (id_a, id_b, cosine).
    */
  def cosineNearDups(corpus: DataFrame, corpusId: String, corpusVec: String,
                     centroids: DataFrame, centroidId: String, centroidVec: String,
                     minCosine: Double, scale: Double = DefaultScale): DataFrame = {
    val assigned = assignCellsQ(corpus, corpusId, corpusVec,
        centroids, centroidId, centroidVec, scale)
    val a = assigned.select(col(corpusId).as("id_a"), col("cell"),
      col("__qv").as("__va"), col("__qn").as("__na"))
    val b = assigned.select(col(corpusId).as("id_b"), col("cell"),
      col("__qv").as("__vb"), col("__qn").as("__nb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        cosineFromQuantized(col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  // ---- random-hyperplane (SRP) LSH ----------------------------------------

  /** Deterministic signed-random-projection hyperplane matrix: `bits × dims`
    * small integer weights in [-500, 500], derived position-wise from a
    * DOUBLE FNV-1a 64 of the flat index (`Fnv1a64Ops.hashLong` twice) — no
    * RNG state, so the family is reproducible across runs, engines (the
    * oracle re-derives it from the same folds in HUGEINT SQL), and cluster
    * topologies. The second fold matters: one FNV pass over sequential
    * integers diffuses poorly (inputs i·dims+d and (i+1)·dims+d differ in
    * one byte, so hyperplane rows came out CORRELATED, sign patterns
    * repeated with the row period, and band buckets filled with
    * structurally identical keys — the sf1 scale run caught candidate
    * counts growing 95x on 10x data from exactly this). Re-hashing the
    * first hash's eight well-mixed bytes gives full avalanche between
    * rows. Integer weights × scaled-long vectors keep every dot product
    * exact (≤ 2^53), so the sign bits are bit-identical everywhere — float
    * hyperplanes would make the signature engine-dependent at the sign
    * boundary.
    */
  private[graft] def hyperplaneWeights(bits: Int, dims: Int): Array[Array[Long]] =
    Array.tabulate(bits, dims) { (i, d) =>
      import graft.plans.Fnv1a64Ops.{hashLong, Offset}
      val h = hashLong(Offset, hashLong(Offset, i.toLong * dims + d))
      ((h % 1001) + 1001) % 1001 - 500
    }

  /** Random-hyperplane LSH near-duplicate pairs — the SECOND ANN scale tier
    * next to the IVF cells of [[cosineNearDups]]: signatures are
    * data-independent (no centroid fit, no second pass over the corpus; new
    * rows band with one projection), which is the right shape for streaming
    * ingestion, while IVF adapts to the corpus but needs its centroids
    * maintained.
    *
    * Per row: `bits` sign bits of W·v (Charikar-style SRP — two
    * vectors agree on a bit with probability 1 − θ/π), packed into
    * `bands` integer band keys of `bits/bands` bits each. Candidates meet
    * only inside equal (band, key) groups — an equi-join, never all-pairs —
    * and are then verified with the exact scaled-integer cosine, so
    * banding affects RECALL only, never precision. Wider bands cut random
    * collisions exponentially (8-bit bands pass ~1/256 of unrelated pairs
    * per band) at the cost of recall for mid-similarity pairs: this tier
    * targets the high-cosine regime; use the IVF tier for looser matches.
    * The constant-folded weight literal keeps the per-row cost at
    * `bits × dims` long multiplies inside codegen.
    *
    * Output: (id_a, id_b, cosine), id_a < id_b, cosine ≥ minCosine.
    */
  def srpNearDups(corpus: DataFrame, id: String, vec: String, dims: Int,
                  bits: Int, bands: Int, minCosine: Double,
                  scale: Double = DefaultScale): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val rpb = bits / bands
    // Static arithmetic where it pays, bounded expression size where it
    // must: the sf1 scale run measured the interpreted higher-order
    // functions dominating this operator (band-key aggregates and the
    // per-candidate verify dot cost more than every join), so band keys
    // and verify dots are unrolled into codegen multiply-add chains. The
    // `bits` hyperplane dots stay one `transform` over the literal weight
    // matrix — fully unrolling those too (bits × dims literal terms) blew
    // the plan past the driver's memory in optimizer tree copies. Same
    // integer arithmetic, same bits, same keys — the oracle replay is
    // untouched.
    val w = array(hyperplaneWeights(bits, dims).toIndexedSeq.map(row =>
      array(row.toIndexedSeq.map(lit): _*)): _*) // foldable -> one array constant
    // one quantization pass, pinned: banded (below) and both verify join
    // sides consume this frame, and without the checkpoint each consumer
    // re-runs the parquet scan + interpreted quantize transform. Stored
    // rows are (id, dims longs, long) — the quantized vector table itself,
    // the same order of size as the input column
    val vecs = corpus
      .select(col(id).as("__id"), quantize(col(vec), scale).as("__qv"))
      .withColumn("__qn", dotLongStatic(col("__qv"), col("__qv"), dims))
      .localCheckpoint(false)
    val sig = vecs
      .withColumn("__bits", transform(sequence(lit(0), lit(bits - 1)), i =>
        when(dotLong(col("__qv"), element_at(w, i + lit(1))) >= 0, lit(1L))
          .otherwise(lit(0L))))
    def bandKey(b: Int): Column =
      (0 until rpb).map(j =>
        element_at(col("__bits"), b * rpb + j + 1) * lit(1L << j))
        .reduce(_ + _)
    // LAZY checkpoint before the self-join: both join sides reference the
    // banded frame, and without pinning it each side would recompute the
    // full signature pipeline (quantize + bits hyperplane dots) — measured
    // as 2x the whole signature cost at sf1, dominating the query. The
    // checkpoint materializes inside the first consuming job; rows are
    // (id, band, key) — n·bands longs, negligible storage at any scale.
    val banded = sig.select(col("__id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("bkey"))): _*)).as("__bb"))
      .select(col("__id"), col("__bb.band"), col("__bb.bkey"))
      .localCheckpoint(false)
    // ids-only candidate distinct, then ONE join back for vectors: carrying
    // __qv through the band explode would shuffle each vector `bands` times
    val cand = banded.select(col("__id").as("id_a"), col("band"), col("bkey"))
      .join(banded.select(col("__id").as("id_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(vecs.select(col("__id").as("id_a"), col("__qv").as("__va"),
        col("__qn").as("__na")), Seq("id_a"))
      .join(vecs.select(col("__id").as("id_b"), col("__qv").as("__vb"),
        col("__qn").as("__nb")), Seq("id_b"))
      .withColumn("cosine",
        dotLongStatic(col("__va"), col("__vb"), dims) /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  // ---- deterministic distributed k-means (Lloyd) --------------------------

  /** Per-row argmax-cosine assignment against DRIVER-SIDE centroids,
    * compiled into the plan as literals: for each centroid a
    * `cosineFromQuantized` column (the centroid vector and self-dot fold to
    * constants), then `greatest(struct(cos, -cell)…)` picks max cosine with
    * lower-cell tiebreak. A pure projection — whole-stage codegen, ZERO
    * shuffle, no join: this is why the fit collects its k·dims centroid
    * state per iteration (MLlib's shape) instead of keeping centroids in a
    * frame — a window/aggregation argmax would re-shuffle the corpus every
    * iteration. Output: (__id, __qv, __qn, cell, __cos).
    */
  private def assignLiteral(q: DataFrame,
                            cent: Seq[(Int, Array[Long])]): DataFrame = {
    val scored = cent.map { case (cell, cv) =>
      val cvCol = array(cv.map(lit).toIndexedSeq: _*)
      val cn = lit(cv.map(x => x * x).sum) // exact: |c|² ≤ dims·scale² < 2^53
      struct(
        cosineFromQuantized(col("__qv"), cvCol, col("__qn"), cn).as("c"),
        lit(-cell).as("nc"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    q.withColumn("__best", best)
      .select(col("__id"), col("__qv"), col("__qn"),
        (-col("__best.nc")).as("cell"), col("__best.c").as("__cos"))
  }

  /** driver-side (cell, centroid) extraction of a centroid frame */
  private def collectCentroids(cent: DataFrame): Seq[(Int, Array[Long])] =
    cent.select(col("cell"), col("centroid")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1).toSeq

  /** Deterministic distributed k-means (fixed-iteration Lloyd) over an
    * embedding column. Returns the fitted centroids as `(cell: int,
    * centroid: array<long>)` scaled-long vectors, usable directly by
    * [[kmeansAssign]] / [[semanticDedupVerdict]].
    *
    * Everything an MLlib-style fit leaves to RNG state or thread timing is
    * pinned down so two runs — or two engines — agree bit-for-bit:
    *
    *  - '''init''': the k corpus rows first in `(fnv1a64(id), id)` order, a
    *    stable pseudo-random draw. `orderBy().limit(k)` plans as
    *    TakeOrderedAndProject — per-partition top-k then a k·P driver merge,
    *    never a global sort of the corpus;
    *  - '''assignment''': max quantized-integer cosine, lower cell on ties
    *    (cosines are doubles derived from exact ints — bit-identical in any
    *    IEEE engine);
    *  - '''update''': per-dimension LONG sums of the scaled vectors
    *    (associative — safe under any partial-aggregation order), then
    *    `sign(s) · (|s| div n)` — integer division on a non-negative
    *    numerator, where Spark's `div` (truncation) and DuckDB's `//`
    *    (truncation) provably agree. The mean-of-scaled-values stays at
    *    vector magnitude, so centroid self-dots never overflow (a raw SUM
    *    centroid squares to > 2^63 once cells pass ~10^4 rows);
    *  - '''empty cells''' keep their previous centroid, so k never
    *    silently shrinks.
    *
    * Scale shape — the corpus is NEVER shuffled, matching MLlib's Lloyd:
    * centroid state is k·dims longs, driver-sized by construction (the
    * same class of driver-side state as ConnectedComponents' convergence
    * scalar), collected once per iteration and re-entering the next pass
    * as fold-to-constant literals. Per iteration: one corpus scan, the
    * literal argmax projection (codegen, no shuffle), and one (cell, dim)
    * aggregation whose exchange carries k·dims rows per partition after
    * map-side combine. Iterations are eager (one action each) — at scale,
    * persist the corpus projection before fitting to avoid re-scanning.
    */
  def kmeansFit(corpus: DataFrame, id: String, vec: String, k: Int,
                iters: Int, scale: Double = DefaultScale): DataFrame = {
    val fitted = kmeansFitSeq(corpus, id, vec, k, iters, scale)
    val spark = corpus.sparkSession
    import spark.implicits._
    fitted.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "centroid")
  }

  /** [[kmeansFit]] keeping the centroids as the driver-side Seq they
    * already are — callers composing further passes ([[semanticDedupVerdict]])
    * skip the frame round-trip (materialize + collect) entirely.
    */
  private def kmeansFitSeq(corpus: DataFrame, id: String, vec: String,
                           k: Int, iters: Int,
                           scale: Double): Seq[(Int, Array[Long])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val q = prep(corpus, id, vec, "__id", scale)
    // TakeOrderedAndProject: per-partition top-k, k·P merged on the driver
    val seeds = q
      .withColumn("__h", graft.plans.Fnv1a64Expression.fnv1a64(col("__id")))
      .orderBy(col("__h"), col("__id")).limit(k)
      .select(col("__qv")).collect()
    val cent0: Seq[(Int, Array[Long])] = seeds.zipWithIndex.map {
      case (r, i) => (i + 1) -> r.getSeq[Long](0).toArray }.toSeq
    val fitted = (1 to iters).foldLeft(cent0) { (cent, _) =>
      val updated = assignLiteral(q, cent)
        .select(col("cell"), posexplode(col("__qv")).as(Seq("__dim", "__x")))
        .groupBy("cell", "__dim")
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .withColumn("__c",
          when(col("__s") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr("abs(__s) div __n"))
        .groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("__dim"), col("__c")))),
          e => e.getField("__c")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
      cent.map { case (c, old) => c -> updated.getOrElse(c, old) }
    }
    fitted
  }

  /** Assignment against fitted centroids: (id, cell, cosine) — the cosine is
    * to the OWNING centroid (the max, by construction). The centroid frame
    * is collected (k·dims driver-sized state) and applied as a literal
    * argmax projection — no shuffle, no join.
    */
  def kmeansAssign(corpus: DataFrame, id: String, vec: String,
                   centroids: DataFrame,
                   scale: Double = DefaultScale): DataFrame =
    assignLiteral(prep(corpus, id, vec, "__id", scale),
        collectCentroids(centroids))
      .select(col("__id").as(id), col("cell"), col("__cos").as("cosine"))

  /** SemDeDup-style semantic dedup: fit k cells ([[kmeansFit]]), then inside
    * each cell drop every row that has a SMALLER-id neighbor with cosine ≥
    * `minCosine` (greedy min-id pruning, per-pair — not the transitive
    * closure: in a chain a~b~c with cos(a,c) < τ, b and c both drop but a
    * stays, which is the per-ε-ball "keep one representative" verdict, not
    * a duplicate CLUSTERING — ConnectedComponents is the closure tool).
    * Output: (id, cell, centroid_cosine, keep: int, dup_of: long|null).
    *
    * Scale shape: assignment is the shuffle-free literal projection; the
    * ONLY corpus shuffle is the cell-bucketed pair join — Σ|cell|² like
    * [[cosineNearDups]], but over centroids fitted to the corpus rather
    * than supplied, so cells track the actual density (the SemDeDup paper's
    * within-cluster pruning). Nothing is ever all-pairs.
    */
  def semanticDedupVerdict(corpus: DataFrame, id: String, vec: String,
                           k: Int, iters: Int, minCosine: Double,
                           scale: Double = DefaultScale): DataFrame = {
    val cent = kmeansFitSeq(corpus, id, vec, k, iters, scale)
    val assigned = assignLiteral(prep(corpus, id, vec, "__id", scale), cent)
    val a = assigned.select(col("__id").as("id_a"), col("cell"),
      col("__qv").as("__va"), col("__qn").as("__na"))
    val b = assigned.select(col("__id").as("id_b"), col("cell"),
      col("__qv").as("__vb"), col("__qn").as("__nb"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("id_b") < col("id_a"))
      .withColumn("__pc",
        cosineFromQuantized(col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("__pc") >= minCosine)
      .groupBy(col("id_a").as("__did"))
      .agg(min(col("id_b")).as("dup_of"))
    assigned
      .join(dups, col("__id") === col("__did"), "left")
      .select(col("__id").as(id), col("cell"),
        col("__cos").as("centroid_cosine"),
        col("dup_of").isNull.cast("int").as("keep"), col("dup_of"))
  }

  // ---- two-stage quantized re-rank ----------------------------------------

  /** Coarse-then-exact top-k: a first pass over vectors quantized at
    * `coarseScale` (default 1e2 — int8-range values, an 8× smaller scan
    * than the 1e6 working precision) selects `m·k` candidates per query;
    * only those rejoin the full-precision vectors for the exact re-rank.
    * This is the memory-tier ANN shape: at 100 TB the coarse copy is the
    * one that stays hot (RAM/SSD), the full-precision corpus is touched
    * for k·m rows per query via an equi-join on the id — never scanned.
    *
    * The coarse pass RANKS (it never thresholds), so like every banding
    * tier here it affects recall only: a true neighbor is missed only if
    * ranked below m·k coarsely. With m·k ≥ |corpus| the result provably
    * equals [[knnExact]] (spec-pinned). Ties at both stages break on the
    * lower neighbor id; all arithmetic is the exact-int cosine at the two
    * scales, so both stages are hash-checked cross-engine.
    *
    * `coarseScale` must keep every vector nonzero (a vector quantizing to
    * all-zeros would make its coarse cosine 0/0 = NaN); 1e2 holds for any
    * roughly-unit-norm embedding family.
    */
  def knnRerank(corpus: DataFrame, queries: DataFrame,
                corpusId: String, corpusVec: String,
                queryId: String, queryVec: String,
                k: Int, m: Int, coarseScale: Double = 1e2,
                scale: Double = DefaultScale): DataFrame = {
    require(k >= 1 && m >= 1, s"k and m must be >= 1, got k=$k m=$m")
    val cCoarse = prep(corpus, corpusId, corpusVec, "neighbor_id", coarseScale)
      .withColumnRenamed("__qv", "__cv").withColumnRenamed("__qn", "__cn")
    val qCoarse = prep(queries, queryId, queryVec, "query_id", coarseScale)
    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("__ccos").desc, col("neighbor_id"))
    val cand = cCoarse.crossJoin(broadcast(qCoarse))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__ccos",
        cosineFromQuantized(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("__crn", row_number().over(wCoarse))
      .filter(col("__crn") <= k.toLong * m)
      .select("query_id", "neighbor_id")
    val cFull = prep(corpus, corpusId, corpusVec, "neighbor_id", scale)
      .withColumnRenamed("__qv", "__cv").withColumnRenamed("__qn", "__cn")
    val qFull = prep(queries, queryId, queryVec, "query_id", scale)
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(cFull, Seq("neighbor_id"))
      .join(broadcast(qFull), Seq("query_id"))
      .withColumn("cosine",
        cosineFromQuantized(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** DuckDB SQL text for the identical scaled-integer dot product. */
  /** DuckDB multiplies FLOAT×DOUBLE in float precision — the element must be
    * cast to DOUBLE first to match Spark's float→double promotion. */
  def dotSqlText(a: String, b: String, scale: Double = DefaultScale): String =
    s"CAST(list_sum([CAST(floor(CAST(($a)[i] AS DOUBLE)*$scale + 0.5) AS BIGINT)" +
      s"*CAST(floor(CAST(($b)[i] AS DOUBLE)*$scale + 0.5) AS BIGINT) " +
      s"FOR i IN range(1, len($a)+1)]) AS BIGINT)"

  /** DuckDB SQL text for the identical cosine (exact ints → IEEE sqrt/div). */
  def cosineSqlText(a: String, b: String, scale: Double = DefaultScale): String =
    s"(${dotSqlText(a, b, scale)} / (sqrt(CAST(${dotSqlText(a, a, scale)} AS DOUBLE))" +
      s" * sqrt(CAST(${dotSqlText(b, b, scale)} AS DOUBLE))))"

  /** [[dotSqlText]] for lists that are ALREADY scaled longs (BIGINT lists),
    * e.g. the k-means centroid vectors the oracle CTEs carry.
    */
  def dotLongSqlText(a: String, b: String): String =
    s"CAST(list_sum([($a)[i]*($b)[i] FOR i IN range(1, len($a)+1)]) AS BIGINT)"

  /** [[cosineSqlText]] over BIGINT lists. */
  def cosineLongSqlText(a: String, b: String): String =
    s"(${dotLongSqlText(a, b)} / (sqrt(CAST(${dotLongSqlText(a, a)} AS DOUBLE))" +
      s" * sqrt(CAST(${dotLongSqlText(b, b)} AS DOUBLE))))"
}
