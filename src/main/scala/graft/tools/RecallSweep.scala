package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.sources.Tables

/** One-off diagnostic: mean recall@10 of the ANN tiers (IVF / plain PQ /
  * IVF-PQ at several nprobe values) on one sf dir — the measurement behind
  * q152's byte-budget claim. Usage: run.sh graft.tools.RecallSweep <sfDir>
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val vecs = Tables.embeddings(spark, d)
    val qs = vecs.filter(col("vec_id") % 50 === 0)
    val cents = vecs.filter(col("vec_id") % 50 === 7)
    val nCells = cents.count()
    val exact = graft.ext.Caches.pin(Similarity.knnExact(vecs, qs,
      "vec_id", "embedding", "vec_id", "embedding", k = 10))
    def mean(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(exact, approx, "query_id", "neighbor_id", 10)
        .agg(avg("recall_permille")).head().getDouble(0)

    val cbPlain = Similarity.collectCodebooks(Similarity.pqFit(
      vecs, "vec_id", "embedding", m = 4, kc = 8, iters = 2))
    println(f"cells=$nCells plainPQ=${mean(Similarity.pqTopK(vecs, qs,
      "vec_id", "embedding", "vec_id", "embedding", cbPlain, 10))}%.0f")

    val cbRes = Similarity.collectCodebooks(Similarity.pqFitResiduals(
      vecs, "vec_id", "embedding", cents, "vec_id", "embedding",
      m = 4, kc = 8, iters = 2))
    for (np <- Seq(3, 5, 8, nCells.toInt)) {
      println(f"ivfpq(data-vec cents) nprobe=$np recall=${mean(
        Similarity.ivfPqTopK(
          vecs, qs, "vec_id", "embedding", "vec_id", "embedding",
          cents, "vec_id", "embedding", cbRes, 10, np))}%.0f")
    }

    val km = Similarity.kmeansFit(vecs, "vec_id", "embedding",
      k = nCells.toInt, iters = 2)
    val cbKm = Similarity.collectCodebooks(Similarity.pqFitResidualsKm(
      vecs, "vec_id", "embedding", km, m = 4, kc = 8, iters = 2))
    for (np <- Seq(3, 5, 8, nCells.toInt)) {
      println(f"ivfpq(kmeans cents) nprobe=$np recall=${mean(
        Similarity.ivfPqTopKKm(
          vecs, qs, "vec_id", "embedding", "vec_id", "embedding",
          km, cbKm, 10, np))}%.0f")
    }
    spark.stop()
  }
}
