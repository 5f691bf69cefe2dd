package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.Dedup
import graft.sources.Tables

/** Throwaway profiling main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val docs = Tables.documents(spark, d)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }

    val (num, den, permille) = (1L, 2L, 100L)
    val tf = docs
      .select(col("doc_id"), explode(split(Dedup.normalizeText(col("text")), " ")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("doc_id"), col("__t")).agg(count(lit(1)).as("__tf"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val kept = tf.join(
      tf.groupBy("__t").agg(count(lit(1)).as("__df"))
        .crossJoin(broadcast(nDocs))
        .filter(col("__df") * 1000 <= col("__n") * permille),
      Seq("__t")).cache()
    time("kept-postings") { kept.count() }
    val byDocRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("__df"), col("__t"))
    val gen = kept
      .withColumn("__s2", sum(col("__tf") * col("__tf")).over(
        byDocRarity.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("__n2", sum(col("__tf") * col("__tf")).over(
        Window.partitionBy(col("doc_id"))))
      .filter(lit(den) * col("__s2") >= lit(num) * col("__n2"))
      .cache()
    time("prefix-postings") { gen.count() }
    val joined = gen.select(col("doc_id").as("id_a"), col("__t"),
        col("__s2").as("__s2a"), col("__n2").as("__n2a"))
      .join(gen.select(col("doc_id").as("id_b"), col("__t"),
        col("__s2").as("__s2b"), col("__n2").as("__n2b")), Seq("__t"))
      .filter(col("id_a") < col("id_b"))
    time("join-rows-surviving-positional") {
      joined.filter(lit(den) * col("__s2a") * col("__s2b") >=
        lit(num) * col("__n2a") * col("__n2b")).count()
    }
    time("distinct-candidates") {
      joined.filter(lit(den) * col("__s2a") * col("__s2b") >=
        lit(num) * col("__n2a") * col("__n2b"))
        .select("id_a", "id_b").distinct().count()
    }
    spark.stop()
  }
}
