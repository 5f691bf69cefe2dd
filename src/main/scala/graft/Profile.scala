package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the dup-cluster chain:
  * `scripts/run.sh graft.Profile [sfDir]` times the q54 pipeline's pieces
  * separately — shingle/candidate generation, Jaccard verify, connected
  * components — so a wall-time regression can be attributed to a stage
  * instead of guessed at.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // stage 1: pair generation (candidates + exact verify together)
    val pairs = graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.1, maxShingleDf = 5L)
      .select(col("id_a"), col("id_b"))
    timed("jaccardPairs count")(println("pairs = " + pairs.count()))
    timed("jaccardPairs again (no reuse)")(pairs.write.format("noop")
      .mode("overwrite").save())
    // stage 2: CC on the materialized pair list (isolates CC cost)
    val pinned = pairs.cache()
    pinned.count()
    timed("CC on cached pairs") {
      graft.operators.ConnectedComponents.run(pinned, "id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    pinned.unpersist()
    // stage 3: the full q54 as the catalog runs it
    timed("full q54") {
      SparkEntry.queries("q54_dup_clusters")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
