package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Skew

class SkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // one hot key (k=1 gets 90% of rows), several cold ones
  private lazy val facts = ((1 to 900).map(i => (1L, i.toLong)) ++
    (1 to 100).map(i => ((i % 5 + 2).toLong, i.toLong))).toDF("k", "v")
  private lazy val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e"), (9L, "unused")).toDF("k", "name")

  test("salted aggregate equals plain aggregate") {
    val plain = facts.groupBy("k")
      .agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
    val salted = Skew.saltedAggregate(facts, Seq("k"), saltBuckets = 8,
      partial = Seq(sum("v").as("v_sum"), count(lit(1)).as("n")),
      merge = Seq(sum("v_sum").as("v_sum"), sum("n").as("n")))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join equals plain join (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = facts.join(dim, Seq("k"), jt)
      val salted = Skew.saltedJoin(facts, dim, Seq("k"), saltBuckets = 8, jt)
      assert(salted.count() === plain.count(), jt)
      assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty, jt)
    }
  }

  test("salted join bounds max-task shuffle read on a planted hot key") {
    // the PERFORMANCE claim, measured — not just result equivalence: plant
    // 50% of fact rows on one key, force the shuffled-join path (broadcast
    // off, AQE off so its skew splitting can't mask what the salt does),
    // and compare per-task shuffle-read records on the join stage.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val sc = spark.sparkContext
    class ShuffleReadListener extends SparkListener {
      val reads = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          reads.add((te.stageId, m.shuffleReadMetrics.recordsRead))
      }
    }
    // per-task shuffle-read records of the heaviest-read stage (= the join)
    def measure(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val l = new ShuffleReadListener
      sc.addSparkListener(l)
      try {
        df.write.format("noop").mode("overwrite").save()
        // the listener bus is async: wait until events stop arriving
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var last = -1
        while (System.nanoTime() < deadline && l.reads.size() != last) {
          last = l.reads.size(); Thread.sleep(200)
        }
        import scala.jdk.CollectionConverters._
        l.reads.asScala.toSeq.groupBy(_._1).values.maxBy(_.map(_._2).sum)
          .map(_._2)
      } finally sc.removeSparkListener(l)
    }
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val bigFacts = spark.range(200000).select(
        when(col("id") % 2 === 0, 0L)
          .otherwise(col("id") % 997 + 1).as("k"),
        col("id").as("v"))
      val bigDim = spark.range(0, 998).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      def ratio(xs: Seq[Long]): Double =
        xs.max.toDouble / (xs.sum.toDouble / xs.size)
      val plainRatio = ratio(measure(bigFacts.join(bigDim, Seq("k"))))
      val saltedRatio = ratio(measure(
        Skew.saltedJoin(bigFacts, bigDim, Seq("k"), saltBuckets = 16)))
      // the skew is real: the hot key pins one reducer well above the mean
      assert(plainRatio > 1.8, s"fixture not skewed enough: $plainRatio")
      // the salt works: no task reads more than 2x the mean
      assert(saltedRatio <= 2.0,
        s"salted max-task read $saltedRatio x mean (plain was $plainRatio)")
      assert(saltedRatio < plainRatio)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
