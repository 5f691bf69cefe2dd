package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The bucketed fact-dim join must plan with ZERO Exchange: both sides are
  * pre-bucketed (and sorted) on the join key, so the sort-merge join reads
  * co-located buckets directly — the shuffle the plain join pays on every
  * run is paid once at table-build time instead. This is the q52 plan
  * contract at any scale factor.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed join plans with no Exchange on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast so the assertion exercises the bucketed
      // sort-merge path, not a broadcast that skips shuffles trivially
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (o, c) = Tables.bucketedOrdersCustomer(spark, sfDir)
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_mktsegment"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // and it is not just an empty plan: results match the plain join
      val plain = Tables.orders(spark, sfDir).join(
          Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      assert(joined.except(plain).isEmpty && plain.except(joined).isEmpty)
      assert(joined.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketed tables re-register idempotently in one session") {
    val (o1, _) = Tables.bucketedOrdersCustomer(spark, sfDir)
    val (o2, _) = Tables.bucketedOrdersCustomer(spark, sfDir)
    assert(o1.count() === o2.count())
  }
}
