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
}
