package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.plans.GraftExtensions

/** The native single-pass SimHash expression must be bit-identical to the
  * explode+aggregate formulation, under both codegen and interpreted eval,
  * and callable from SQL via the session extension.
  */
class SimHashExpressionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "sphinx of black quartz judge my vow"),
    (5L, "sphinx of black quartz judge my vow now")
  ).toDF("doc_id", "text")

  test("native expression equals the aggregation formulation bit-for-bit") {
    val agg = Dedup.simHash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val native = Dedup.simHash64Native(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(native === agg)
    assert(native(1L) === native(2L)) // identical docs, identical fingerprints
  }

  test("codegen and interpreted evaluation agree") {
    val withCodegen = Dedup.simHash64Native(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = Dedup.simHash64Native(docs, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(interpreted === withCodegen)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("graft_simhash64 is callable from SQL once registered") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_simhash64(array('the', 'quick', 'brown')) AS h")
      .collect().head.getLong(0)
    val viaApi = Seq(Tuple1(Seq("the", "quick", "brown"))).toDF("t")
      .select(graft.plans.SimHash64Expression.simhash64($"t"))
      .as[Long].head()
    assert(viaSql === viaApi)
  }

  test("graft_fnv1a64 and graft_topk_by are callable from SQL") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_fnv1a64('abc') AS h")
      .collect().head.getLong(0)
    val viaApi = Seq(Tuple1("abc")).toDF("t")
      .select(graft.plans.Fnv1a64Expression.fnv1a64($"t")).as[Long].head()
    assert(viaSql === viaApi)
    spark.range(100)
      .select((col("id") % 5).as("g"),
        (col("id") * 7 % 31).cast("double").as("s"), col("id").as("i"))
      .createOrReplaceTempView("topk_in")
    val top = spark.sql(
      """SELECT g, graft_topk_by(s, i, 2) AS top FROM topk_in GROUP BY g""")
      .select(col("g"), explode(col("top")))
      .select("g", "col.score", "col.id").as[(Long, Double, Long)]
      .collect().toSet
    // group 0: scores id*7%31 over ids 0,5,..95 — spot-check contract holds
    assert(top.size === 10) // 5 groups x k=2
    assert(top.groupBy(_._1).forall(_._2.size == 2))
  }

  test("graft_topk_by k accepts any foldable integral, rejects the rest") {
    GraftExtensions.register(spark)
    spark.range(10)
      .select(lit(0L).as("g"), col("id").cast("double").as("s"),
        col("id").as("i"))
      .createOrReplaceTempView("topk_kinds")
    // BIGINT literal, explicit cast, and a constant-folded expression are
    // all legitimate SQL spellings of a constant k
    for (kSql <- Seq("2L", "CAST(2 AS INT)", "1 + 1")) {
      val n = spark.sql(
        s"SELECT graft_topk_by(s, i, $kSql) AS top FROM topk_kinds GROUP BY g")
        .select(explode(col("top"))).count()
      assert(n === 2, s"k spelled as $kSql")
    }
    // non-constant and non-integral k fail as ANALYSIS errors (position-
    // carrying), not as internal builder crashes
    for (bad <- Seq("i", "2.5", "'two'", "0")) {
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          s"SELECT graft_topk_by(s, i, $bad) AS top FROM topk_kinds GROUP BY g")
          .collect()
      }
    }
  }
}
