package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** S3 (SURVEY §2): a filter on the Hive partition column must become a
  * PartitionFilter — directory pruning at planning — not a row-level
  * post-scan filter. This is what makes the reference's `date=` reads cheap
  * at 100 TB: Spark lists one directory out of N.
  */
class PartitionedScanSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("event_date filter is a partition filter, not a data filter") {
    val scan = Tables.eventsPartitioned(spark, sfDir)
      .filter(col("event_date") === to_date(lit("2024-01-15")))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(event_date"),
      s"expected a non-empty PartitionFilters clause in:\n$physical")
    // and the pruned scan reads exactly the one day
    val days = scan.select(date_format(col("event_date"), "yyyy-MM-dd"))
      .distinct().as[String].collect().toSeq
    assert(days === Seq("2024-01-15"))
  }

  test("partitioned copy round-trips the flat table exactly") {
    val flat = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    val part = Tables.eventsPartitioned(spark, sfDir)
      .select(flat.columns.map(col): _*)
    assert(part.count() === flat.count())
    assert(part.except(flat).isEmpty && flat.except(part).isEmpty)
  }
}
