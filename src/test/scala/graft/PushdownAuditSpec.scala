package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Scan-efficiency audit: filters must reach the parquet reader as
  * PushedFilters, and projections must prune the scan's requiredSchema —
  * at 100 TB the difference between "read 5 columns of the filtered row
  * groups" and "read everything, filter later" IS the query time. Asserted
  * on the FileSourceScanExec nodes themselves (the plan STRING truncates
  * long schemas).
  */
class PushdownAuditSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collect { case f: FileSourceScanExec => f }.toSeq
  }

  private def scansOf(name: String): Seq[FileSourceScanExec] =
    scans(SparkEntry.queries(name)(spark, sfDir))

  test("q02's source filters are pushed to the parquet scan") {
    val Seq(scan) = scansOf("q02_filter_scan")
    val pushed = scan.metadata("PushedFilters")
    Seq("l_quantity", "l_returnflag", "l_shipdate").foreach { c =>
      assert(pushed.contains(c), s"expected pushdown on $c, got: $pushed")
    }
  }

  test("q02's scan reads only the 6 referenced columns of 16") {
    val Seq(scan) = scansOf("q02_filter_scan")
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read === Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity", "l_returnflag", "l_shipdate"), read.toString)
  }

  test("q03: dimension filter pushes; lineitem prunes to 3 columns") {
    val all = scansOf("q03_top_revenue_orders")
    val cust = all.filter(_.requiredSchema.fieldNames.contains("c_mktsegment"))
    assert(cust.nonEmpty)
    assert(cust.head.metadata("PushedFilters").contains("c_mktsegment"))
    val li = all.filter(_.requiredSchema.fieldNames.contains("l_orderkey"))
    assert(li.nonEmpty)
    assert(li.head.requiredSchema.fieldNames.toSet ===
      Set("l_orderkey", "l_extendedprice", "l_discount"),
      li.head.requiredSchema.fieldNames.mkString(","))
  }

  test("q28's document scan reads only the columns it uses") {
    val docScans = scansOf("q28_text_stats")
      .filter(_.requiredSchema.fieldNames.contains("text"))
    assert(docScans.nonEmpty)
    docScans.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.contains("source"), read.toString)
    }
  }

  test("q79: the box predicate reaches the z-clustered parquet as PushedFilters") {
    // the whole point of the z-order layout is that the RE-READ scan can
    // skip row groups via lat/lon min-max stats — which only happens when
    // both range predicates arrive at the reader as pushed filters
    val reread = scansOf("q79_zorder_box")
      .filter(_.requiredSchema.fieldNames.contains("lat"))
    assert(reread.nonEmpty, "no scan over the clustered files found")
    val pushed = reread.head.metadata("PushedFilters")
    Seq("lat", "lon").foreach { c =>
      assert(pushed.contains(s"GreaterThanOrEqual($c") &&
        pushed.contains(s"LessThanOrEqual($c"),
        s"expected both range bounds pushed for $c, got: $pushed")
    }
  }
}
