package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Schemas

class SchemasSpec extends AnyFunSuite with SparkTestBase {
  import Fixtures._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-schemas").toString
    eventsDf(spark, Seq(msg(1L, "2022-06-01 10:00:00", -33.87, 151.21)))
      .write.parquet(s"$d/events")
    geoDf(spark).write.parquet(s"$d/geo")
    d
  }

  test("strict readers accept reference-shaped parquet") {
    assert(Schemas.readEventsStrict(spark, s"$dir/events").count() === 1)
    assert(Schemas.readGeoStrict(spark, s"$dir/geo").count() === 5)
  }

  test("a missing nested field fails at read time, not mid-query") {
    val broken = s"$dir/events_broken"
    spark.read.parquet(s"$dir/events")
      .withColumn("event", struct(col("event.message_from")))
      .write.parquet(broken)
    val e = intercept[IllegalArgumentException] {
      Schemas.readEventsStrict(spark, broken)
    }
    assert(e.getMessage.contains("event.message_to"))
  }

  test("an incompatibly-typed column fails with the offending path") {
    val broken = s"$dir/geo_broken"
    spark.read.parquet(s"$dir/geo")
      .withColumn("lat", col("lat").cast("string"))
      .write.parquet(broken)
    val e = intercept[IllegalArgumentException] {
      Schemas.readGeoStrict(spark, broken)
    }
    assert(e.getMessage.contains("'lat'") && e.getMessage.contains("string"))
  }
}
