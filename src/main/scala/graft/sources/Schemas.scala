package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit schemas for the reference-shaped tables (SURVEY.md §1) and
  * strict readers that fail fast on malformed input.
  *
  * The reference reads everything schema-on-read (`spark.read.parquet`, no
  * schema — project_step_1.py:8-16); [[Tables]] preserves that as the
  * default. These strict variants pin the expected shape instead: at 100 TB
  * a silently-widened column or a missing struct field should fail the job
  * at planning time, not produce nulls three joins later.
  */
object Schemas {

  /** the nested `event` struct of the messenger lake (SURVEY §1) */
  val eventStruct: StructType = StructType(Seq(
    StructField("message_from", LongType),
    StructField("message_to", LongType),
    StructField("message_id", LongType),
    StructField("message_ts", StringType),
    StructField("datetime", StringType),
    StructField("reaction_from", LongType),
    StructField("user", LongType),
    StructField("subscription_channel", StringType)))

  /** reference `events` table: nested struct + type + coordinates + date */
  val events: StructType = StructType(Seq(
    StructField("event", eventStruct),
    StructField("event_type", StringType, nullable = false),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("date", DateType)))

  /** reference `geo` city dimension */
  val geo: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false)))

  /** Read with a pinned schema. Parquet is schema-checked lazily per file,
    * so [[validate]] is applied up front: a missing column or an
    * incompatible type raises immediately.
    */
  def readEventsStrict(spark: SparkSession, path: String): DataFrame =
    validated(spark.read.schema(events).parquet(path), events, path)

  def readGeoStrict(spark: SparkSession, path: String): DataFrame =
    validated(spark.read.schema(geo).parquet(path), geo, path)

  /** Fail fast when the on-disk schema cannot supply every expected field
    * with a compatible type (nested structs included).
    */
  def validate(actual: StructType, expected: StructType, where: String): Unit = {
    def check(a: DataType, e: DataType, path: String): Unit = (a, e) match {
      case (as: StructType, es: StructType) =>
        es.fields.foreach { ef =>
          as.fields.find(_.name == ef.name) match {
            case None => throw new IllegalArgumentException(
              s"$where: missing column '$path${ef.name}'")
            case Some(af) => check(af.dataType, ef.dataType, s"$path${ef.name}.")
          }
        }
      case _ =>
        if (a != e) throw new IllegalArgumentException(
          s"$where: column '${path.dropRight(1)}' is ${a.simpleString}, " +
            s"expected ${e.simpleString}")
    }
    check(actual, expected, "")
  }

  private def validated(df: DataFrame, expected: StructType,
                        path: String): DataFrame = {
    // read the footer schema without the pinned one masking drift
    val onDisk = df.sparkSession.read.parquet(path).schema
    validate(onDisk, expected, path)
    df
  }
}
