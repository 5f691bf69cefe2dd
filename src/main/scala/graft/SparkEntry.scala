package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query catalog: each entry in [[queries]] is checked by the
  * driver against the DuckDB SQL in [[oracleSql]] (same key) on the same
  * parquet tables; entries without an oracle get a rows-only check.
  */
object SparkEntry {
  private val catalogs: Seq[Catalog] =
    Seq(Relational, GeoQueries, DataPipelineQueries, ParityQueries,
      AdvancedOps, CorpusOps, CurationOps, RetrievalOps, AnalyticsOps, LmOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    catalogs.flatMap(_.oracles).toMap
}
