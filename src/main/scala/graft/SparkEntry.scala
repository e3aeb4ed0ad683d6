package graft

import graft.queries.{AnalyticsQueries, DecisionSupportQueries, ExtensionQueries, LakeQueries, LlmQueries, MultimodalQueries, RelationalQueries, StatsQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract (see SURVEY.md §7): one entry per implemented operator
 * from SURVEY §2, each with a DuckDB-runnable oracle over the same parquet
 * tables. Query definitions live in `graft.queries.*`, grouped by layer.
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ LlmQueries.all ++ ExtensionQueries.all ++
      MultimodalQueries.all ++ StatsQueries.all ++ AnalyticsQueries.all ++
      DecisionSupportQueries.all ++ LakeQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every query has an oracle: approximate ops
    * emit one-row assertion summaries vs in-engine brute force (see
    * [[graft.queries.LlmQueries]] / [[graft.queries.MultimodalQueries]]),
    * so nothing is rows-only.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ LlmQueries.oracles ++ ExtensionQueries.oracles ++
      MultimodalQueries.oracles ++ StatsQueries.oracles ++ AnalyticsQueries.oracles ++
      DecisionSupportQueries.oracles ++ LakeQueries.oracles
}
