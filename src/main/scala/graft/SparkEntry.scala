package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole point is hybrid search, so the flagship runs
    * the full query-table-driven hybrid batch (filters + top-K). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.hybridQueries(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ FilterQueries.all ++ VectorQueries.all ++
    DedupQueries.all ++ TextQueries.all ++ EventQueries.all ++
    MultimodalQueries.all ++ IngestQueries.all ++ PipelineQueries.all ++
    AnalyticsQueries.all ++ QualityQueries.all ++ QualityQueries2.all

  /** DuckDB-runnable ANSI SQL twin per query (same column names/order-by). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ FilterQueries.oracles ++ VectorQueries.oracles ++
    DedupQueries.oracles ++ TextQueries.oracles ++ EventQueries.oracles ++
    MultimodalQueries.oracles ++ IngestQueries.oracles ++ PipelineQueries.oracles ++
    AnalyticsQueries.oracles ++ QualityQueries.oracles ++ QualityQueries2.oracles
}
