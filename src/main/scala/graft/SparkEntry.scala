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
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (RelationalQueries.q1Pricing _),
    "q3_priority" -> (RelationalQueries.q3Priority _),
    "q5_region" -> (RelationalQueries.q5Region _),
    "q10_returns" -> (RelationalQueries.q10Returns _),
    "q1_rollup" -> (RelationalQueries.q1Rollup _),
    "orders_running" -> (RelationalQueries.ordersRunning _),
    "top_customers" -> (RelationalQueries.topCustomers _)
  ) ++ FilterQueries.all ++ VectorQueries.all ++ DedupQueries.all ++
    TextQueries.all ++ EventQueries.all ++ MultimodalQueries.all ++
    IngestQueries.all ++ PipelineQueries.all

  /** DuckDB-runnable ANSI SQL twin per query (same column names/order-by). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> RelationalQueries.q1PricingSql,
    "q3_priority" -> RelationalQueries.q3PrioritySql,
    "q5_region" -> RelationalQueries.q5RegionSql,
    "q10_returns" -> RelationalQueries.q10ReturnsSql,
    "q1_rollup" -> RelationalQueries.q1RollupSql,
    "orders_running" -> RelationalQueries.ordersRunningSql,
    "top_customers" -> RelationalQueries.topCustomersSql
  ) ++ FilterQueries.oracles ++ VectorQueries.oracles ++ DedupQueries.oracles ++
    TextQueries.oracles ++ EventQueries.oracles ++ MultimodalQueries.oracles ++
    IngestQueries.oracles ++ PipelineQueries.oracles
}
