package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.{GetLogsFilter, LogsQuery}
import graft.evm.EvmDerive
import graft.queries.{AnalyticsQueries, CoreQueries, CurationQueries, PipelineQueries, SpanQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query registries; every entry in
  * [[queries]] ends in a total-order ORDER BY, and [[oracleSql]]
  * carries the DuckDB-dialect equivalent for the driver's differential
  * check.
  */
object SparkEntry {

  /** Flagship query (the reference's `POST /logs`) on sf0.001;
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    LogsQuery.plan(
      EvmDerive.logs(spark, "/root/testdata/sf0.001"),
      GetLogsFilter(fromBlock = Some(0), toBlock = Some(50), pageSize = Some(100)))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ AnalyticsQueries.queries ++ PipelineQueries.queries ++
      CurationQueries.queries ++ SpanQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ AnalyticsQueries.oracleSql ++ PipelineQueries.oracleSql ++
      CurationQueries.oracleSql ++ SpanQueries.oracleSql
}
