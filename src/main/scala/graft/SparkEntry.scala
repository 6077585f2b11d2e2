package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.plans.{AsOf, AsOfExec, RangeJoin}
import graft.streaming.StreamingTwins

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each operator module contributes a `queries` map (name → plan
  * builder over `(spark, sfDir)`) and, where the semantics are
  * ANSI-SQL-expressible, a matching `oracleSql` DuckDB query the driver
  * hash-compares against. Column names/aliases are kept identical on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ EtlOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ AnnOps.queries ++ MultimodalOps.queries ++
      ExtendedAnalytics.queries ++ AsOf.queries ++ SketchOps.queries ++ RangeJoin.queries ++ ClusterOps.queries ++ TypedOps.queries ++ TpchMore.queries ++ AsOfExec.queries ++ StreamingTwins.queries ++ PipelineOps.queries ++ RelationalMore.queries ++ DedupMore.queries ++ TpchFinal.queries ++ StatsOps.queries ++ WarehouseOps.queries ++ RetrievalOps.queries ++ Round9Ops.queries ++ Round9bOps.queries ++ Round10Ops.queries ++ Round10bOps.queries ++ Round12Ops.queries ++ Round12bOps.queries ++ Round13Ops.queries ++ Round15Ops.queries ++ Round16Ops.queries ++ Round17Ops.queries ++ Round18Ops.queries ++ Round19Ops.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    Analytics.oracleSql ++ EtlOps.oracleSql ++ TextOps.oracleSql ++
      DedupOps.oracleSql ++ AnnOps.oracleSql ++ MultimodalOps.oracleSql ++
      ExtendedAnalytics.oracleSql ++ AsOf.oracleSql ++ SketchOps.oracleSql ++ RangeJoin.oracleSql ++ ClusterOps.oracleSql ++ TypedOps.oracleSql ++ TpchMore.oracleSql ++ AsOfExec.oracleSql ++ StreamingTwins.oracleSql ++ PipelineOps.oracleSql ++ RelationalMore.oracleSql ++ DedupMore.oracleSql ++ TpchFinal.oracleSql ++ StatsOps.oracleSql ++ WarehouseOps.oracleSql ++ RetrievalOps.oracleSql ++ Round9Ops.oracleSql ++ Round9bOps.oracleSql ++ Round10Ops.oracleSql ++ Round10bOps.oracleSql ++ Round12Ops.oracleSql ++ Round12bOps.oracleSql ++ Round13Ops.oracleSql ++ Round15Ops.oracleSql ++ Round16Ops.oracleSql ++ Round17Ops.oracleSql ++ Round18Ops.oracleSql ++ Round19Ops.oracleSql
}
