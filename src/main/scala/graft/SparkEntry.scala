package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed here as a
  * named query over `/root/testdata/sf*` plus (where SQL-expressible)
  * a DuckDB oracle with identical column names and deterministic
  * ordering. Column aliases MUST match between `queries` and
  * `oracleSql` (driver hashes values under sorted column names).
  */
object SparkEntry {

  /** All registered engine queries, one per implemented operator. */
  def registry: Seq[GraftQuery] =
    Relational.all ++ RelationalExt.all ++ Temporal.all ++ Dedup.all ++
      Similarity.all ++ Clustering.all ++ TextAnalysis.all ++ Multimodal.all ++ Pipeline.all ++
      Hygiene.all ++ Profiling.all ++ Packing.all ++ Funnels.all ++ Graph.all ++
      SyncQueries.all ++ IndexIncremental.all ++ CurationState.all ++
      graft.streaming.EventStreams.all ++ graft.sql.SqlSurface.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.queryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    GraftQuery.oracleMap(registry)
}
