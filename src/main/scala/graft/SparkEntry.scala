package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregations.aggGroupbySum(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Aggregations.queries ++ operators.Relational.queries ++
      operators.Windows.queries ++ functions.Scalars.queries ++
      functions.UserCode.queries ++ operators.LlmOps.queries ++
      operators.Multimodal.queries ++ operators.Flagship.queries ++
      operators.Pipelines.queries ++ streaming.Streamy.queries ++
      operators.Analytics.queries ++ operators.Recursion.queries ++
      operators.Behavioral.queries ++ operators.Timeseries.queries ++
      operators.Tpch.queries ++ operators.Indexing.queries ++
      operators.Lakehouse.queries ++ operators.LakehouseCow.queries ++
      operators.Stats.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Aggregations.oracleSql ++ operators.Relational.oracleSql ++
      operators.Windows.oracleSql ++ functions.Scalars.oracleSql ++
      functions.UserCode.oracleSql ++ operators.LlmOps.oracleSql ++
      operators.Multimodal.oracleSql ++ operators.Flagship.oracleSql ++
      operators.Pipelines.oracleSql ++ streaming.Streamy.oracleSql ++
      operators.Analytics.oracleSql ++ operators.Recursion.oracleSql ++
      operators.Behavioral.oracleSql ++ operators.Timeseries.oracleSql ++
      operators.Tpch.oracleSql ++ operators.Indexing.oracleSql ++
      operators.Lakehouse.oracleSql ++ operators.LakehouseCow.oracleSql ++
      operators.Stats.oracleSql
}
