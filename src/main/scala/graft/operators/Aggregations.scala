package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Aggregation operators (SURVEY.md §2.4).
  *
  * The Hadoop-MR reference class expresses these as map → combine →
  * reduce; in Spark every `groupBy().agg()` compiles to partial+final
  * `HashAggregateExec` — the combiner is automatic, and AQE coalesces
  * post-shuffle partitions. Scale notes per operator in scaladoc.
  */
object Aggregations {

  /** TPC-H Q1 shape: scan + filter + group-agg on lineitem.
    * Map-side partial aggregation means shuffle volume is O(groups), not
    * O(rows) — at 100 TB this is the canonical "combiner" win.
    * Money math in DECIMAL(18,2) (exact ⇒ order-independent ⇒
    * hash-stable vs DuckDB); presented as DOUBLE. */
  def aggGroupbySum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    l.filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(Tables.dec2($"l_quantity")).cast("double").as("sum_qty"),
        sum(Tables.dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .cast("double").as("sum_disc_price"),
        (sum(Tables.dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, QueryFn] = Map(
    "agg_groupby_sum" -> (aggGroupbySum(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    "agg_groupby_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
