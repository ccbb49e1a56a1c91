package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's
  * OptimizeSkewedJoin can't help (e.g. skewed *aggregation* keys, or a
  * skewed broadcast-ineligible join side).
  *
  * Two-phase aggregate: group once on (key, salt) — spreading a hot key
  * over `salts` reducers — then re-aggregate the partials on the key
  * alone. Correct for any associative aggregate expressed as
  * (partial, merge) column pairs.
  */
object Salting {

  /** Salted two-phase sum/count aggregate.
    * @param salts fan-out per key; the hot key's rows spread over this
    *              many shuffle partitions in phase 1. */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      aggs: (Column, String)*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(sum(aggs.head._1).as(aggs.head._2),
        aggs.tail.map { case (c, n) => sum(c).as(n) }: _*)
    phase1.groupBy(col("__key"))
      .agg(sum(col(aggs.head._2)).as(aggs.head._2),
        aggs.tail.map { case (_, n) => sum(col(n)).as(n) }: _*)
  }
}
