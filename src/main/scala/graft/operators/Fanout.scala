package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism guard for group-then-explode fan-outs (r18 optimization).
  *
  * AQE's partition coalescing sizes post-shuffle partitions by the
  * SHUFFLE bytes — correct for scans and joins, wrong for a stage whose
  * tiny aggregated input EXPANDS downstream (collect_set → posexplode
  * pair generation): the few-MB set frame coalesces to one partition
  * and the C(degree,2) pair explosion then runs single-threaded
  * (measured 3.5–3.7 s single-task stages on the graph_* keys at
  * sf0.1/local[32]; guide §2.5 — synthetic partitioning with too few
  * partitions).
  *
  * Fix: hash-repartition the grouping key with an EXPLICIT partition
  * count — AQE never coalesces a user-numbered repartition
  * (REPARTITION_BY_NUM shuffle origin) — so the aggregate AND the
  * pipelined explosion after it keep full parallelism. The count is the
  * session's configured shuffle parallelism, NOT a constant: local runs
  * inherit `spark.sql.shuffle.partitions` = `$SPARK_GRAFT_CPUS` (the
  * driver's own scaling knob) and a production cluster its tuned value,
  * so the shape is scale-adaptive by construction. The groupBy reuses
  * this exchange (hash partitioning on the same key satisfies the
  * aggregate's distribution requirement), so exchange COUNT is
  * unchanged — the pre-existing coalescible exchange is replaced by a
  * non-coalescible one. Row results are partitioning-independent:
  * hash-verified against the DuckDB oracle for every touched key. */
object Fanout {
  def byKey(df: DataFrame, cols: Column*): DataFrame = {
    val n = scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    df.repartition(n, cols: _*)
  }
}
