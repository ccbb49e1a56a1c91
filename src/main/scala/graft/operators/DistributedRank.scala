package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global rank / running sum — the multi-level
  * prefix-sum decomposition that replaces a single-partition
  * `Window.orderBy(...)` (the `WindowExec: No Partition Defined` plan
  * every global `row_number`/cumulative-sum otherwise produces, which
  * funnels the whole frame through ONE task at any scale).
  *
  * Shape: within each group, rows are assigned to cells `(v, tb)` —
  * their exact order value plus a tie-column bucket — and cells to
  * value-buckets `vb`, both bucket widths derived ADAPTIVELY from the
  * group's own min/max so each level has at most
  * [[DistributedRank.Fan]] buckets. Three frames carry the arithmetic:
  *
  *  1. row grain: rank/running-weight WITHIN a cell — a window
  *     partitioned by `(g, v, tb)`, so a tie-run (many rows sharing
  *     `v`) splits across tie-buckets instead of one sort;
  *  2. cell grain: per-cell (count, weight) subtotals with an
  *     intra-`vb` exclusive prefix — a window partitioned by
  *     `(g, vb)`;
  *  3. bucket grain: per-`vb` subtotals with a per-group exclusive
  *     prefix — ordered within `g` over a frame BOUNDED at
  *     [[DistributedRank.Fan]] rows per group regardless of corpus
  *     size, then broadcast back (requires |groups| be
  *     metadata-scale — both call sites pass ≤3 groups).
  *
  * `global = bucket_offset + cell_offset + within_cell`, the classic
  * carry-propagation identity; results are bit-equal to the
  * single-window form (every caller's oracle replays that form — the
  * hash-match proves the decomposition). Requires `(g, v, tie)`
  * unique per row (both call sites rank entity frames keyed by the
  * tie column) — and `v`/`tie`/`weight` NON-NULL: the bucket
  * expressions evaluate to NULL for a NULL input and the inner
  * equi-joins on the bucket keys then silently DROP those rows,
  * unlike the single-window form this decomposes (which keeps
  * NULLs, NULLS FIRST). Coalesce nullable metrics before calling
  * (the suite-wide determinism rule already bans NULL sort keys, so
  * every current call site satisfies this by construction).
  * Descending orders negate `v` at the call site. All
  * bucket arithmetic is integer `div` on min-shifted (non-negative)
  * values — exact, monotone, engine-replayable. */
object DistributedRank {
  /** Per-level fan-out bound: no per-group ordered frame exceeds this
    * many rows, and tie-runs split into at most this many cells. */
  val Fan = 65536L

  /** Decorates `df` with `rnk` (1-based row rank under ORDER BY
    * (v, tie) within its `g` group, BIGINT), `cum` (inclusive running
    * sum of `weight` in the same order) and `w_total` (the group's
    * weight total). `g`, `v`, `tie`, `weight` name BIGINT columns of
    * `df` (`g` may be any broadcast-joinable type); all other columns
    * pass through. */
  def rankCumBy(df: DataFrame, g: String, v: String, tie: String,
      weight: String): DataFrame = {
    val keep = df.columns
    val base = df
      .withColumn("drk_v", col(v)).withColumn("drk_t", col(tie))
      .withColumn("drk_w", col(weight))
    val bounds = base.groupBy(col(g).as("drk_gb")).agg(
      min($c("v")).as("drk_vmin"), max($c("v")).as("drk_vmax"),
      min($c("t")).as("drk_tmin"), max($c("t")).as("drk_tmax"))
    // CUT, not mark (r18): the bucketed row frame feeds three consumers
    // (within-cell windows, cell subtotals, bucket subtotals), two of
    // them broadcast back — concurrent broadcast futures racing a lazy
    // persist each re-derive the whole upstream dag (for a chained
    // rankCum the upstream is the ENTIRE previous pass); the eager
    // checkpoint computes it once and truncates downstream analysis
    val rows = graft.PlanOnly.cut(base
      .join(broadcast(bounds), col(g) === col("drk_gb"))
      .withColumn("drk_vb", expr(
        s"(drk_v - drk_vmin) div greatest(1L, ((drk_vmax - drk_vmin) div ${Fan}L) + 1L)"))
      .withColumn("drk_tb", expr(
        s"(drk_t - drk_tmin) div greatest(1L, ((drk_tmax - drk_tmin) div ${Fan}L) + 1L)"))
      .drop("drk_gb", "drk_vmin", "drk_vmax", "drk_tmin", "drk_tmax"))
    // level 0: within-cell rank / running weight
    val w0 = Window.partitionBy(col(g), $c("v"), $c("tb")).orderBy($c("t"))
    val inCell = rows
      .withColumn("drk_rn0", row_number().over(w0).cast("long"))
      .withColumn("drk_cw0", sum($c("w"))
        .over(w0.rowsBetween(Window.unboundedPreceding, 0)))
    // level 1: cell subtotals, exclusive prefix within each (g, vb)
    val w1 = Window.partitionBy(col(g), $c("vb"))
      .orderBy($c("v"), $c("tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cells = rows.groupBy(col(g), $c("vb"), $c("v"), $c("tb"))
      .agg(count(lit(1)).as("drk_cn1"), sum($c("w")).as("drk_ws1"))
      .withColumn("drk_coff", coalesce(sum($c("cn1")).over(w1), lit(0L)))
      .withColumn("drk_woff", coalesce(sum($c("ws1")).over(w1), lit(0L)))
      .select(col(g), $c("v"), $c("tb"), $c("coff"), $c("woff"))
    // level 2: vb subtotals, per-group exclusive prefix (≤ Fan rows
    // per group, broadcast back)
    val w2 = Window.partitionBy(col(g)).orderBy($c("vb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sub = rows.groupBy(col(g), $c("vb"))
      .agg(count(lit(1)).as("drk_cn2"), sum($c("w")).as("drk_ws2"))
    val bkts = sub
      .withColumn("drk_boff", coalesce(sum($c("cn2")).over(w2), lit(0L)))
      .withColumn("drk_wboff", coalesce(sum($c("ws2")).over(w2), lit(0L)))
      .select(col(g), $c("vb"), $c("boff"), $c("wboff"))
    val totals = sub.groupBy(col(g))
      .agg(coalesce(sum($c("ws2")), lit(0L)).as("w_total"))
    inCell
      .join(cells, Seq(g, "drk_v", "drk_tb"))
      .join(broadcast(bkts), Seq(g, "drk_vb"))
      .join(broadcast(totals), Seq(g))
      .withColumn("rnk", $c("boff") + $c("coff") + $c("rn0"))
      .withColumn("cum", $c("wboff") + $c("woff") + $c("cw0"))
      .select((keep.map(col) ++ Seq(col("rnk"), col("cum"),
        col("w_total"))): _*)
  }

  /** Ungrouped form: one global order over the whole frame. */
  def rankCum(df: DataFrame, v: String, tie: String, weight: String)
      : DataFrame =
    rankCumBy(df.withColumn("drk_g0", lit(0L)), "drk_g0", v, tie, weight)
      .drop("drk_g0")

  private def $c(suffix: String): Column = col("drk_" + suffix)

  /** SQL-standard NTILE(k) score from a 1-based global rank over n
    * rows: with q = n div k and r = n mod k the first r buckets take
    * q+1 rows — `ceil(rank/(q+1))` inside the widened prefix,
    * `r + ceil((rank − r·(q+1))/q)` beyond it (q = 0 degenerates to
    * score = rank). Pure integer arithmetic, engine-replayable. */
  def ntileFromRank(rank: String, n: String, k: Int): Column = expr(
    s"""CASE WHEN $rank <= ($n % $k) * (($n div $k) + 1)
       |  THEN ($rank + ($n div $k)) div (($n div $k) + 1)
       |  ELSE ($n % $k) +
       |    ($rank - ($n % $k) * (($n div $k) + 1) + ($n div $k) - 1)
       |      div ($n div $k)
       |END""".stripMargin)
}
