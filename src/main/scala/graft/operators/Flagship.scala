package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Composed flagship queries — classic TPC-H shapes built from the
  * primitive operators, demonstrating multi-join + agg + top-k
  * composition end to end (the "a user could run their reporting
  * queries" claim). Also exact percentile aggregation.
  */
object Flagship {

  /** Q3 shape — shipping priority: top-10 unshipped-revenue orders for
    * one market segment. Dims broadcast, facts join on FK, final top-k
    * is TakeOrderedAndProject. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("1998-06-30").cast("timestamp")
    val c = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val o = Tables.orders(spark, dir).filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val l = Tables.lineitem(spark, dir).filter($"l_shipdate" > cutoff)
      .select($"l_orderkey",
        (Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .as("rev"))
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"rev").cast("double").as("revenue"))
      .select($"o_orderkey", to_date($"o_orderdate").as("o_date"), $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** Q5 shape — local supplier volume: revenue by nation where customer
    * and supplier share the nation, one region, one date year. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val n = Tables.nation(spark, dir).join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val c = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val s = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") === 1997)
      .select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey",
        (Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .as("rev"))
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum($"rev").cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Q18 shape — large-volume customers: orders whose total quantity
    * exceeds a threshold, with their customer. The HAVING subquery
    * aggregates lineitem FIRST (shuffle carries one row per order, not
    * line items), then semi-joins orders/customer against the small
    * qualifying set — the aggregate-then-join shape that keeps the big
    * fact table out of the wide join at any scale. */
  def q18LargeVolumeCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(Tables.dec2($"l_quantity")).as("sum_qty"))
      .filter($"sum_qty" > 300)
    Tables.orders(spark, dir)
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        to_date($"o_orderdate").as("o_date"),
        Tables.dec2($"o_totalprice").cast("double").as("o_totalprice"),
        $"sum_qty".cast("double").as("sum_qty"))
      .orderBy($"sum_qty".desc, $"o_orderkey")
  }

  /** Q7 shape — volume shipping between two nations: revenue flowing
    * supplier-nation → customer-nation (either direction) per shipment
    * year. The nation filter lands on supplier/customer BEFORE the fact
    * joins — 2/25 selectivity each side, so the wide join only ever
    * sees the two nations' rows — and both filtered dims broadcast. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pair = Seq("NATION_1", "NATION_2")
    val n = Tables.nation(spark, dir).filter($"n_name".isin(pair: _*))
      .select($"n_nationkey", $"n_name")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val l = Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate").between(1996, 1998))
      .select($"l_orderkey", $"l_suppkey", year($"l_shipdate").as("l_year"),
        (Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .as("rev"))
    l.join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum($"rev").cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Q10 shape — returned-item reporting: top-20 customers by revenue
    * lost to returns in one quarter. Aggregates lineitem returns down
    * to (custkey, revenue) FIRST (the Q18 aggregate-then-join lesson),
    * then decorates the 20-row candidate set with customer/nation. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        (Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .as("rev"))
    // top-20 BEFORE decoration: the customer/nation joins are 1:1 on
    // the FK, so limiting the aggregate first is semantically identical
    // and only 20 rows ever reach the wide join
    val top = o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"rev").cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"o_custkey")
      .limit(20)
    top.join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"revenue",
        Tables.dec2($"c_acctbal").cast("double").as("c_acctbal"), $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
  }

  /** Exact percentiles per group: Spark's percentile() and DuckDB's
    * quantile_cont() both use linear interpolation over the sorted
    * values — exact arithmetic on the two neighbours, rounded to 6 to
    * absorb any last-ulp divergence in the interpolation products. */
  def aggPercentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy($"event_type")
  }

  /** Q6 shape — forecasting-revenue change: the pure scan-and-aggregate
    * query. No joins at all; its entire cost is how little of lineitem
    * the scan reads. The shipdate range and quantity bound are pushed
    * into the parquet reader (`PushedFilters` — row groups outside the
    * two-year window never leave disk), only four columns are read,
    * and the whole filter+project+partial-agg runs inside one
    * WholeStageCodegen span. At 100 TB with date-partitioned layout
    * the same plan prunes to 2 of N year-directories before reading a
    * byte — Q6 is the benchmark's scan-efficiency probe, which is why
    * it belongs in the flagship set.
    *
    * Revenue is Σ(extendedprice·discount) in exact DECIMAL (the what-if
    * uplift of dropping those discounts), grouped by ship year. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .groupBy(year($"l_shipdate").as("l_year"))
      .agg(sum(Tables.dec2($"l_extendedprice") * Tables.dec2($"l_discount"))
        .cast("double").as("revenue"))
      .orderBy($"l_year")
  }

  /** Q21 shape — "sole faulty supplier": suppliers who were the ONLY
    * supplier with a returned line on a multi-supplier order (TPC-H
    * Q21's exists/not-exists nest, re-keyed to l_returnflag since the
    * fixture carries no commit/receipt dates). The textbook way is two
    * correlated subqueries per lineitem row; at scale that's two extra
    * passes over the fact table. This plan instead collapses lineitem
    * to per-order incidence rows FIRST — distinct (order, supplier)
    * and distinct returned (order, supplier) — then expresses EXISTS
    * ("some other supplier on the order") as a per-order count > 1 and
    * NOT EXISTS ("no other supplier returned") as a per-order returned
    * count = 1 whose min() IS the sole supplier. Everything after the
    * two distincts is order-grain (≤1 row per order), and the final
    * supplier decoration is a broadcast. */
  def q21SoleSupplierReturns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
    val soleReturned = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey").distinct()
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("rs"), min($"l_suppkey").as("s"))
      .filter($"rs" === 1)
    val multiSupplier = li.distinct()
      .groupBy($"l_orderkey").agg(count(lit(1)).as("ns"))
      .filter($"ns" > 1)
    soleReturned.join(multiSupplier, "l_orderkey")
      .groupBy($"s")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)), $"s" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_suppkey")
  }

  /** Q4 shape — order priority checking: orders in one quarter that had
    * at least one problem line (EXISTS), counted by priority (TPC-H Q4
    * with l_returnflag = 'R' standing in for the missing
    * commit/receipt-date lateness predicate). The EXISTS compiles to a
    * LEFT SEMI join — each order emits at most once no matter how many
    * lines match, so there is no fan-out to de-duplicate. The orders
    * side arrives pre-filtered to one quarter (the date range is pushed
    * to its scan), lineitem is pruned to two columns, and the final
    * aggregate has 5 groups. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderpriority")
    val returned = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R").select($"l_orderkey")
    o.join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Q17 shape — small-quantity revenue: revenue of line items whose
    * quantity is below 0.2× their part's average quantity, by brand.
    * This is the correlated SCALAR-aggregate decorrelation probe: the
    * textbook SQL re-reads lineitem per outer row; Catalyst's
    * RewriteCorrelatedScalarSubquery must rewrite each subquery to a
    * per-part aggregate joined back (count → left-outer + zero-fill,
    * sum → inner) — the only plan that survives at scale. Deliberately
    * written
    * as SQL-with-subqueries (not a hand-built aggregate-join like q18)
    * so the optimizer path itself is what's exercised; a plan spec pins
    * the aggregate-then-join result.
    *
    * Exactness: qty < 0.2·avg ⟺ 5·qty·n < Σqty over the part's lines
    * (n > 0) — all BIGINT (quantities are integer-valued), so no
    * cross-engine division or FP boundary exists. */
  def q17SmallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q17")
    Tables.part(spark, dir).createOrReplaceTempView("part_q17")
    spark.sql(
      """SELECT p.p_brand,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem_q17 l JOIN part_q17 p ON l.l_partkey = p.p_partkey
        |WHERE 5 * CAST(l.l_quantity AS BIGINT) *
        |    (SELECT count(*) FROM lineitem_q17 l2
        |     WHERE l2.l_partkey = l.l_partkey)
        |  < (SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM lineitem_q17 l2
        |     WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin)
  }

  /** Q19 shape — the disjunctive-pushdown probe: OR-of-ANDs spanning
    * part and lineitem columns. q6 proves conjunctive pushdown; the
    * classic user trap is an OR predicate that silently stops reaching
    * the scan. Catalyst must extract each side's under-approximation of
    * the disjunction (the l_quantity bands for lineitem, the
    * brand/size bands for part) and push them into both parquet
    * readers — PushedFilters carrying an Or is pinned by a plan spec.
    * At 100 TB the quantity bands alone skip every row group whose
    * min/max misses all three bands. */
  def q19DisjunctivePushdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15)
          && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(10, 30)
          && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(20, 50)
          && $"l_quantity".between(20, 30)))
      .groupBy($"p_brand")
      .agg(
        sum(Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  /** Q13 shape — customer order-count distribution: LEFT OUTER join
    * customer→orders (orders filtered inside the join, so zero-order
    * customers survive with count 0), then a second aggregate over the
    * counts — the classic two-level "histogram of group sizes" query.
    * Probes outer-join + count(col) NULL semantics (count(o_orderkey)
    * counts matches, not rows) and double aggregation. Both group keys
    * are bounded (#distinct order counts ≪ customers), so each
    * aggregate partial-combines; the join shuffles on custkey — at
    * 100 TB this is the canonical fact-dim FK shuffle, skew-safe
    * because custkeys are uniform. */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).select($"c_custkey")
    val o = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Q14 shape — promo revenue ratio by ship month: conditional
    * aggregation (CASE inside sum) producing a percentage per month.
    * Revenue sums are DECIMAL(18,2)-exact; the ratio divides the two
    * sums as identical doubles in both engines (IEEE / is exact on
    * equal operands) and rounds to 6 decimals on output like the other
    * ratio keys. One scan of the join result feeds both the
    * conditional and total sums — no second pass. */
  def q14PromoRevenueRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.dec2($"l_extendedprice") *
      (lit(BigDecimal(1)) - Tables.dec2($"l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .groupBy((year($"l_shipdate") * 100 + month($"l_shipdate"))
        .cast("long").as("ship_month"))
      .agg(
        sum(when($"p_type" === "PROMO", rev).otherwise(lit(BigDecimal(0))))
          .cast("double").as("promo_rev"),
        sum(rev).cast("double").as("total_rev"))
      .select($"ship_month", $"promo_rev", $"total_rev",
        round(lit(100.0) * $"promo_rev" / $"total_rev", 6).as("promo_pct"))
      .orderBy($"ship_month")
  }

  /** Q22 shape — idle above-average balances with no urgent orders:
    * the non-correlated SCALAR subquery + NOT EXISTS (anti-join)
    * probe. The average-balance threshold is expressed multiplication-
    * only (bal·n > Σbal, both DECIMAL-exact) so no cross-engine
    * division boundary exists; the two scalar subqueries are planned
    * as standalone one-row aggregates over the same filtered scan, and
    * NOT EXISTS must plan a LeftAnti hash join, never a per-row probe
    * (both pinned in PlanRegressionSpec). At scale
    * the scalars are two tiny aggregate jobs broadcast into the
    * predicate; the anti-join shuffles on custkey only. */
  def q22IdleBalanceSegments(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_q22")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q22")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer_q22 c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM customer_q22 WHERE c_acctbal > 0)
        |  > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |     FROM customer_q22 WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders_q22 o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Q16 shape — supplier counts per part class, excluding a part
    * family via NOT IN: the null-aware anti-join probe. NOT IN is NOT
    * the same operator as NOT EXISTS (q22): its three-valued-logic
    * semantics (one NULL in the subquery empties the result) force
    * Catalyst onto the null-aware LeftAnti path rather than a plain
    * anti join — a distinct optimizer/runtime branch users hit
    * constantly and debug rarely. Here the subquery column is a
    * non-null key so the null-aware check degenerates at runtime, but
    * the plan path is exercised and pinned. Aggregation is
    * count(DISTINCT supplier) per bounded (brand, size) class —
    * partial-expand aggregation, shuffle O(classes·suppliers). */
  def q16SupplierPartClasses(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("part_q16")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q16")
    spark.sql(
      """SELECT p.p_brand, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt,
        |  count(*) AS n_lines
        |FROM part_q16 p JOIN lineitem_q16 l ON p.p_partkey = l.l_partkey
        |WHERE p.p_partkey NOT IN
        |  (SELECT p_partkey FROM part_q16 WHERE p_type = 'PROMO')
        |GROUP BY p.p_brand, p.p_size
        |ORDER BY p.p_brand, p.p_size""".stripMargin)
  }

  /** Percent-of-total (ratio-to-report): each nation's share of its
    * region's customer balance — the whole-partition aggregate-window
    * frame (no ORDER BY, no frame sort; every row sees the partition
    * total). Shares are exact 1e-6 fixed point over integer cents
    * (balance·100 is integer-valued DECIMAL(18,2)) — integer div, no
    * cross-engine float division. The window runs over the ALREADY
    * AGGREGATED per-nation frame (≈|nations| rows), never raw
    * customers — the corpus_mix_rebalance discipline. */
  def windowShareOfRegion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"r_name")
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg((sum(Tables.dec2($"c_acctbal")) * 100).cast("long").as("cents"))
      .withColumn("region_cents", sum($"cents").over(w))
      .select($"r_name", $"n_name",
        ($"cents".cast("double") / 100).as("balance"),
        expr("(cents * 1000000) div region_cents").as("share_fp"))
      .orderBy($"r_name", $"n_name")
  }

  val queries: Map[String, QueryFn] = Map(
    "q16_supplier_part_classes" -> (q16SupplierPartClasses(_, _)),
    "window_share_of_total" -> (windowShareOfRegion(_, _)),
    "q13_customer_distribution" -> (q13CustomerDistribution(_, _)),
    "q14_promo_revenue_ratio" -> (q14PromoRevenueRatio(_, _)),
    "q22_idle_balance_segments" -> (q22IdleBalanceSegments(_, _)),
    "q17_small_quantity_revenue" -> (q17SmallQuantityRevenue(_, _)),
    "q19_disjunctive_pushdown" -> (q19DisjunctivePushdown(_, _)),
    "q4_order_priority" -> (q4OrderPriority(_, _)),
    "q6_forecast_revenue" -> (q6ForecastRevenue(_, _)),
    "q21_sole_supplier_returns" -> (q21SoleSupplierReturns(_, _)),
    "q7_volume_shipping" -> (q7VolumeShipping(_, _)),
    "q10_returned_items" -> (q10ReturnedItems(_, _)),
    "q3_shipping_priority" -> (q3ShippingPriority(_, _)),
    "q5_local_supplier_volume" -> (q5LocalSupplierVolume(_, _)),
    "q18_large_volume_customer" -> (q18LargeVolumeCustomer(_, _)),
    "agg_percentile" -> (aggPercentile(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    "q16_supplier_part_classes" ->
      """SELECT p.p_brand, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt,
        |  count(*) AS n_lines
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |WHERE p.p_partkey NOT IN
        |  (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |GROUP BY p.p_brand, p.p_size
        |ORDER BY p.p_brand, p.p_size""".stripMargin,
    "window_share_of_total" ->
      """WITH b AS (SELECT r.r_name, n.n_name,
        |    CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY r.r_name, n.n_name),
        |t AS (SELECT r_name, n_name, cents,
        |    sum(cents) OVER (PARTITION BY r_name) AS region_cents FROM b)
        |SELECT r_name, n_name,
        |  CAST(cents AS DOUBLE) / 100 AS balance,
        |  CAST((cents * 1000000) // region_cents AS BIGINT) AS share_fp
        |FROM t ORDER BY r_name, n_name""".stripMargin,
    "q13_customer_distribution" ->
      """WITH co AS (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |   AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue_ratio" ->
      """WITH r AS (SELECT
        |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
        |      AS ship_month,
        |    p_type,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
        |    AS promo_rev,
        |  CAST(sum(rev) AS DOUBLE) AS total_rev,
        |  round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(rev) AS DOUBLE), 6) AS promo_pct
        |FROM r GROUP BY ship_month ORDER BY ship_month""".stripMargin,
    "q22_idle_balance_segments" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM customer WHERE c_acctbal > 0)
        |  > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |     FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q17_small_quantity_revenue" ->
      """SELECT p.p_brand,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE 5 * CAST(l.l_quantity AS BIGINT) *
        |    (SELECT count(*) FROM lineitem l2
        |     WHERE l2.l_partkey = l.l_partkey)
        |  < (SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
        |     WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin,
    "q19_disjunctive_pushdown" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |GROUP BY year(l_shipdate)
        |ORDER BY l_year""".stripMargin,
    "q21_sole_supplier_returns" ->
      """WITH r AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |           WHERE l_returnflag = 'R'),
        |a AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |sole AS (SELECT l_orderkey, min(l_suppkey) AS s FROM r
        |         GROUP BY l_orderkey HAVING count(*) = 1),
        |multi AS (SELECT l_orderkey FROM a
        |          GROUP BY l_orderkey HAVING count(*) > 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM sole JOIN multi ON sole.l_orderkey = multi.l_orderkey
        |JOIN supplier ON s_suppkey = sole.s
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE year(l_shipdate) BETWEEN 1996 AND 1998
        |  AND sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q10_returned_items" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM orders
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |    AND l_returnflag = 'R'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, revenue,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal, n_name
        |FROM r
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30'
        |  AND l_shipdate > TIMESTAMP '1998-06-30'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q18_large_volume_customer" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,
    "agg_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
