package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** The remaining classic TPC-H shapes (Q1/Q2/Q8/Q9/Q11/Q12/Q15/Q20),
  * completing 22/22 flagship coverage alongside operators/Flagship.scala.
  * Shapes whose canonical columns the fixture lacks (partsupp, shipmode,
  * commit/receipt dates) are re-keyed to equivalent fixture columns the
  * same way Q4/Q21 were — the operator/optimizer shape under test is
  * preserved, the predicate columns differ.
  *
  * Determinism: all money math is DECIMAL(18,2)-exact (Tables.dec2);
  * the Q1 triple product price·(1−disc)·(1+tax) lands at scale 6 in
  * both engines (Spark clamps DECIMAL(38,6), DuckDB widens to
  * DECIMAL(18,6) — the true product scale is 6, so neither rounds);
  * ratios divide identical doubles and round(6); per-group extrema
  * compare DECIMAL-exact (Q2/Q15 tie semantics preserved).
  */
object Tpch {

  /** Q1 — pricing summary report: the canonical full-scan aggregate.
    * One pass over lineitem computes 4 exact-decimal sums, 3 averages,
    * and a count per (returnflag, linestatus). Everything partial-
    * aggregates map-side into 6 groups, so the shuffle carries 6 rows
    * per task regardless of scale — at 100 TB this query is pure scan
    * bandwidth, which is the point of the probe. Averages are derived
    * from the exact sums AFTER aggregation (sum/count of identical
    * doubles), never avg()'d directly, so no FP accumulation order
    * exists to diverge. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val one = lit(BigDecimal(1))
    val discPrice = Tables.dec2($"l_extendedprice") * (one - Tables.dec2($"l_discount"))
    val charge = discPrice * (one + Tables.dec2($"l_tax"))
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("2001-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(Tables.dec2($"l_quantity")).cast("double").as("sum_qty"),
        sum(Tables.dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        sum(Tables.dec2($"l_discount")).cast("double").as("sum_disc"),
        count(lit(1)).as("count_order"))
      .select($"l_returnflag", $"l_linestatus",
        $"sum_qty", $"sum_base_price", $"sum_disc_price", $"sum_charge",
        round($"sum_qty" / $"count_order", 6).as("avg_qty"),
        round($"sum_base_price" / $"count_order", 6).as("avg_price"),
        round($"sum_disc" / $"count_order", 6).as("avg_disc"),
        $"count_order")
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q2 — minimum-cost supplier: the correlated scalar-MIN subquery
    * probe. Q17 exercises decorrelation of count/sum; MIN takes a
    * different rewrite branch (no zero-fill COALESCE is legal — an
    * empty group must stay absent, not become 0). The fixture has no
    * partsupp, so the (part, supplier) catalog is derived from
    * lineitem: a supplier's "offer" for a part is its minimum billed
    * price — per-pair aggregate first (the shuffle carries one row per
    * pair), then the correlated MIN keeps only pairs matching their
    * part's region-wide minimum, ties preserved exactly as Q2 demands.
    * Catalyst must plan ONE aggregate joined back on l_partkey, never
    * a per-row re-scan. DECIMAL(18,2) min compares exactly. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q2")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q2")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_q2")
    Tables.region(spark, dir).createOrReplaceTempView("region_q2")
    Tables.part(spark, dir).createOrReplaceTempView("part_q2")
    spark.sql(
      """WITH offer AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem_q2
        |  JOIN supplier_q2 ON l_suppkey = s_suppkey
        |  JOIN nation_q2 ON s_nationkey = n_nationkey
        |  JOIN region_q2 ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal,
        |  s_name, n_name, p_partkey, p_brand
        |FROM offer o1
        |JOIN part_q2 ON o1.l_partkey = p_partkey
        |JOIN supplier_q2 ON o1.l_suppkey = s_suppkey
        |JOIN nation_q2 ON s_nationkey = n_nationkey
        |WHERE p_type = 'LARGE'
        |  AND o1.cost = (SELECT min(o2.cost) FROM offer o2
        |                 WHERE o2.l_partkey = o1.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)
  }

  /** Q8 — national market share: one nation's fraction of a region's
    * import volume for one part family, per order year. The two
    * conditional sums come from ONE pass over the joined facts (the
    * Q14 discipline); part/supplier/nation/region dims all broadcast
    * after their filters; only the orders⋈lineitem FK join shuffles.
    * The share divides the two exact-decimal sums as identical doubles
    * and rounds to 6 — the ratio-key precedent. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vol = Tables.dec2($"l_extendedprice") *
      (lit(BigDecimal(1)) - Tables.dec2($"l_discount"))
    val p = Tables.part(spark, dir).filter($"p_type" === "ECONOMY")
      .select($"p_partkey")
    val amr = Tables.region(spark, dir).filter($"r_name" === "AMERICA")
    val custNation = Tables.nation(spark, dir)
      .join(broadcast(amr), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("cn_key"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(custNation), $"c_nationkey" === $"cn_key")
      .select($"c_custkey")
    val suppNation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(suppNation), $"s_nationkey" === $"sn_key")
      .select($"s_suppkey", $"supp_nation")
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey",
      year($"o_orderdate").as("o_year"))
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", vol.as("volume"))
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"o_year")
      .agg(
        sum(when($"supp_nation" === "NATION_1", $"volume")
          .otherwise(lit(BigDecimal(0)))).cast("double").as("nation_volume"),
        sum($"volume").cast("double").as("total_volume"))
      .select($"o_year", $"nation_volume", $"total_volume",
        round($"nation_volume" / $"total_volume", 6).as("mkt_share"))
      .orderBy($"o_year")
  }

  /** Q9 — product-family profit by supplier nation and year. The
    * fixture's stand-in for ps_supplycost is the part's retail price
    * (unit cost), so profit = billed revenue − retailprice·qty, all
    * DECIMAL-exact (both products land at scale 4; the difference
    * subtracts exactly — no FP order to diverge). The part-name LIKE
    * filter prunes lineitem through a broadcast semi-shape join before
    * the orders join, so the big FK shuffle only carries the ~13% of
    * lines in the family. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val profit =
      Tables.dec2($"l_extendedprice") * (lit(BigDecimal(1)) - Tables.dec2($"l_discount")) -
        Tables.dec2($"p_retailprice") * Tables.dec2($"l_quantity")
    val p = Tables.part(spark, dir).filter($"p_name".like("%widget%"))
      .select($"p_partkey", $"p_retailprice")
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    Tables.lineitem(spark, dir)
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(sn), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name", $"o_year")
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy($"n_name", $"o_year".desc)
  }

  /** Q11 — important parts: parts whose regional billed value exceeds
    * a fixed fraction (1/1000) of the region's total. The threshold is
    * the non-correlated scalar-aggregate-over-the-same-CTE probe: both
    * the per-part aggregate and its grand total derive from one
    * definition; the comparison is multiplication-only (value·1000 >
    * Σvalue, both exact DECIMAL) — no division boundary. At scale the
    * scalar side is a tiny re-aggregate of the per-part frame, not a
    * second fact scan. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q11")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q11")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_q11")
    Tables.region(spark, dir).createOrReplaceTempView("region_q11")
    spark.sql(
      """WITH pv AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        |  FROM lineitem_q11
        |  JOIN supplier_q11 ON l_suppkey = s_suppkey
        |  JOIN nation_q11 ON s_nationkey = n_nationkey
        |  JOIN region_q11 ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
        |FROM pv
        |WHERE value * 1000 > (SELECT sum(value) FROM pv)
        |ORDER BY value DESC, p_partkey""".stripMargin)
  }

  /** Q12 — shipping priority audit (Q12 re-keyed: the fixture has no
    * l_shipmode, so l_linestatus classes the lines, as l_returnflag
    * stood in for lateness in Q4/Q21). Counts urgent-priority vs other
    * orders' lines per class in one ship year — the CASE-inside-sum
    * conditional-count shape over the canonical FK join. Both counts
    * come from one pass; the 2-group aggregate partial-combines. */
  def q12PriorityShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate") === 1997)
      .select($"l_orderkey", $"l_linestatus")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  /** Q15 — top supplier: the aggregate-view + scalar-MAX probe. Revenue
    * per supplier over one quarter is a reused named frame (TPC-H's
    * CREATE VIEW), and the winner(s) are rows equal to the frame's own
    * max — tie-preserving, compared in exact DECIMAL so no FP boundary
    * can drop or admit a supplier. Catalyst plans the scalar as a tiny
    * re-aggregate of the ≤|suppliers| frame, broadcast into the
    * filter — never a re-scan of lineitem. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q15")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q15")
    spark.sql(
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem_q15
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier_q15 JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Q20 — promotion-eligible suppliers: the nested-IN semi-join chain
    * (IN inside IN, the third membership operator after EXISTS/Q4 and
    * NOT IN/Q16). The inner IN prunes lineitem to one part family, the
    * grouped HAVING finds (supplier, part) pairs shipped in volume, the
    * outer IN reduces to suppliers, intersected with one region via a
    * scalar subquery — four nesting levels Catalyst must collapse into
    * left-semi joins over pre-aggregated frames, with no correlated
    * re-execution. Quantity sums are BIGINT-exact. */
  def q20PromotionSuppliers(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q20")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q20")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_q20")
    Tables.region(spark, dir).createOrReplaceTempView("region_q20")
    Tables.part(spark, dir).createOrReplaceTempView("part_q20")
    spark.sql(
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier_q20 JOIN nation_q20 ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem_q20
        |  WHERE l_partkey IN (SELECT p_partkey FROM part_q20
        |                      WHERE p_name LIKE 'red%')
        |    AND year(l_shipdate) = 1997
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 50)
        |  AND n_regionkey = (SELECT r_regionkey FROM region_q20
        |                     WHERE r_name = 'ASIA')
        |ORDER BY s_suppkey""".stripMargin)
  }

  val queries: Map[String, QueryFn] = Map(
    "q1_pricing_summary" -> (q1PricingSummary(_, _)),
    "q2_min_cost_supplier" -> (q2MinCostSupplier(_, _)),
    "q8_market_share" -> (q8MarketShare(_, _)),
    "q9_product_profit" -> (q9ProductProfit(_, _)),
    "q11_important_parts" -> (q11ImportantParts(_, _)),
    "q12_priority_shipping" -> (q12PriorityShipping(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q20_promotion_suppliers" -> (q20PromotionSuppliers(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH offer AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal,
        |  s_name, n_name, p_partkey, p_brand
        |FROM offer o1
        |JOIN part ON o1.l_partkey = p_partkey
        |JOIN supplier ON o1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type = 'LARGE'
        |  AND o1.cost = (SELECT min(o2.cost) FROM offer o2
        |                 WHERE o2.l_partkey = o1.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE) AS nation_volume,
        |  CAST(sum(volume) AS DOUBLE) AS total_volume,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
        |FROM pv
        |WHERE value * 1000 > (SELECT sum(value) FROM pv)
        |ORDER BY value DESC, p_partkey""".stripMargin,
    "q12_priority_shipping" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE year(l_shipdate) = 1997
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q20_promotion_suppliers" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'red%')
        |    AND year(l_shipdate) = 1997
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 50)
        |  AND n_regionkey = (SELECT r_regionkey FROM region
        |                     WHERE r_name = 'ASIA')
        |ORDER BY s_suppkey""".stripMargin
  )
}
