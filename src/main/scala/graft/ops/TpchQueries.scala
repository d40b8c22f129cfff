package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Canonical TPC-H-shaped analytical queries over the star schema — the
  * standard decision-support patterns (pricing rollup, top-k unshipped
  * revenue, regional supplier volume) that certify the relational core
  * composes: multi-way joins with dimension broadcast, selective date
  * filters pushed to the scans, and two-phase aggregation. Money stays in
  * integer cents (BIGINT / DECIMAL(38,0) partials) so every sum is exact
  * and order-free — the discounted/taxed products are integers in 1e-4 /
  * 1e-6 dollar units — and doubles appear only in final fixed expressions
  * (the [[AggFamilies.momentStats]] rule).
  */
object TpchQueries {

  /** Q1 pricing summary: one scan, map-side partial aggregation into 4
    * (returnflag, linestatus) groups. disc/tax percentages are exact
    * integers (the data carries 2-decimal rates), so `price*(1-disc)` and
    * `price*(1-disc)*(1+tax)` become integer products in 1e-4/1e-6 dollar
    * units, summed as DECIMAL(38,0) — overflow-safe at any SF.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .where("l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'")
      .selectExpr("l_returnflag AS rf", "l_linestatus AS ls",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c",
        "CAST(round(l_discount * 100) AS BIGINT) AS disc_pct",
        "CAST(round(l_tax * 100) AS BIGINT) AS tax_pct")
      .groupBy("rf", "ls")
      .agg(
        sum("qty_c").as("sum_qty_c"),
        sum("price_c").as("sum_base_c"),
        sum(expr("CAST(price_c AS DECIMAL(38,0)) * (100 - disc_pct)")).as("disc_c4"),
        sum(expr("CAST(price_c AS DECIMAL(38,0)) * (100 - disc_pct) * (100 + tax_pct)"))
          .as("charge_c6"),
        sum("disc_pct").as("sum_disc_pct"),
        count(lit(1)).as("n"))
      .selectExpr("rf", "ls", "sum_qty_c", "sum_base_c",
        "CAST(disc_c4 AS DOUBLE) AS sum_disc_price_c4",
        "CAST(charge_c6 AS DOUBLE) AS sum_charge_c6",
        "CAST(sum_qty_c AS DOUBLE) / (100.0 * n) AS avg_qty",
        "CAST(sum_base_c AS DOUBLE) / (100.0 * n) AS avg_price",
        "CAST(sum_disc_pct AS DOUBLE) / (100.0 * n) AS avg_disc",
        "n")
      .orderBy("rf", "ls")

  val q1PricingSql: String =
    """WITH l AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
      |                  CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |                  CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      |                  CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
      |           FROM lineitem
      |           WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'),
      |g AS (SELECT rf, ls, sum(qty_c)::BIGINT AS sum_qty_c,
      |             sum(price_c)::BIGINT AS sum_base_c,
      |             sum(CAST(price_c AS DECIMAL(38,0)) * (100 - disc_pct)) AS disc_c4,
      |             sum(CAST(price_c AS DECIMAL(38,0)) * (100 - disc_pct) * (100 + tax_pct)) AS charge_c6,
      |             sum(disc_pct)::BIGINT AS sum_disc_pct,
      |             count(*)::BIGINT AS n
      |      FROM l GROUP BY rf, ls)
      |SELECT rf, ls, sum_qty_c, sum_base_c,
      |       CAST(disc_c4 AS DOUBLE) AS sum_disc_price_c4,
      |       CAST(charge_c6 AS DOUBLE) AS sum_charge_c6,
      |       CAST(sum_qty_c AS DOUBLE) / (100.0 * n) AS avg_qty,
      |       CAST(sum_base_c AS DOUBLE) / (100.0 * n) AS avg_price,
      |       CAST(sum_disc_pct AS DOUBLE) / (100.0 * n) AS avg_disc,
      |       n
      |FROM g ORDER BY rf, ls""".stripMargin

  /** Q3 shipping-priority: segment customers × open orders × late-shipped
    * lines, top-10 orders by discounted revenue. The customer filter
    * broadcasts; revenue ties break on o_orderkey so the top-k is total-
    * ordered (cross-engine determinism); Spark plans the limit as
    * TakeOrderedAndProject (per-partition top-10, no global sort).
    */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .where("c_mktsegment = 'AUTOMOBILE'").select("c_custkey")
    val orders = Tables.load(spark, dir, "orders")
      .where("o_orderdate < TIMESTAMP '1998-01-01 00:00:00'")
    val lines = Tables.load(spark, dir, "lineitem")
      .where("l_shipdate > TIMESTAMP '1998-01-01 00:00:00'")
      .selectExpr("l_orderkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
    lines
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum("rev_c4").as("revenue_c4"))
      .selectExpr("o_orderkey",
        "CAST(o_orderdate AS STRING) AS o_orderdate", "revenue_c4")
      .orderBy(desc("revenue_c4"), asc("o_orderkey"))
      .limit(10)
  }

  val q3TopOrdersSql: String =
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_c4
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'AUTOMOBILE'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue_c4 DESC, o_orderkey LIMIT 10""".stripMargin

  /** Q5 local-supplier volume: the 6-way star join (lineitem at the
    * center; customer/supplier must share a nation) rolled up to national
    * revenue for one region-year. Every dimension chain
    * (supplier→nation→region, customer) broadcasts; the only shuffle left
    * is lineitem⋈orders and the final 5-row aggregate.
    */
  def q5RegionVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").where("r_name = 'ASIA'")
    val nation = Tables.load(spark, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val customer = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
    val orders = Tables.load(spark, dir, "orders")
      .where("o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1997-01-01 00:00:00'")
      .select("o_orderkey", "o_custkey")
    val lines = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
    lines
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum("rev_c4").as("revenue_c4"))
      .orderBy(desc("revenue_c4"), asc("n_name"))
  }

  val q5RegionVolumeSql: String =
    """SELECT n_name,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_c4
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue_c4 DESC, n_name""".stripMargin

  /** Q7 volume shipping: revenue flow between two nations by ship year —
    * the bidirectional-pair pattern (supp_nation, cust_nation) ∈
    * {(A,B),(B,A)}. Both nation chains broadcast; lineitem⋈orders is the
    * one big shuffle and the year extraction stays on the scan side.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
      .where("n_name IN ('NATION_3', 'NATION_7')")
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .selectExpr("s_suppkey", "n_name AS supp_nation")
    val customer = Tables.load(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .selectExpr("c_custkey", "n_name AS cust_nation")
    val orders = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val lines = Tables.load(spark, dir, "lineitem")
      .where("l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'")
      .selectExpr("l_orderkey", "l_suppkey", "year(l_shipdate) AS l_year",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
    lines
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .where("supp_nation <> cust_nation")
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rev_c4").as("revenue_c4"))
      .selectExpr("supp_nation", "cust_nation", "CAST(l_year AS BIGINT) AS l_year",
        "revenue_c4")
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeShippingSql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |       year(l_shipdate)::BIGINT AS l_year,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_c4
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name IN ('NATION_3', 'NATION_7')
      |  AND cn.n_name IN ('NATION_3', 'NATION_7')
      |  AND sn.n_name <> cn.n_name
      |  AND l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q10 returned-item reporting: customers who returned items in a
    * quarter, ranked by lost revenue, top 20. Customer is the join spine;
    * the returnflag filter prunes lineitem on the scan, nation broadcasts,
    * and the limit plans as TakeOrderedAndProject.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .where("o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1997-01-01 00:00:00'")
      .select("o_orderkey", "o_custkey")
    val lines = Tables.load(spark, dir, "lineitem")
      .where("l_returnflag = 'R'")
      .selectExpr("l_orderkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    lines
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum("rev_c4").as("revenue_c4"))
      .selectExpr("c_custkey", "c_name",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c", "n_name",
        "revenue_c4")
      .orderBy(desc("revenue_c4"), asc("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    """SELECT c_custkey, c_name,
      |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c, n_name,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_c4
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue_c4 DESC, c_custkey LIMIT 20""".stripMargin

  /** Q18 large-quantity orders: the HAVING-on-aggregate pattern — orders
    * whose total quantity clears a threshold, with customer context
    * (semi-join by aggregate, no correlated subquery needed). The
    * qualifying set is ~0.3% of orders at every measured sf — tiny here,
    * but data-dependent at 100 TB, so the join strategy is deliberately
    * LEFT TO AQE (runtime size decides broadcast vs shuffled hash) rather
    * than hard-hinted like the fixed-cardinality dimension chains.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c")
    val big = li.groupBy("l_orderkey")
      .agg(sum("qty_c").as("sum_qty_c"))
      .where("sum_qty_c > 30000") // 300 units in cents-scale
    val orders = Tables.load(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(o_orderdate AS STRING) AS o_orderdate",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c")
    val customer = Tables.load(spark, dir, "customer").select("c_custkey", "c_name")
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .selectExpr("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "totalprice_c", "sum_qty_c")
      .orderBy(desc("totalprice_c"), asc("o_orderkey"))
      .limit(100)
  }

  val q18LargeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_c
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
      |SELECT c_name, c_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
      |       sum_qty_c
      |FROM big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""".stripMargin

  /** Q12 shipping-priority lateness (adapted: the schema has no l_shipmode,
    * so the grouping key is ship YEAR): per year of lines shipped more than
    * 60 days after their order date, how many belong to high-priority
    * (1-URGENT/2-HIGH) vs lower-priority orders. Conditional aggregation
    * over one lineitem⋈orders shuffle; the date filter is a scan-side
    * comparison of two pushed columns.
    */
  def q12Lateness(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .where("l_shipdate > o_orderdate + INTERVAL 60 DAYS")
      .selectExpr("year(l_shipdate) AS ship_year",
        "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS hi")
      .groupBy("ship_year")
      .agg(sum("hi").as("high_line_count"),
        sum(expr("1 - hi")).as("low_line_count"))
      .selectExpr("CAST(ship_year AS BIGINT) AS ship_year",
        "high_line_count", "low_line_count")
      .orderBy("ship_year")
  }

  val q12LatenessSql: String =
    """SELECT year(l_shipdate)::BIGINT AS ship_year,
      |       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      |       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1 ORDER BY ship_year""".stripMargin

  /** Q14 promotion revenue share: percent of a quarter's discounted revenue
    * from PROMO-type parts. Part broadcasts; the share is ONE fixed double
    * expression over two exact integer sums (the momentStats rule), so the
    * percentage hash-matches cross-engine.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part").select("p_partkey", "p_type")
    Tables.load(spark, dir, "lineitem")
      .where("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01 00:00:00'")
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(expr("CASE WHEN p_type = 'PROMO' THEN rev_c4 ELSE 0 END")).as("promo_c4"),
        sum("rev_c4").as("total_c4"))
      .selectExpr("promo_c4", "total_c4",
        "100.0 * CAST(promo_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE) AS promo_pct")
  }

  val q14PromoRevenueSql: String =
    """WITH s AS (
      |  SELECT sum(CASE WHEN p_type = 'PROMO'
      |             THEN CAST(round(l_extendedprice * 100) AS BIGINT)
      |                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |             ELSE 0 END)::BIGINT AS promo_c4,
      |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS total_c4
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01')
      |SELECT promo_c4, total_c4,
      |       100.0 * CAST(promo_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE) AS promo_pct
      |FROM s""".stripMargin

  /** Q19 disjunctive-predicate revenue (adapted to the available columns:
    * brand × size band × quantity band instead of shipmode/container): the
    * classic OR-of-ANDs shape that exercises predicate pushdown through a
    * broadcast join — each disjunct pairs a part-side and a lineitem-side
    * band, so neither side's filter alone is selective.
    */
  def q19BandedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part").select("p_partkey", "p_brand", "p_size")
    Tables.load(spark, dir, "lineitem")
      .selectExpr("l_partkey", "l_quantity",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .where(
        """(p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 20)
          | OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
          | OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin)
      .agg(sum("rev_c4").as("revenue_c4"), count(lit(1)).as("n_lines"))
  }

  val q19BandedRevenueSql: String =
    """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_c4,
      |       count(*)::BIGINT AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q1_pricing" -> q1Pricing,
    "tpch_q3_top_orders" -> q3TopOrders,
    "tpch_q5_region_volume" -> q5RegionVolume,
    "tpch_q7_volume_shipping" -> q7VolumeShipping,
    "tpch_q10_returned_items" -> q10ReturnedItems,
    "tpch_q18_large_orders" -> q18LargeOrders,
    "tpch_q12_lateness" -> q12Lateness,
    "tpch_q14_promo_revenue" -> q14PromoRevenue,
    "tpch_q19_banded_revenue" -> q19BandedRevenue)

  val oracles: Map[String, String] = Map(
    "tpch_q1_pricing" -> q1PricingSql,
    "tpch_q3_top_orders" -> q3TopOrdersSql,
    "tpch_q5_region_volume" -> q5RegionVolumeSql,
    "tpch_q7_volume_shipping" -> q7VolumeShippingSql,
    "tpch_q10_returned_items" -> q10ReturnedItemsSql,
    "tpch_q18_large_orders" -> q18LargeOrdersSql,
    "tpch_q12_lateness" -> q12LatenessSql,
    "tpch_q14_promo_revenue" -> q14PromoRevenueSql,
    "tpch_q19_banded_revenue" -> q19BandedRevenueSql)
}
