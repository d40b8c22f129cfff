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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q1_pricing" -> q1Pricing,
    "tpch_q3_top_orders" -> q3TopOrders,
    "tpch_q5_region_volume" -> q5RegionVolume)

  val oracles: Map[String, String] = Map(
    "tpch_q1_pricing" -> q1PricingSql,
    "tpch_q3_top_orders" -> q3TopOrdersSql,
    "tpch_q5_region_volume" -> q5RegionVolumeSql)
}
