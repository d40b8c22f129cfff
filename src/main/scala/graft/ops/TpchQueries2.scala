package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The remainder of the TPC-H-shaped suite (Q2/Q4/Q6/Q8/Q9/Q11/Q13/Q15/
  * Q16/Q17/Q20/Q21/Q22) — together with [[TpchQueries]] this completes all
  * 22 decision-support patterns over the star schema.
  *
  * The testdata schema has no `partsupp`, `l_commitdate`/`l_receiptdate`,
  * `c_phone`, or comment columns, so the affected queries are ADAPTED: each
  * keeps its defining relational pattern (correlated scalar min, EXISTS /
  * NOT-EXISTS anti-correlation, scalar-subquery HAVING, outer-join
  * distribution histogram, nested semi-joins) on stand-in columns —
  * `lineitem`'s observed (part, supplier) pairs stand in for `partsupp`,
  * "shipped > 60/75 days after order date" stands in for the
  * receipt-vs-commit lateness, and negative `s_acctbal` stands in for the
  * complaint filter. Money follows the [[TpchQueries]] convention: exact
  * integer cents (1e-2) / 1e-4 / 1e-6 dollar units summed as BIGINT, with
  * doubles only in final fixed expressions over exact integers, so every
  * row hash-matches the DuckDB oracle bit-identically.
  */
object TpchQueries2 {

  private def li(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")

  /** Q2 minimum-cost supplier (adapted): `partsupp.ps_supplycost` becomes
    * the minimum observed unit price per (part, supplier) pair from
    * lineitem — `min(l_extendedprice / l_quantity)`, an IEEE double whose
    * min is order-free and cross-engine exact (no summation involved).
    * The defining pattern stands: for every size-15 part, the EUROPE
    * supplier(s) achieving the region-wide minimum cost (correlated scalar
    * min). Both dimension filters ride their broadcast joins BELOW the
    * aggregate (a per-pair min only sees that pair's lines, so
    * pre-filtering by part/supplier attributes is lossless), leaving the
    * one shuffle carrying only the selected-parts × region-suppliers
    * lines (~2% of the fact table here) — the same
    * correlation-key-restriction argument as [[q17SmallQuantity]]. The
    * per-part min is then a window over tiny groups. Grouping (and the
    * LIMIT tiebreak) is keyed on `s_suppkey` — the true supplier identity
    * — so two suppliers sharing name/acctbal/nation stay distinct rows,
    * exactly as the oracle's (l_partkey, l_suppkey) CTE keeps them.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").where("r_name = 'EUROPE'")
    val nation = Tables.load(spark, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .selectExpr("s_suppkey", "s_name",
        "CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c", "n_name")
    val parts = Tables.load(spark, dir, "part")
      .where("p_size = 15").select("p_partkey", "p_name")
    val offers = li(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "acctbal_c", "n_name")
      .agg(min(expr("l_extendedprice / l_quantity")).as("unit_cost"))
    offers
      .withColumn("min_cost", min("unit_cost").over(Window.partitionBy("p_partkey")))
      .where(col("unit_cost") === col("min_cost"))
      .select("acctbal_c", "s_name", "n_name", "p_partkey", "p_name", "s_suppkey", "unit_cost")
      .orderBy(desc("acctbal_c"), asc("n_name"), asc("s_name"), asc("p_partkey"),
        asc("s_suppkey"))
      .limit(100)
  }

  val q2MinCostSupplierSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name, CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c, n_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT acctbal_c, s_name, n_name, p_partkey, p_name, s_suppkey, unit_cost
      |FROM ps
      |JOIN part ON l_partkey = p_partkey
      |JOIN eu ON l_suppkey = s_suppkey
      |WHERE p_size = 15
      |  AND unit_cost = (SELECT min(ps2.unit_cost)
      |                   FROM ps ps2 JOIN eu e2 ON ps2.l_suppkey = e2.s_suppkey
      |                   WHERE ps2.l_partkey = part.p_partkey)
      |ORDER BY acctbal_c DESC, n_name, s_name, p_partkey, s_suppkey LIMIT 100""".stripMargin

  /** Q4 order-priority checking (adapted lateness: shipped > 60 days after
    * order date, as in [[TpchQueries.q12Lateness]]): orders in a quarter
    * with at least one late line, counted per priority. The EXISTS becomes
    * a LEFT SEMI join whose condition spans both sides (equi key plus a
    * non-equi date comparison) — Spark plans the quarter filter onto the
    * orders scan and the semi join dedups before the 5-group aggregate.
    */
  def q4PriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .where("o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1996-10-01 00:00:00'")
    val lines = li(spark, dir).select("l_orderkey", "l_shipdate")
    orders
      .join(lines,
        col("o_orderkey") === col("l_orderkey") &&
          expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4PriorityCheckSql: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q6 forecast-revenue change: the pure-scan query — one lineitem pass
    * with a year + discount-band + quantity filter, no joins, map-side
    * partial aggregation to a single row. Revenue = price × discount in
    * exact 1e-4 dollar units. At 100 TB this is the query that proves
    * filters reach the parquet scan: date and quantity push down as-is,
    * and the discount band gets a REDUNDANT raw-column bracket
    * (`l_discount BETWEEN 0.04 AND 0.08`, strictly wider than the exact
    * integer band that decides semantics) so discount pruning also
    * happens at the scan instead of only after the cents cast.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    li(spark, dir)
      .where("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_quantity < 24 AND " +
        "l_discount BETWEEN 0.04 AND 0.08")
      .selectExpr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c",
        "CAST(round(l_discount * 100) AS BIGINT) AS disc_pct")
      .where("disc_pct BETWEEN 5 AND 7")
      .agg(sum(expr("price_c * disc_pct")).as("revenue_c4"),
        count(lit(1)).as("n_lines"))

  val q6ForecastSql: String =
    """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * CAST(round(l_discount * 100) AS BIGINT))::BIGINT AS revenue_c4,
      |       count(*)::BIGINT AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_quantity < 24
      |  AND l_discount BETWEEN 0.04 AND 0.08
      |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7""".stripMargin

  /** Q8 national market share: of the ASIA market's STANDARD-part revenue
    * in 1995-1996 (market = customer's region), the share supplied by
    * NATION_3, per order year. The share is one fixed double division of
    * two exact BIGINT sums, so it hash-matches bit-identically. Customer,
    * part and supplier chains all broadcast; lineitem⋈orders is the single
    * big shuffle, then a 2-row aggregate.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").where("r_name = 'ASIA'")
    val custNation = Tables.load(spark, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val customer = Tables.load(spark, dir, "customer")
      .join(broadcast(custNation), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = Tables.load(spark, dir, "nation")
      .selectExpr("n_nationkey AS sn_key", "n_name AS supp_nation")
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val part = Tables.load(spark, dir, "part")
      .where("p_type = 'STANDARD'").select("p_partkey")
    val orders = Tables.load(spark, dir, "orders")
      .where("o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1997-01-01 00:00:00'")
      .selectExpr("o_orderkey", "o_custkey", "year(o_orderdate) AS o_year")
    li(spark, dir)
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(expr("CASE WHEN supp_nation = 'NATION_3' THEN rev_c4 ELSE 0 END"))
          .as("nation_c4"),
        sum("rev_c4").as("total_c4"))
      .selectExpr("CAST(o_year AS BIGINT) AS o_year", "nation_c4", "total_c4",
        "CAST(nation_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE) AS mkt_share")
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """WITH g AS (
      |  SELECT year(o_orderdate)::BIGINT AS o_year,
      |         sum(CASE WHEN sn.n_name = 'NATION_3'
      |             THEN CAST(round(l_extendedprice * 100) AS BIGINT)
      |                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |             ELSE 0 END)::BIGINT AS nation_c4,
      |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS total_c4
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1)
      |SELECT o_year, nation_c4, total_c4,
      |       CAST(nation_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE) AS mkt_share
      |FROM g ORDER BY o_year""".stripMargin

  /** Q9 product-type profit (adapted cost: `ps_supplycost` becomes
    * `p_retailprice`, the schema's unit-cost stand-in): per supplier
    * nation and order year, profit = discounted revenue − retail cost of
    * the shipped quantity, over parts whose name contains "red". Both
    * terms are exact 1e-4 dollar integers (price_c × pct and retail_c ×
    * qty_c), so the difference sums exactly. Part + supplier broadcast;
    * lineitem⋈orders is the shuffle.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .where("p_name LIKE '%red%'")
      .selectExpr("p_partkey", "CAST(round(p_retailprice * 100) AS BIGINT) AS retail_c")
    val nation = Tables.load(spark, dir, "nation").select("n_nationkey", "n_name")
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val orders = Tables.load(spark, dir, "orders")
      .selectExpr("o_orderkey", "year(o_orderdate) AS o_year")
    li(spark, dir)
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name", "o_year")
      .agg(sum(expr("rev_c4 - retail_c * qty_c")).as("profit_c4"))
      .selectExpr("n_name", "CAST(o_year AS BIGINT) AS o_year", "profit_c4")
      .orderBy(asc("n_name"), desc("o_year"))
  }

  val q9ProductProfitSql: String =
    """SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |           - CAST(round(p_retailprice * 100) AS BIGINT)
      |             * CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS profit_c4
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2
      |ORDER BY n_name, o_year DESC""".stripMargin

  /** Q11 important stock (adapted: shipped value per part from one
    * nation's suppliers stands in for `ps_supplycost × ps_availqty`):
    * parts whose value exceeds 0.1% of the nation's total — the
    * scalar-subquery HAVING pattern. The threshold compare is an exact
    * integer cross-multiplication (value × 1000 > total), no doubles. The
    * 4-supplier dimension broadcasts; the total is a 1-row broadcast
    * cross-join back onto the per-part aggregate.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation").where("n_name = 'NATION_5'")
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = li(spark, dir)
      .selectExpr("l_partkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum("rev_c4").as("value_c4"))
    val total = value.agg(sum("value_c4").as("total_c4"))
    value.crossJoin(broadcast(total))
      .where(expr("value_c4 * 1000 > total_c4"))
      .select("l_partkey", "value_c4")
      .orderBy(desc("value_c4"), asc("l_partkey"))
  }

  val q11ImportantStockSql: String =
    """WITH v AS (
      |  SELECT l_partkey,
      |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS value_c4
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_5'
      |  GROUP BY 1)
      |SELECT l_partkey, value_c4
      |FROM v
      |WHERE value_c4 * 1000 > (SELECT sum(value_c4) FROM v)
      |ORDER BY value_c4 DESC, l_partkey""".stripMargin

  /** Q13 customer order-count distribution: LEFT OUTER join so zero-order
    * customers survive into the histogram (the defining feature), with the
    * comment filter adapted to an order-priority exclusion pushed INTO the
    * join condition (not a WHERE — that would turn the join inner). Two
    * aggregations: per-customer count, then the count-of-counts.
    */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer").select("c_custkey")
    val orders = Tables.load(spark, dir, "orders")
      .where("o_orderpriority <> '4-NOT SPECIFIED'")
      .select("o_orderkey", "o_custkey")
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count("o_orderkey").as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val q13OrderDistributionSql: String =
    """WITH c AS (
      |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON c_custkey = o_custkey
      |                  AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY 1)
      |SELECT c_count, count(*)::BIGINT AS custdist
      |FROM c GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15 top supplier: quarter revenue per supplier, then the supplier(s)
    * equal to the maximum — the scalar-max-subquery pattern. Exact BIGINT
    * revenue makes the equality safe cross-engine. The max is a 1-row
    * broadcast; supplier names broadcast onto the winners.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = li(spark, dir)
      .where("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01 00:00:00'")
      .selectExpr("l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4")
      .groupBy("l_suppkey")
      .agg(sum("rev_c4").as("total_revenue_c4"))
    val best = revenue.agg(max("total_revenue_c4").as("max_revenue_c4"))
    val supplier = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_name")
    revenue.crossJoin(broadcast(best))
      .where(col("total_revenue_c4") === col("max_revenue_c4"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue_c4")
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH r AS (
      |  SELECT l_suppkey,
      |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS total_revenue_c4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_revenue_c4
      |FROM r JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue_c4 = (SELECT max(total_revenue_c4) FROM r)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16 parts/supplier relationship (adapted: lineitem's distinct (part,
    * supplier) pairs stand in for `partsupp`; negative account balance
    * stands in for the complaints exclusion): distinct supplier count per
    * (brand, type, size) over a brand/type/size-band filter, excluding
    * flagged suppliers via LEFT ANTI join (the NOT IN pattern, but
    * null-safe and broadcastable). `count(DISTINCT l_suppkey)` dedups the
    * many lineitem observations of each pair in the same aggregate.
    */
  def q16PartSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.load(spark, dir, "supplier")
      .where("s_acctbal < 0").select("s_suppkey")
    val part = Tables.load(spark, dir, "part")
      .where("p_brand <> 'Brand#21' AND p_type <> 'PROMO' AND " +
        "p_size IN (1, 4, 7, 10, 14, 19, 23, 45)")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    li(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  val q16PartSupplierCountsSql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q17 small-quantity-order revenue: lines of one brand/type whose
    * quantity is below 20% of that part's all-time average — the
    * correlated-average pattern, decorrelated into a per-part aggregate
    * joined back. The 0.2×avg compare is exact integer cross-
    * multiplication (5 × qty × n < sum), and `avg_yearly` is the one final
    * double (÷ 7.0, the classic constant). Per-part stats are computed on
    * the brand-filtered lines only — the correlation key is p_partkey, so
    * restricting to the target parts first loses nothing and keeps the
    * shuffle proportional to the selection, not the fact table.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .where("p_brand = 'Brand#13' AND p_type = 'SMALL'").select("p_partkey")
    val lines = li(spark, dir)
      .selectExpr("l_partkey",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val stats = lines.groupBy("p_partkey")
      .agg(sum("qty_c").as("sum_qty_c"), count(lit(1)).as("n_obs"))
      .withColumnRenamed("p_partkey", "sp_partkey")
    lines
      .join(broadcast(stats), col("p_partkey") === col("sp_partkey"))
      .where(expr("qty_c * 5 * n_obs < sum_qty_c"))
      .agg(sum("price_c").as("total_price_c"), count(lit(1)).as("n_lines"))
      .selectExpr("total_price_c", "n_lines",
        "CAST(total_price_c AS DOUBLE) / 7.0 AS avg_yearly_c")
  }

  val q17SmallQuantitySql: String =
    """WITH s AS (
      |  SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS total_price_c,
      |         count(*)::BIGINT AS n_lines
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#13' AND p_type = 'SMALL'
      |    AND CAST(round(l_quantity * 100) AS BIGINT) * 5
      |        * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |      < (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT))
      |         FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey))
      |SELECT total_price_c, n_lines,
      |       CAST(total_price_c AS DOUBLE) / 7.0 AS avg_yearly_c
      |FROM s""".stripMargin

  /** Q20 dominant suppliers (adapted: "availqty > half of shipped" becomes
    * "supplier shipped more than half of a part's 1996 volume"): suppliers
    * who dominated any red-prefixed part — nested aggregation with an
    * exact 2×qty > total integer compare, then a semi join back to
    * supplier. The per-part total is a window over the per-(part,
    * supplier) aggregate: one shuffle keyed on partkey covers both levels.
    */
  def q20DominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .where("p_name LIKE 'red%'").select("p_partkey")
    val shipped = li(spark, dir)
      .where("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'")
      .selectExpr("l_partkey", "l_suppkey",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("qty_c").as("supp_qty_c"))
    val dominant = shipped
      .withColumn("part_qty_c",
        sum("supp_qty_c").over(Window.partitionBy("l_partkey")))
      .where(expr("2 * supp_qty_c > part_qty_c"))
      .select("l_suppkey").distinct()
    Tables.load(spark, dir, "supplier")
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  val q20DominantSuppliersSql: String =
    """WITH sq AS (
      |  SELECT l_partkey, l_suppkey, sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS supp_qty_c
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2),
      |t AS (SELECT l_partkey, sum(supp_qty_c)::BIGINT AS part_qty_c FROM sq GROUP BY 1)
      |SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (SELECT l_suppkey FROM sq JOIN t USING (l_partkey)
      |                    WHERE 2 * supp_qty_c > part_qty_c)
      |ORDER BY s_suppkey""".stripMargin

  /** Q21 suppliers who kept orders waiting (adapted lateness: shipped >
    * 75 days after order date): late lines in multi-supplier 'F' orders
    * where that supplier was the ONLY late one — the EXISTS/NOT-EXISTS
    * anti-correlation. Implemented as one order-keyed aggregate (distinct
    * suppliers, distinct late suppliers) joined back to the late lines —
    * a single shuffle key instead of the oracle's two correlated
    * self-joins, same rows. Top 20 by wait count; s_name breaks ties for
    * a total order.
    */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val fOrders = Tables.load(spark, dir, "orders")
      .where("o_orderstatus = 'F'").select("o_orderkey", "o_orderdate")
    val lines = li(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", expr("l_shipdate > o_orderdate + INTERVAL 75 DAYS"))
    val orderStats = lines.groupBy("o_orderkey")
      .agg(
        countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      .withColumnRenamed("o_orderkey", "st_orderkey")
    val supplier = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_name")
    lines
      .join(orderStats, col("l_orderkey") === col("st_orderkey"))
      .where("late AND n_supp >= 2 AND n_late_supp = 1")
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(20)
  }

  val q21WaitingSuppliersSql: String =
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, count(*)::BIGINT AS numwait
      |FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 75 DAY
      |  AND EXISTS (SELECT 1 FROM l l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l3.o_orderdate + INTERVAL 75 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** Q22 global sales opportunity (adapted: nation-key bucket stands in
    * for the phone country code; "dormant" = no order since 1999):
    * above-average-balance customers in 13 nations with no recent orders,
    * rolled up per nation. The average is the positive-balance mean as an
    * exact integer cross-multiplication (bal × n > sum); the anti join is
    * the NOT EXISTS. Stats broadcast as one row; the anti join's right
    * side is the date-filtered order keys.
    */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .where("c_nationkey < 13")
      .selectExpr("c_custkey", "c_nationkey",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c")
    val stats = cust.where("acctbal_c > 0")
      .agg(sum("acctbal_c").as("sum_pos_c"), count(lit(1)).as("n_pos"))
    val recent = Tables.load(spark, dir, "orders")
      .where("o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'")
      .select("o_custkey")
    cust.crossJoin(broadcast(stats))
      .where(expr("acctbal_c * n_pos > sum_pos_c"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum("acctbal_c").as("totacctbal_c"))
      .orderBy("c_nationkey")
  }

  val q22SalesOpportunitySql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
      |  FROM customer WHERE c_nationkey < 13),
      |s AS (SELECT sum(acctbal_c)::BIGINT AS sum_pos_c, count(*)::BIGINT AS n_pos
      |      FROM cust WHERE acctbal_c > 0)
      |SELECT c_nationkey, count(*)::BIGINT AS numcust, sum(acctbal_c)::BIGINT AS totacctbal_c
      |FROM cust, s
      |WHERE acctbal_c * n_pos > sum_pos_c
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q2_min_cost_supplier" -> q2MinCostSupplier,
    "tpch_q4_priority_check" -> q4PriorityCheck,
    "tpch_q6_forecast" -> q6Forecast,
    "tpch_q8_market_share" -> q8MarketShare,
    "tpch_q9_product_profit" -> q9ProductProfit,
    "tpch_q11_important_stock" -> q11ImportantStock,
    "tpch_q13_order_distribution" -> q13OrderDistribution,
    "tpch_q15_top_supplier" -> q15TopSupplier,
    "tpch_q16_part_supplier_counts" -> q16PartSupplierCounts,
    "tpch_q17_small_quantity" -> q17SmallQuantity,
    "tpch_q20_dominant_suppliers" -> q20DominantSuppliers,
    "tpch_q21_waiting_suppliers" -> q21WaitingSuppliers,
    "tpch_q22_sales_opportunity" -> q22SalesOpportunity)

  val oracles: Map[String, String] = Map(
    "tpch_q2_min_cost_supplier" -> q2MinCostSupplierSql,
    "tpch_q4_priority_check" -> q4PriorityCheckSql,
    "tpch_q6_forecast" -> q6ForecastSql,
    "tpch_q8_market_share" -> q8MarketShareSql,
    "tpch_q9_product_profit" -> q9ProductProfitSql,
    "tpch_q11_important_stock" -> q11ImportantStockSql,
    "tpch_q13_order_distribution" -> q13OrderDistributionSql,
    "tpch_q15_top_supplier" -> q15TopSupplierSql,
    "tpch_q16_part_supplier_counts" -> q16PartSupplierCountsSql,
    "tpch_q17_small_quantity" -> q17SmallQuantitySql,
    "tpch_q20_dominant_suppliers" -> q20DominantSuppliersSql,
    "tpch_q21_waiting_suppliers" -> q21WaitingSuppliersSql,
    "tpch_q22_sales_opportunity" -> q22SalesOpportunitySql)
}
