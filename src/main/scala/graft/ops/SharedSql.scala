package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Dialect-neutral SQL: the SAME string runs through `spark.sql` (over
  * `Tables.registerAll` temp views) and through the DuckDB oracle — the
  * strongest possible SQL-layer parity proof (no per-engine translation at
  * all). Constraints: ANSI subset both engines share — CAST (no `::`),
  * year()/BETWEEN/GROUP BY/ORDER BY, exact decimal arithmetic from source
  * columns.
  */
object SharedSql {

  /** TPC-H Q6-shaped discount revenue, grouped by ship year. */
  val discountRevenue: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS discount_revenue
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |GROUP BY year(l_shipdate)
      |ORDER BY yr""".stripMargin

  /** Join + having-style filter, dialect-neutral. */
  val bigSpenders: String =
    """SELECT c.c_custkey, c.c_name,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_name
      |HAVING count(*) >= 12
      |ORDER BY c.c_custkey""".stripMargin

  /** Correlated scalar subquery — Catalyst decorrelates it into a join;
    * DuckDB runs it natively. Orders whose price exceeds 1000× their own
    * line-quantity total (exact decimal arithmetic).
    */
  val correlatedSubquery: String =
    """SELECT o.o_orderkey, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice >
      |      (SELECT COALESCE(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
      |                            AS DOUBLE), 0.0) * 1000.0
      |       FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |ORDER BY o.o_orderkey""".stripMargin

  /** LEFT OUTER join with null-side aggregation: every customer has SOME
    * order in this data, so the null side comes from the join CONDITION —
    * customers with no order above 150k keep their row with n_big = 0 /
    * big_spend = 0.0 (count over a nullable column + COALESCE'd SUM are the
    * ANSI null-side aggregation idioms both engines share).
    */
  val leftJoin: String =
    """SELECT c.c_custkey,
      |       CAST(count(o.o_orderkey) AS BIGINT) AS n_big,
      |       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))),
      |                     CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS big_spend
      |FROM customer c LEFT JOIN orders o
      |  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 150000
      |GROUP BY c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin

  /** INTERSECT set op: large parts that actually shipped. */
  val intersectParts: String =
    """SELECT p_partkey AS k FROM part WHERE p_size > 30
      |INTERSECT
      |SELECT l_partkey AS k FROM lineitem
      |ORDER BY k""".stripMargin

  /** Explicit GROUPING SETS (the third grouping-set form next to
    * ExtendedQueries' ROLLUP/CUBE) — two chosen aggregation levels, no
    * intermediate rollup level, ANSI in both engines.
    */
  val groupingSets: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS rf,
      |       COALESCE(l_linestatus, '(all)') AS ls,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(sql)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_shared_discount_revenue" -> run(discountRevenue) _,
    "sql_shared_big_spenders" -> run(bigSpenders) _,
    "sql_shared_correlated_subquery" -> run(correlatedSubquery) _,
    "sql_shared_left_join" -> run(leftJoin) _,
    "sql_shared_grouping_sets" -> run(groupingSets) _,
    "sql_shared_intersect" -> run(intersectParts) _)

  /** The oracle IS the query — identical bytes. */
  val oracles: Map[String, String] = Map(
    "sql_shared_discount_revenue" -> discountRevenue,
    "sql_shared_big_spenders" -> bigSpenders,
    "sql_shared_correlated_subquery" -> correlatedSubquery,
    "sql_shared_left_join" -> leftJoin,
    "sql_shared_grouping_sets" -> groupingSets,
    "sql_shared_intersect" -> intersectParts)
}
