package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregate families completing the SQL surface beyond
  * [[ExtendedQueries.aggStats]] (counts/sums) and [[Sketches]]
  * (approximate): ordered string aggregation, bag-semantics set
  * operations, exact discrete percentiles, and the variance family
  * computed from exact integer moments. Each is oracle-checked with
  * bit-stable cross-engine arithmetic.
  */
object AggFamilies {

  // ----------------------------------------------------------- string_agg

  /** Ordered string aggregation (LISTAGG/string_agg) — per-nation roster of
    * top customers. Cross-engine determinism requires an explicit element
    * order: Spark sorts the collected array (`array_sort(collect_list)`),
    * the oracle uses `string_agg(... ORDER BY ...)`. collect_list is a
    * two-phase ObjectHashAggregate (partials merge map-side); the group
    * cardinality — not the input size — bounds the result, and the
    * `c_acctbal > 9000` pushdown keeps rosters small at any scale.
    */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer").where("c_acctbal > 9000")
    val nation = Tables.load(spark, dir, "nation")
    cust.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n"),
        concat_ws("|", array_sort(collect_list(col("c_name")))).as("roster"))
      .orderBy("nation")
  }

  val stringAggSql: String =
    """SELECT n_name AS nation, count(*)::BIGINT AS n,
      |       string_agg(c_name, '|' ORDER BY c_name) AS roster
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 9000
      |GROUP BY n_name ORDER BY nation""".stripMargin

  // ----------------------------------------------------------- setops all

  /** Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL preserve
    * duplicate multiplicity (min / difference of per-key counts), unlike
    * [[ExtendedQueries.setOps]]'s distinct EXCEPT. Spark plans both as a
    * single aggregate over a union with signed counts — one shuffle, no
    * join. The result multisets re-aggregate to (key, multiplicity) so the
    * driver row stays bounded.
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val heavy = li.where("l_quantity > 25").select(col("l_partkey").as("k"))
    val returned = li.where("l_returnflag = 'R'").select(col("l_partkey").as("k"))
    val both = heavy.intersectAll(returned)
      .groupBy("k").agg(count(lit(1)).as("n_both"))
    val onlyHeavy = heavy.exceptAll(returned)
      .groupBy("k").agg(count(lit(1)).as("n_only_heavy"))
    both.join(onlyHeavy, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        coalesce(col("n_only_heavy"), lit(0L)).as("n_only_heavy"))
      .orderBy("k")
  }

  val setOpsAllSql: String =
    """WITH heavy AS (SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 25),
      |ret AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
      |b AS (SELECT k, count(*)::BIGINT AS n_both
      |      FROM (SELECT k FROM heavy INTERSECT ALL SELECT k FROM ret) GROUP BY k),
      |oh AS (SELECT k, count(*)::BIGINT AS n_only_heavy
      |       FROM (SELECT k FROM heavy EXCEPT ALL SELECT k FROM ret) GROUP BY k)
      |SELECT COALESCE(b.k, oh.k) AS k,
      |       COALESCE(n_both, 0)::BIGINT AS n_both,
      |       COALESCE(n_only_heavy, 0)::BIGINT AS n_only_heavy
      |FROM b FULL OUTER JOIN oh ON b.k = oh.k
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------- percentiles

  /** Exact DISCRETE percentiles (p25/p50/p75/p95 of extended price per
    * return flag) by RANK ARITHMETIC, not `percentile_disc`: the native
    * aggregate buffers every group's values inside an ObjectHashAggregate —
    * at 100× a 3-group aggregation holds ~60M doubles per group on one
    * task's heap, an OOM, not a spill (round-5 verdict). Here the heavy
    * path is a per-group sort feeding `row_number` — SortExec +
    * WindowExec, both spill to disk — and the only aggregation is over the
    * 3-row count frame. percentile_disc(p) is the first element whose
    * cume_dist ≥ p, i.e. the value at 1-indexed rank ceil(p·n); the rank
    * is computed in exact integer arithmetic ((r·n + 99) div 100 for
    * p = r/100) because float `ceil(0.95 * n)` misrounds when p·n lands on
    * an integer (0.95·20 = 19.0000…04 → 20, off by one). Verified against
    * DuckDB's quantile_disc on n = 1…21 edge cases.
    *
    * The rank itself is [[Ids.contiguousBy]]'s DISTRIBUTED per-group rank
    * (quantile-bucketed keyed window), not a plain
    * `Window.partitionBy(rf)`: with 3 return flags the plain window caps
    * parallelism at 3 forever — measured 36× wall at 100× facts (round-9
    * NOTES) — while the bucketed rank sorts 3 × shuffle-partitions
    * independent spill-safe partitions, the same technique
    * `x_equidepth_bins` uses for its global rank. Tie order inside a rank
    * is arbitrary but value-at-rank is tie-safe (tied rows share `v`).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    val ps = Seq("p25" -> 25, "p50" -> 50, "p75" -> 75, "p95" -> 95)
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("rf"), col("l_extendedprice").as("v"))
    // 3-row count frame → 12-row (rf, pname, rank) target frame, broadcast
    val targets = li.groupBy("rf").agg(count(lit(1)).as("n"))
      .select(col("rf"), explode(array(ps.map { case (pname, r) =>
        struct(lit(pname).as("pname"),
          expr(s"($r * n + 99) div 100").as("rn"))
      }: _*)).as("t"))
      .select(col("rf"), col("t.pname"), col("t.rn"))
    Ids.contiguousBy(li, Seq("rf"), Seq("v"), idCol = "rk")
      .withColumn("rn", col("rk") + 1)
      .join(broadcast(targets), Seq("rf", "rn"))
      .groupBy("rf").pivot("pname", ps.map(_._1)).agg(first("v"))
      .orderBy("rf")
  }

  val percentilesSql: String =
    """SELECT l_returnflag AS rf,
      |       quantile_disc(l_extendedprice, 0.25) AS p25,
      |       quantile_disc(l_extendedprice, 0.50) AS p50,
      |       quantile_disc(l_extendedprice, 0.75) AS p75,
      |       quantile_disc(l_extendedprice, 0.95) AS p95
      |FROM lineitem GROUP BY 1 ORDER BY rf""".stripMargin

  // -------------------------------------------------------------- moments

  /** Variance/stddev from EXACT integer moments: prices quantize to cents
    * (BIGINT), the aggregation sums n / Σq / Σq² exactly (Σq² as
    * DECIMAL(38,0) — cents² × row count overflows int64), and the sample
    * variance derives by ONE fixed double expression
    * `(n·Σq² − (Σq)²) / (n·(n−1))` — both engines perform the identical
    * few IEEE operations on identical exact integers, so even the derived
    * doubles hash-match. This is how to get `stddev`-family semantics with
    * cross-engine reproducibility; native stddev_samp's running-sum order
    * differences make it unverifiable by exact compare.
    */
  def momentStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .selectExpr("l_returnflag AS rf",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents")
      .groupBy("rf")
      .agg(
        count(lit(1)).as("n"),
        sum("cents").as("s1"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("s2d"))
      .selectExpr("rf", "n", "s1",
        "CAST(s2d AS DOUBLE) AS s2",
        // sample variance in cents², one deterministic double expression
        "(CAST(n AS DOUBLE) * CAST(s2d AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_cents2")
      .orderBy("rf")

  val momentStatsSql: String =
    """WITH q AS (SELECT l_returnflag AS rf,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |           FROM lineitem),
      |m AS (SELECT rf, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s1,
      |             sum(CAST(cents AS DECIMAL(38,0)) * cents) AS s2d
      |      FROM q GROUP BY rf)
      |SELECT rf, n, s1, CAST(s2d AS DOUBLE) AS s2,
      |       (CAST(n AS DOUBLE) * CAST(s2d AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_cents2
      |FROM m ORDER BY rf""".stripMargin

  // ---------------------------------------------------------------- entry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_string_agg" -> stringAgg,
    "x_setops_all" -> setOpsAll,
    "x_percentiles" -> percentiles,
    "x_moment_stats" -> momentStats)

  val oracles: Map[String, String] = Map(
    "x_string_agg" -> stringAggSql,
    "x_setops_all" -> setOpsAllSql,
    "x_percentiles" -> percentilesSql,
    "x_moment_stats" -> momentStatsSql)
}
