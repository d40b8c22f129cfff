package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The relational surface beyond the reference's own operators (SURVEY.md
  * §2.2: joins, aggregation flavors, window functions, set ops, sorts/limits,
  * scalar functions — all absent in the reference, built-in in Spark). These
  * queries prove the full surface a reference user would gain, each oracle-
  * checked against DuckDB.
  *
  * FP-determinism strategy for sums: cast the SOURCE columns (which carry
  * exact 2-decimal values) to DECIMAL, do all arithmetic in exact decimal,
  * and cast to DOUBLE only at the end — immune to accumulation order and to
  * cross-engine `round()` tie-breaking differences (Spark rounds via exact
  * BigDecimal HALF_UP; DuckDB scales in double first), so hash-stable.
  */
object ExtendedQueries {

  /** Multi-way join + grouped aggregation: revenue per nation (TPC-H Q5
    * shape). Plan: lineitem⋈orders shuffle join on orderkey; customer⋈nation
    * broadcast (small dims); partial aggregation before the final group
    * shuffle. At 100 TB: dims broadcast, fact tables co-partition on the
    * join key, AQE handles skew.
    */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("nation")
  }

  val joinAggSql: String =
    """SELECT n_name AS nation,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |       count(*)::BIGINT AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY nation""".stripMargin

  /** Window functions: rank + running aggregate per partition (top-3 orders
    * per customer). One shuffle on the partition key; rank filter pushed
    * into the window via WindowGroupLimit in Spark 4.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .selectExpr("o_custkey", "o_orderkey", "o_totalprice",
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk",
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend")
      .where("rk <= 3")
      .selectExpr("o_custkey", "o_orderkey", "o_totalprice", "CAST(rk AS BIGINT) AS rk", "running_spend")
      .orderBy("o_custkey", "rk")

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk::BIGINT AS rk, running_spend
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |  FROM orders)
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Analytic window FRAMES (SURVEY §2.2 names ranking/analytic/frames —
    * this is the frames/analytic leg): bounded moving frame (last-4-orders
    * spend), frame-derived moving average, lag and first_value per customer
    * order history. Exact decimal frame sums; the moving average is one
    * double division of exact operands — deterministic in both engines.
    */
  def windowFrames(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .selectExpr("o_custkey", "o_orderkey",
        // MICROS-per-day over the date-derived unix_micros — not the
        // events.ts nanos domain (Tables.tsNanosTo*)
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000L AS day",
        "o_totalprice")
      .selectExpr("o_custkey", "o_orderkey", "day", "o_totalprice",
        """CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          |  (PARTITION BY o_custkey ORDER BY day, o_orderkey
          |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last4_spend""".stripMargin,
        """CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          |  (PARTITION BY o_custkey ORDER BY day, o_orderkey
          |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
          | / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
          |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last4_avg""".stripMargin,
        """lag(o_totalprice, 1) OVER
          |  (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS prev_price""".stripMargin,
        """first_value(o_orderkey) OVER
          |  (PARTITION BY o_custkey ORDER BY day, o_orderkey
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order""".stripMargin)
      .orderBy("o_custkey", "day", "o_orderkey")

  val windowFramesSql: String =
    """SELECT o_custkey, o_orderkey,
      |       epoch_us(o_orderdate) // 86400000000 AS day, o_totalprice,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |         (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last4_spend,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |         (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |        / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last4_avg,
      |       lag(o_totalprice, 1) OVER
      |         (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey) AS prev_price,
      |       first_value(o_orderkey) OVER
      |         (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order
      |FROM orders
      |ORDER BY o_custkey, day, o_orderkey""".stripMargin

  /** Set operations: large parts (size > 30) that never shipped. EXCEPT =
    * left-anti + distinct under the hood; both engines use set semantics.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .where("p_size > 30").select(col("p_partkey").as("k"))
    val shipped = Tables.load(spark, dir, "lineitem").select(col("l_partkey").as("k"))
    p.except(shipped).orderBy("k")
  }

  val setOpsSql: String =
    """SELECT p_partkey AS k FROM part WHERE p_size > 30
      |EXCEPT
      |SELECT l_partkey AS k FROM lineitem
      |ORDER BY k""".stripMargin

  /** FULL OUTER join — year-over-year customer activity (1996 vs 1997):
    * customers active in only one of the two years surface as a null side
    * (493 such at sf0.01), so the outer semantics are actually exercised,
    * not vacuously inner. The USING-style join key coalesces across sides
    * in both engines. Plan: two partial-aggregated groupBys feeding one
    * shuffled full-outer hash join on the same key — co-partitioned, no
    * extra exchange; at 100 TB both sides shuffle on o_custkey once.
    */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    def yearAgg(yr: Int, n: String, spend: String): DataFrame =
      o.where(year(col("o_orderdate")) === yr)
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as(n),
          sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double").as(spend))
    yearAgg(1996, "n_96", "spend_96")
      .join(yearAgg(1997, "n_97", "spend_97"), Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey"),
        coalesce(col("n_96"), lit(0L)).as("n_96"),
        coalesce(col("n_97"), lit(0L)).as("n_97"),
        (coalesce(col("n_97"), lit(0L)) - coalesce(col("n_96"), lit(0L))).as("delta_n"),
        coalesce(col("spend_96"), lit(0.0)).as("spend_96"),
        coalesce(col("spend_97"), lit(0.0)).as("spend_97"))
      .orderBy("o_custkey")
  }

  val outerJoinSql: String =
    """SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
      |       COALESCE(a.n_96, 0)::BIGINT AS n_96,
      |       COALESCE(b.n_97, 0)::BIGINT AS n_97,
      |       (COALESCE(b.n_97, 0) - COALESCE(a.n_96, 0))::BIGINT AS delta_n,
      |       COALESCE(a.spend_96, 0.0) AS spend_96,
      |       COALESCE(b.spend_97, 0.0) AS spend_97
      |FROM (SELECT o_custkey, count(*)::BIGINT AS n_96,
      |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend_96
      |      FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey) a
      |FULL OUTER JOIN
      |     (SELECT o_custkey, count(*)::BIGINT AS n_97,
      |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend_97
      |      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey) b
      |ON a.o_custkey = b.o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Semi/anti joins: customers with orders but no high-value order. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val big = o.where("o_totalprice > 100000")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val semiAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin

  /** Rollup (grouping-set aggregation) with null-safe group labels. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("min_qty"), col("max_qty"), col("n"))
      .orderBy("rf", "ls")

  val rollupAggSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS rf,
      |       coalesce(l_linestatus, '(all)') AS ls,
      |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |       count(*)::BIGINT AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** CUBE — all 2^n grouping combinations (the rollup's sibling named in
    * SURVEY §2.2; one Expand + one shuffle, partial-aggregated like any
    * groupBy).
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("st"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("pri"),
        col("n"), col("total"))
      .orderBy("st", "pri")

  val cubeAggSql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS st,
      |       coalesce(o_orderpriority, '(all)') AS pri,
      |       count(*)::BIGINT AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY st, pri""".stripMargin

  /** Sort + limit (global top-k → TakeOrderedAndProject, no full sort). */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  val sortLimitSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  /** Scalar function library (reference §2.2: split/timestamp-parse/abs/
    * min-max compares — plus the standard string/date kit).
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").selectExpr(
      "o_orderkey",
      "upper(o_orderpriority) AS prio_u",
      "substring(o_orderpriority, 1, 1) AS prio_code",
      "CAST(split(o_orderpriority, '-')[0] AS BIGINT) AS prio_num",
      "CAST(abs(CAST(o_totalprice AS DECIMAL(18,2)) - 100000.00) AS DOUBLE) AS dist_100k",
      "least(o_totalprice, 100000.0) AS capped",
      "CAST(greatest(year(o_orderdate), 1995) AS BIGINT) AS yr_floor",
      "CAST(month(o_orderdate) AS BIGINT) AS mth",
      "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS odate_ms"
    ).orderBy("o_orderkey")

  val scalarFuncsSql: String =
    """SELECT o_orderkey,
      |       upper(o_orderpriority) AS prio_u,
      |       substring(o_orderpriority, 1, 1) AS prio_code,
      |       CAST(string_split(o_orderpriority, '-')[1] AS BIGINT) AS prio_num,
      |       CAST(abs(CAST(o_totalprice AS DECIMAL(18,2)) - 100000.00) AS DOUBLE) AS dist_100k,
      |       least(o_totalprice, 100000.0) AS capped,
      |       greatest(year(o_orderdate), 1995)::BIGINT AS yr_floor,
      |       month(o_orderdate)::BIGINT AS mth,
      |       epoch_ms(o_orderdate) AS odate_ms
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Aggregation flavors: distinct counts, conditional aggregation,
    * exact-decimal average re-derived as double.
    *
    * PLAN NOTE: two count(DISTINCT ...) in one agg plan as Spark's Expand
    * strategy (input replicated ×3, then two-phase aggregate) — the
    * canonical exact-multi-distinct plan, kept as the honest demonstration
    * of the operator. It is shuffle-partial-aggregated and spillable, just
    * wider than a plain agg; the SCALE paths for distinct cardinality are
    * the sketches ([[Sketches.approxStats]] HLL++, [[Sketches.hllRollup]]
    * mergeable DataSketches) — exact distincts at 100 TB are a deliberate,
    * priced decision, not a default.
    */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_linestatus").as("ls"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_sp"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_discounted"),
        sum(expr("CAST(l_quantity AS DECIMAL(18,2))")).cast("double").as("sum_qty"))
      .withColumn("avg_qty", expr("CAST(sum_qty / n AS DOUBLE)"))
      .orderBy("ls")

  val aggStatsSql: String =
    """SELECT ls, n, n_parts, n_sp, n_discounted, sum_qty, sum_qty / n AS avg_qty
      |FROM (
      |  SELECT l_linestatus AS ls, count(*)::BIGINT AS n,
      |         count(DISTINCT l_partkey)::BIGINT AS n_parts,
      |         count(DISTINCT (l_suppkey, l_partkey))::BIGINT AS n_sp,
      |         SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)::BIGINT AS n_discounted,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY 1)
      |ORDER BY ls""".stripMargin

  /** Semi-structured extraction: the same `events.props` JSON field pulled
    * two ways — schema-directed `from_json` (typed struct, the bulk-ETL
    * path: one parse, full codegen) and `get_json_object` path lookup (the
    * ad-hoc path). Both must agree; DuckDB extracts with its native JSON
    * functions. Per-row only — scales as a scan.
    */
  def jsonParse(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").selectExpr(
      "event_id",
      // k BIGINT, not INT: an out-of-int32 props.k would NULL the typed path
      // while the other two paths return the value (ADVICE r2)
      "CAST(from_json(props, 'k BIGINT').k AS BIGINT) AS k_typed",
      "CAST(get_json_object(props, '$.k') AS BIGINT) AS k_path")
      .orderBy("event_id")

  val jsonParseSql: String =
    """SELECT event_id,
      |       json_extract(props, '$.k')::BIGINT AS k_typed,
      |       json_extract(props, '$.k')::BIGINT AS k_path
      |FROM events ORDER BY event_id""".stripMargin

  // ----------------------------------------------------------- histogram

  /** Equi-width histogram bins. */
  val HistBins = 20

  /** Two-pass equi-width histogram over l_extendedprice — the profiling
    * primitive behind every "distribution of X" dashboard and every
    * range-partitioner choice. Pass 1 is a 1-row min/max aggregate; pass 2
    * broadcasts that row and buckets every value with PURE INTEGER
    * arithmetic: prices quantize to cents (BIGINT), the bin width is an
    * integer `div`, so bucket ids are exact in any engine — no
    * float-boundary flakiness at bin edges. The bucket groupBy is map-side
    * combinable; output is ≤ [[HistBins]] rows.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.load(spark, dir, "lineitem")
      .selectExpr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c")
    val bounds = cents.agg(min("c").as("mn"), max("c").as("mx"))
    cents.crossJoin(broadcast(bounds))
      .selectExpr(
        s"(c - mn) div ((mx - mn) div $HistBins + 1) AS bucket",
        s"mn + ((c - mn) div ((mx - mn) div $HistBins + 1)) * ((mx - mn) div $HistBins + 1) AS lo_cents",
        s"mn + ((c - mn) div ((mx - mn) div $HistBins + 1) + 1) * ((mx - mn) div $HistBins + 1) - 1 AS hi_cents",
        "c")
      .groupBy("bucket", "lo_cents", "hi_cents")
      .agg(count(lit(1)).as("n_rows"), sum("c").as("sum_cents"))
      .orderBy("bucket")
  }

  val histogramSql: String =
    s"""WITH cents AS (
       |  SELECT floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS c FROM lineitem),
       |bounds AS (SELECT min(c) AS mn, max(c) AS mx FROM cents),
       |bucketed AS (
       |  SELECT (c - mn) // ((mx - mn) // $HistBins + 1) AS bucket,
       |         mn + ((c - mn) // ((mx - mn) // $HistBins + 1)) * ((mx - mn) // $HistBins + 1) AS lo_cents,
       |         mn + ((c - mn) // ((mx - mn) // $HistBins + 1) + 1) * ((mx - mn) // $HistBins + 1) - 1 AS hi_cents,
       |         c
       |  FROM cents, bounds)
       |SELECT bucket, lo_cents, hi_cents,
       |       count(*)::BIGINT AS n_rows, sum(c)::BIGINT AS sum_cents
       |FROM bucketed GROUP BY bucket, lo_cents, hi_cents ORDER BY bucket""".stripMargin

  // ------------------------------------------------------ equi-depth bins

  /** Equi-depth bin count. */
  val DepthBins = 10

  /** Equi-DEPTH (equal-frequency) histogram over `events.value` — the
    * complement of [[histogram]]'s equi-width bins and the profiling step
    * behind range partitioners and monotone feature binning. Bin
    * assignment is exact global-rank arithmetic, `bin = rank·K div N`, on
    * [[Ids.contiguous]]'s distributed rank (quantile probe + per-bucket
    * offsets + ONE keyed window — no unpartitioned window, no
    * zipWithIndex), with (value, event_id) as the total order so tie
    * assignment is deterministic cross-engine. The per-bin aggregate is
    * map-side combinable; values quantize to 1e-6 BIGINTs so min/max/sum
    * are exact. The oracle recomputes the same rank formula with a plain
    * row_number — single-node DuckDB can afford the global window that
    * the distributed plan exists to avoid.
    */
  def equidepthBins(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.load(spark, dir, "events")
      .selectExpr("event_id", "value",
        "CAST(round(value * 1000000) AS BIGINT) AS v_u")
    val ranked = Ids.contiguous(vals, Seq("value", "event_id"), idCol = "rk")
    val total = vals.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total))
      .selectExpr(s"rk * $DepthBins div n_total AS bin", "v_u")
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), min("v_u").as("min_v_u"),
        max("v_u").as("max_v_u"), sum("v_u").as("sum_v_u"))
      .orderBy("bin")
  }

  val equidepthBinsSql: String =
    s"""WITH v AS (
       |  SELECT event_id, value, CAST(round(value * 1000000) AS BIGINT) AS v_u
       |  FROM events),
       |r AS (SELECT v_u,
       |             (row_number() OVER (ORDER BY value, event_id) - 1)::BIGINT AS rk
       |      FROM v),
       |n AS (SELECT count(*)::BIGINT AS n_total FROM v)
       |SELECT rk * $DepthBins // n_total AS bin, count(*)::BIGINT AS n_rows,
       |       min(v_u)::BIGINT AS min_v_u, max(v_u)::BIGINT AS max_v_u,
       |       sum(v_u)::BIGINT AS sum_v_u
       |FROM r, n GROUP BY 1 ORDER BY bin""".stripMargin

  // -------------------------------------------------------- grouping ids

  /** Grouping indicator functions over a CUBE — how a consumer of mixed
    * grouping-set output distinguishes a genuine NULL group key from a
    * super-aggregate row: `grouping(col)` per column plus a composite id.
    * The id is EXPLICIT arithmetic (2·g_rf + g_ls) in both engines rather
    * than the native `grouping_id()` — bit order of the native bitmask is
    * an engine convention, the arithmetic is not. Same two-phase Expand
    * aggregate as [[cubeAgg]]; the flags are metadata, not extra passes.
    */
  def groupingIds(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .selectExpr("l_returnflag AS rf", "l_linestatus AS ls",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c")
      .cube("rf", "ls")
      .agg(
        expr("CAST(grouping(rf) AS BIGINT)").as("g_rf"),
        expr("CAST(grouping(ls) AS BIGINT)").as("g_ls"),
        expr("CAST(2 * grouping(rf) + grouping(ls) AS BIGINT)").as("gid"),
        sum("qty_c").as("sum_qty_c"),
        count(lit(1)).as("n"))
      .selectExpr("COALESCE(rf, 'ALL') AS rf_l", "COALESCE(ls, 'ALL') AS ls_l",
        "g_rf", "g_ls", "gid", "sum_qty_c", "n")
      .orderBy("gid", "rf_l", "ls_l")

  val groupingIdsSql: String =
    """SELECT COALESCE(rf, 'ALL') AS rf_l, COALESCE(ls, 'ALL') AS ls_l,
      |       GROUPING(rf)::BIGINT AS g_rf, GROUPING(ls)::BIGINT AS g_ls,
      |       (2 * GROUPING(rf) + GROUPING(ls))::BIGINT AS gid,
      |       sum(qty_c)::BIGINT AS sum_qty_c, count(*)::BIGINT AS n
      |FROM (SELECT l_returnflag AS rf, l_linestatus AS ls,
      |             CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
      |      FROM lineitem)
      |GROUP BY CUBE(rf, ls)
      |ORDER BY gid, rf_l, ls_l""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_grouping_id" -> groupingIds,
    "x_equidepth_bins" -> equidepthBins,
    "x_histogram" -> histogram,
    "x_json_parse" -> jsonParse,
    "x_window_frames" -> windowFrames,
    "x_join_agg" -> joinAgg,
    "x_outer_join" -> outerJoin,
    "x_window_rank" -> windowRank,
    "x_setops" -> setOps,
    "x_semi_anti" -> semiAnti,
    "x_rollup" -> rollupAgg,
    "x_cube" -> cubeAgg,
    "x_sort_limit" -> sortLimit,
    "x_scalar_funcs" -> scalarFuncs,
    "x_agg_stats" -> aggStats)

  val oracles: Map[String, String] = Map(
    "x_grouping_id" -> groupingIdsSql,
    "x_equidepth_bins" -> equidepthBinsSql,
    "x_histogram" -> histogramSql,
    "x_json_parse" -> jsonParseSql,
    "x_window_frames" -> windowFramesSql,
    "x_join_agg" -> joinAggSql,
    "x_outer_join" -> outerJoinSql,
    "x_window_rank" -> windowRankSql,
    "x_setops" -> setOpsSql,
    "x_semi_anti" -> semiAntiSql,
    "x_rollup" -> rollupAggSql,
    "x_cube" -> cubeAggSql,
    "x_sort_limit" -> sortLimitSql,
    "x_scalar_funcs" -> scalarFuncsSql,
    "x_agg_stats" -> aggStatsSql)
}
