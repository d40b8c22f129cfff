package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-analytics operators — the product-analytics workload an events
  * table exists for: ordered funnels, cohort retention, gap-based
  * sessionization, SCD2 change history, and time-range rolling frames.
  * All absent in the reference (SURVEY.md §2.2 categories: windows,
  * joins, aggregation — composed into the shapes analysts actually run).
  * Every operator is a declarative plan (windows + hash aggregates over
  * the user_id partitioning), so at 100 TB each one costs the shuffles
  * visible in its shape and nothing more; timestamps are µs-truncated
  * (`epoch_us` / `ts div 1000`) — the precision DuckDB surfaces — so
  * cross-engine hashes stay bit-identical (the [[TableOps.latestByKey]]
  * precedent).
  */
object EventAnalytics {

  private val TsUs = graft.Tables.tsNanosToMicrosSql("ts")

  // --------------------------------------------------------------- funnel

  /** Ordered conversion funnel view → click → purchase: for each user the
    * first view, the first click STRICTLY AFTER that view, and the first
    * purchase strictly after that click — the sequenced-min semantics real
    * funnels need (an unordered `min per type` would count a click that
    * preceded the first view). Three aggregations + three joins, ALL keyed
    * on user_id: after the first shuffle every join is co-partitioned, so
    * the plan's cost is one wide shuffle plus per-key hash lookups —
    * unchanged at 1000 executors.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_type", s"$TsUs AS ts_us")
    val users = e.select("user_id").distinct()
    val t1 = e.where("event_type = 'view'")
      .groupBy("user_id").agg(min("ts_us").as("first_view_us"))
    val t2 = e.where("event_type = 'click'")
      .join(t1, "user_id").where(col("ts_us") > col("first_view_us"))
      .groupBy("user_id").agg(min("ts_us").as("first_click_us"))
    val t3 = e.where("event_type = 'purchase'")
      .join(t2, "user_id").where(col("ts_us") > col("first_click_us"))
      .groupBy("user_id").agg(min("ts_us").as("first_purchase_us"))
    users
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .selectExpr("user_id", "first_view_us", "first_click_us", "first_purchase_us",
        """CAST(CASE WHEN first_purchase_us IS NOT NULL THEN 3
          |          WHEN first_click_us IS NOT NULL THEN 2
          |          WHEN first_view_us IS NOT NULL THEN 1
          |          ELSE 0 END AS BIGINT) AS reached""".stripMargin)
      .orderBy("user_id")
  }

  val funnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |t1 AS (SELECT user_id, min(ts_us) AS first_view_us
      |       FROM e WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(ts_us) AS first_click_us
      |       FROM e JOIN t1 USING (user_id)
      |       WHERE event_type = 'click' AND ts_us > first_view_us
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(ts_us) AS first_purchase_us
      |       FROM e JOIN t2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > first_click_us
      |       GROUP BY e.user_id)
      |SELECT u.user_id, first_view_us, first_click_us, first_purchase_us,
      |       (CASE WHEN first_purchase_us IS NOT NULL THEN 3
      |             WHEN first_click_us IS NOT NULL THEN 2
      |             WHEN first_view_us IS NOT NULL THEN 1
      |             ELSE 0 END)::BIGINT AS reached
      |FROM (SELECT DISTINCT user_id FROM e) u
      |LEFT JOIN t1 USING (user_id)
      |LEFT JOIN t2 USING (user_id)
      |LEFT JOIN t3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ retention

  /** Weekly cohort retention: users bucketed by first-activity week, then
    * for every (cohort_week, weeks-since-cohort) cell the count of distinct
    * active users — the retention triangle. Week = epoch-µs integer
    * division (no calendar functions: bit-identical cross-engine and
    * timezone-free). One agg for cohorts + one co-partitioned join + one
    * distinct-count agg; the distinct is per (cohort, offset) cell, so the
    * partial-aggregate dedup happens map-side.
    */
  val WeekUs: Long = 7L * 86400 * 1000000

  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .selectExpr("user_id", s"($TsUs) div $WeekUs AS week")
    val cohorts = e.groupBy("user_id").agg(min("week").as("cohort_week"))
    e.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortRetentionSql: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
       |c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
       |SELECT cohort_week, (week - cohort_week) AS week_offset,
       |       count(DISTINCT user_id)::BIGINT AS n_users
       |FROM e JOIN c USING (user_id)
       |GROUP BY cohort_week, week_offset
       |ORDER BY cohort_week, week_offset""".stripMargin

  // ---------------------------------------------------------- sessionize

  /** Gap-based batch sessionization (30-min inactivity gap — the batch twin
    * of `stream_session_counts`' event-time session windows): session
    * boundaries via lag, session ids via a running sum of boundary flags,
    * then per-session stats. Two windows + one aggregate, all partitioned
    * by user_id → ONE shuffle total; the windows sort locally per key.
    */
  val SessionGapUs: Long = 30L * 60 * 1000000

  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", s"$TsUs AS ts_us")
      .withColumn("new_sess",
        when(col("ts_us") - lag("ts_us", 1).over(order) > SessionGapUs, 1L)
          .otherwise(when(lag("ts_us", 1).over(order).isNull, 1L).otherwise(0L)))
      .withColumn("session_idx", sum("new_sess").over(run))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"))
      .orderBy("user_id", "session_idx")
  }

  val sessionizeSql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
       |f AS (SELECT user_id, event_id, ts_us,
       |             CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
       |                  WHEN ts_us - lag(ts_us) OVER w > $SessionGapUs THEN 1
       |                  ELSE 0 END AS new_sess
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |s AS (SELECT user_id, ts_us,
       |             (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                  ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
       |      FROM f)
       |SELECT user_id, session_idx, count(*)::BIGINT AS n_events,
       |       min(ts_us) AS start_us, max(ts_us) AS end_us,
       |       (max(ts_us) - min(ts_us)) AS duration_us
       |FROM s GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------- scd2

  /** SCD type-2 change history: collapse each user's event stream into
    * versioned state rows (state = event_type) with [valid_from, valid_to)
    * intervals — the dimension-table build every warehouse runs on CDC
    * input. Change detection via lag, version numbering via running sum,
    * interval close via lead over the versions: three windows + one
    * aggregate, all on the user_id partitioning (one shuffle).
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val versions = Window.partitionBy("user_id").orderBy("version")
    Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "event_type", s"$TsUs AS ts_us")
      .withColumn("changed",
        when(lag("event_type", 1).over(order).isNull
          || col("event_type") =!= lag("event_type", 1).over(order), 1L)
          .otherwise(0L))
      .withColumn("version", sum("changed").over(run))
      .groupBy("user_id", "version")
      .agg(min("event_type").as("state"), // constant within a version
        min("ts_us").as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead("valid_from", 1).over(versions))
      .orderBy("user_id", "version")
  }

  val scd2Sql: String =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |           FROM events),
      |f AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL THEN 1
      |                     WHEN event_type <> lag(event_type) OVER w THEN 1
      |                     ELSE 0 END AS changed
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |v AS (SELECT user_id, event_type, ts_us,
      |             (sum(changed) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                  ROWS UNBOUNDED PRECEDING))::BIGINT AS version
      |      FROM f),
      |g AS (SELECT user_id, version, min(event_type) AS state,
      |             min(ts_us) AS valid_from, count(*)::BIGINT AS n_events
      |      FROM v GROUP BY user_id, version)
      |SELECT user_id, version, state, valid_from, n_events,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
      |FROM g ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------- time-range frame

  /** Time-RANGE window frame: per-customer trailing-30-day order total —
    * `RANGE BETWEEN 30 PRECEDING AND CURRENT ROW` over epoch-day order
    * dates (the frame that ROWS frames cannot express when events are
    * irregularly spaced; completes `x_window_frames`' ROWS coverage).
    * Money in cents BIGINT so the frame sums are exact; peers (same-day
    * orders) enter the frame together in both engines by RANGE semantics.
    */
  val RangeDays = 30L

  def timeRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val frame = Window.partitionBy("o_custkey").orderBy("d")
      .rangeBetween(-RangeDays, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .withColumn("trail30_cents", sum("cents").over(frame))
      .withColumn("trail30_orders", count(lit(1)).over(frame))
      .selectExpr("o_orderkey", "o_custkey", "CAST(d AS BIGINT) AS d", "cents",
        "trail30_cents", "trail30_orders")
      .orderBy("o_orderkey")
  }

  val timeRangeFrameSql: String =
    s"""WITH o AS (SELECT o_orderkey, o_custkey,
       |                  datediff('day', DATE '1970-01-01', o_orderdate)::BIGINT AS d,
       |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |           FROM orders)
       |SELECT o_orderkey, o_custkey, d, cents,
       |       (sum(cents) OVER w)::BIGINT AS trail30_cents,
       |       (count(*) OVER w)::BIGINT AS trail30_orders
       |FROM o
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY d
       |             RANGE BETWEEN $RangeDays PRECEDING AND CURRENT ROW)
       |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- gap fill

  /** Time-series gap filling with forward fill — the dense-timeline
    * operation every metrics/feature pipeline runs before windowed
    * models: per-user hourly buckets are DENSIFIED over the user's own
    * [min, max] span (`sequence` + explode — bounded by span, no
    * calendar table join), missing hours flagged, and the last observed
    * value carried forward via `last_value IGNORE NULLS` on the user
    * partitioning. Values ride as exact cents BIGINTs (the
    * [[timeRangeFrame]] quantization), so bucket sums and the carried
    * fill are hash-stable cross-engine. One agg + one span agg + the
    * dense left join + one partitioned window — all on the user_id key.
    */
  val HourUs = 3600000000L

  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", s"($TsUs) div $HourUs AS bucket",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
    val dense = ev.groupBy("user_id")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .selectExpr("user_id", "explode(sequence(b0, b1)) AS bucket")
    dense.join(ev, Seq("user_id", "bucket"), "left")
      .selectExpr("user_id", "bucket",
        "coalesce(n_events, CAST(0 AS BIGINT)) AS n_events",
        "CASE WHEN cents IS NULL THEN CAST(1 AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END AS is_gap",
        "cents")
      .withColumn("filled_cents", expr(
        "last_value(cents) IGNORE NULLS" +
          " OVER (PARTITION BY user_id ORDER BY bucket)"))
      .selectExpr("user_id", "bucket", "n_events", "is_gap", "filled_cents")
      .orderBy("user_id", "bucket")
  }

  val gapFillSql: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) // $HourUs AS bucket,
       |                   count(*)::BIGINT AS n_events,
       |                   sum(round(value * 100)::BIGINT)::BIGINT AS cents
       |            FROM events GROUP BY 1, 2),
       |span AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
       |         FROM ev GROUP BY 1),
       |dense AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket
       |          FROM span),
       |j AS (SELECT d.user_id, d.bucket,
       |             coalesce(e.n_events, 0)::BIGINT AS n_events,
       |             (CASE WHEN e.cents IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_gap,
       |             e.cents
       |      FROM dense d LEFT JOIN ev e
       |        ON d.user_id = e.user_id AND d.bucket = e.bucket)
       |SELECT user_id, bucket::BIGINT AS bucket, n_events, is_gap,
       |       last_value(cents IGNORE NULLS)
       |         OVER (PARTITION BY user_id ORDER BY bucket) AS filled_cents
       |FROM j ORDER BY user_id, bucket""".stripMargin

  // ----------------------------------------------------------- correlation

  /** Pearson correlation from exact integer moments (the [[AggFamilies
    * .momentStats]] construction extended to the cross-moment): quantity
    * and price in cents BIGINT, Σx/Σy BIGINT, Σx²/Σy²/Σxy DECIMAL(38,0),
    * then ONE fixed double expression — reproducible where native `corr`'s
    * float accumulation order is not. All moments combine map-side; the
    * shuffle carries 6 numbers per group.
    */
  def corrStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .selectExpr("l_returnflag AS rf",
        "CAST(round(l_quantity * 100) AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .groupBy("rf")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .selectExpr("rf", "n", "sx", "sy",
        "CAST(sxx AS DOUBLE) AS sxx", "CAST(syy AS DOUBLE) AS syy",
        "CAST(sxy AS DOUBLE) AS sxy",
        // nullif on the denominator: a constant-x or constant-y group has a
        // zero variance term; 0/0 is NaN in Spark but engine-configurable in
        // DuckDB, so emit NULL instead — native corr's zero-variance
        // behavior, and bit-identical across engines (ADVICE r5).
        """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          | / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0D)
          | AS corr_qty_price"""
          .stripMargin)
      .orderBy("rf")

  val corrStatsSql: String =
    """WITH q AS (SELECT l_returnflag AS rf,
      |                  CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |           FROM lineitem),
      |m AS (SELECT rf, count(*)::BIGINT AS n,
      |             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |             sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |             sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
      |             sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      |      FROM q GROUP BY rf)
      |SELECT rf, n, sx, sy,
      |       CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
      |       CAST(sxy AS DOUBLE) AS sxy,
      |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                 * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
      |                 0.0) AS corr_qty_price
      |FROM m ORDER BY rf""".stripMargin

  // ---------------------------------------------------------------- entry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_funnel" -> funnel,
    "x_cohort_retention" -> cohortRetention,
    "x_sessionize" -> sessionize,
    "x_scd2" -> scd2,
    "x_time_range_frame" -> timeRangeFrame,
    "x_corr_stats" -> corrStats,
    "x_gapfill_ffill" -> gapFill)

  val oracles: Map[String, String] = Map(
    "x_funnel" -> funnelSql,
    "x_cohort_retention" -> cohortRetentionSql,
    "x_sessionize" -> sessionizeSql,
    "x_scd2" -> scd2Sql,
    "x_time_range_frame" -> timeRangeFrameSql,
    "x_corr_stats" -> corrStatsSql,
    "x_gapfill_ffill" -> gapFillSql)
}
